"""Bayesian decoder: fusion of ARHMM dynamics with noisy neural predictions."""

import numpy as np

from behavenet_tpu.models.arhmm import ARHMM
from behavenet_tpu.models.bayesian import BayesianDecoder


def make_slds_data(T=400, seed=0):
    """Ground-truth ARHMM trajectories + noisy 'neural' predictions of them."""
    rng = np.random.RandomState(seed)
    As = [0.97 * np.eye(2), np.array([[0.0, -0.95], [0.95, 0.0]])]
    bs = [np.array([0.05, 0.0]), np.zeros(2)]
    z = np.zeros(T, dtype=int)
    for t in range(1, T):
        z[t] = z[t - 1] if rng.rand() < 0.97 else 1 - z[t - 1]
    x = np.zeros((T, 2))
    for t in range(1, T):
        k = z[t]
        x[t] = As[k] @ x[t - 1] + bs[k] + 0.05 * rng.randn(2)
    # noisy neural readout of the latents
    y = x + 0.5 * rng.randn(T, 2)
    # noisy neural state predictions
    q = np.full((T, 2), 0.2)
    q[np.arange(T), z] = 0.8
    return x.astype(np.float32), y.astype(np.float32), z, q.astype(np.float32)


def _fit_arhmm(x, z_true=None):
    hmm = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0)
    hmm.initialize([x])
    hmm.fit([x], num_iters=20)
    if z_true is not None:
        # align hmm labels with the generative labels (in practice the
        # neural->state decoder is trained on the hmm's own states, so the
        # labelings agree by construction)
        z_hat = hmm.most_likely_states(x)
        if np.mean(z_hat == z_true) < 0.5:
            hmm.permute([1, 0])
    return hmm


class TestBayesianDecoder:

    def test_decoding_beats_raw_predictions(self):
        """Fusing the ARHMM prior must reduce latent MSE vs raw neural preds."""
        x, y, z, q = make_slds_data()
        hmm = _fit_arhmm(x, z)
        dec = BayesianDecoder(hmm)
        dec.estimate_obs_noise([x], [y])
        out = dec.decode(y, arhmm_predictions=q)
        mse_raw = float(np.mean((y - x) ** 2))
        mse_dec = float(np.mean((out['latents'] - x) ** 2))
        assert mse_dec < mse_raw, 'decoded %f vs raw %f' % (mse_dec, mse_raw)
        # substantial improvement expected with strong dynamics
        assert mse_dec < 0.6 * mse_raw

    def test_state_posterior_uses_evidence(self):
        x, y, z, q = make_slds_data()
        hmm = _fit_arhmm(x, z)
        dec = BayesianDecoder(hmm)
        dec.estimate_obs_noise([x], [y])
        out = dec.decode(y, arhmm_predictions=q)
        gamma = out['states_posterior']
        assert gamma.shape == (len(x), 2)
        assert np.allclose(gamma.sum(axis=1), 1, atol=1e-2)
        # decoded states should track truth up to permutation
        from itertools import permutations
        acc = max(np.mean(np.array([p[s] for s in out['states']]) == z)
                  for p in permutations(range(2)))
        assert acc > 0.7

    def test_nan_border_rows_handled(self):
        """Prediction exports have NaN lag borders; decoding must fill them."""
        x, y, z, q = make_slds_data(T=200)
        y[:4] = np.nan
        y[-4:] = np.nan
        hmm = _fit_arhmm(x, z)
        dec = BayesianDecoder(hmm)
        dec.estimate_obs_noise([x[4:-4]], [y[4:-4]])
        out = dec.decode(y, arhmm_predictions=q)
        assert np.isfinite(out['latents']).all()

    def test_smoother_at_least_as_good_as_filter(self):
        x, y, z, q = make_slds_data(seed=1)
        hmm = _fit_arhmm(x, z)
        dec = BayesianDecoder(hmm)
        dec.estimate_obs_noise([x], [y])
        out_f = dec.decode(y, arhmm_predictions=q, smooth=False)
        out_s = dec.decode(y, arhmm_predictions=q, smooth=True)
        mse_f = np.mean((out_f['latents'] - x) ** 2)
        mse_s = np.mean((out_s['latents'] - x) ** 2)
        assert mse_s <= mse_f * 1.05

    def test_state_evidence_only(self):
        x, y, z, q = make_slds_data()
        hmm = _fit_arhmm(x, z)
        dec = BayesianDecoder(hmm)
        gamma = dec.states_posterior(arhmm_predictions=q)
        assert gamma.shape == (len(x), 2)

    def test_lags2_decoding(self):
        """AR(2) dynamics decode via companion-form state augmentation."""
        rng = np.random.RandomState(0)
        T = 300
        x = np.zeros((T, 2))
        for t in range(2, T):
            x[t] = 0.6 * x[t - 1] + 0.3 * x[t - 2] + 0.1 * rng.randn(2)
        x = x.astype(np.float32)
        y = (x + 0.5 * rng.randn(T, 2)).astype(np.float32)
        hmm = ARHMM(K=2, D=2, lags=2, observations='ar', rng_seed=0)
        hmm.initialize([x])
        hmm.fit([x], num_iters=10)
        dec = BayesianDecoder(hmm)
        assert dec.n == 4  # augmented state dim D * lags
        dec.estimate_obs_noise([x], [y])
        out = dec.decode(y)
        assert out['latents'].shape == (T, 2)
        assert out['latents_cov'].shape == (T, 2, 2)
        mse_raw = float(np.mean((y - x) ** 2))
        mse_dec = float(np.mean((out['latents'] - x) ** 2))
        assert mse_dec < mse_raw, 'decoded %f vs raw %f' % (mse_dec, mse_raw)

    def test_parallel_decode_matches_imm(self):
        """Associative-Kalman soft path tracks the sequential IMM decode."""
        x, y, z, q = make_slds_data(seed=2)
        hmm = _fit_arhmm(x, z)
        dec = BayesianDecoder(hmm)
        dec.estimate_obs_noise([x], [y])
        out_imm = dec.decode(y, arhmm_predictions=q)
        out_par = dec.decode(y, arhmm_predictions=q, parallel=True)
        # same discrete pass up to parallel-prefix f32 roundoff
        assert np.allclose(out_imm['states_posterior'], out_par['states_posterior'],
                           atol=1e-3)
        # continuous pass differs only by the IMM mixture-spread term
        mse_raw = float(np.mean((y - x) ** 2))
        mse_imm = float(np.mean((out_imm['latents'] - x) ** 2))
        mse_par = float(np.mean((out_par['latents'] - x) ** 2))
        # both are far below raw (~15x); the soft path gives up a modest
        # fraction of the IMM's accuracy at state switches (spread term)
        assert mse_par < 0.2 * mse_raw, (mse_par, mse_raw)
        assert mse_par < 1.5 * mse_imm, (mse_imm, mse_par)
        # and the trajectories agree closely where the posterior is concentrated
        conc = out_imm['states_posterior'].max(axis=1) > 0.99
        diff = np.abs(out_imm['latents'] - out_par['latents'])[conc]
        assert np.median(diff) < 0.05, float(np.median(diff))

    def test_nan_tail_padding_is_exact_for_valid_prefix(self):
        """Bucket-padding trials with NaN rows must not perturb the valid
        prefix: a no-evidence future contributes nothing to the smoothed
        past (the CLI relies on this for length bucketing)."""
        x, y, z, q = make_slds_data(T=150, seed=4)
        hmm = _fit_arhmm(x, z)
        dec = BayesianDecoder(hmm)
        dec.estimate_obs_noise([x], [y])
        out = dec.decode(y, arhmm_predictions=q)
        y_pad = np.concatenate([y, np.full((42, 2), np.nan, dtype=y.dtype)])
        q_pad = np.concatenate([q, np.full((42, 2), np.nan, dtype=q.dtype)])
        out_pad = dec.decode(y_pad, arhmm_predictions=q_pad)
        assert np.allclose(out['latents'], out_pad['latents'][:150], atol=1e-3)
        assert np.allclose(out['states_posterior'],
                           out_pad['states_posterior'][:150], atol=1e-3)
        assert np.isfinite(out_pad['latents']).all()

    def test_parallel_decode_nan_borders(self):
        x, y, z, q = make_slds_data(T=200, seed=3)
        y[:4] = np.nan
        y[-4:] = np.nan
        hmm = _fit_arhmm(x, z)
        dec = BayesianDecoder(hmm)
        dec.estimate_obs_noise([x[4:-4]], [y[4:-4]])
        out = dec.decode(y, arhmm_predictions=q, parallel=True)
        assert np.isfinite(out['latents']).all()
