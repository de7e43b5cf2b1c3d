"""ARHMM engine: EM convergence, segmentation recovery, API parity surface."""

import numpy as np
import pytest

from behavenet_tpu.models.arhmm import ARHMM


def make_gaussian_hmm_data(T=400, seed=0):
    """Two well-separated gaussian states with sticky dynamics."""
    rng = np.random.RandomState(seed)
    mus = np.array([[-3.0, -3.0], [3.0, 3.0]])
    z = np.zeros(T, dtype=int)
    for t in range(1, T):
        z[t] = z[t - 1] if rng.rand() < 0.95 else 1 - z[t - 1]
    x = mus[z] + 0.5 * rng.randn(T, 2)
    return x.astype(np.float32), z


def make_ar_hmm_data(T=500, seed=0):
    """Two AR(1) states with distinct dynamics."""
    rng = np.random.RandomState(seed)
    As = [0.95 * np.eye(2), np.array([[0.0, -0.9], [0.9, 0.0]])]
    bs = [np.array([0.05, 0.0]), np.array([0.0, 0.0])]
    z = np.zeros(T, dtype=int)
    for t in range(1, T):
        z[t] = z[t - 1] if rng.rand() < 0.97 else 1 - z[t - 1]
    x = np.zeros((T, 2))
    for t in range(1, T):
        k = z[t]
        x[t] = As[k] @ x[t - 1] + bs[k] + 0.1 * rng.randn(2)
    return x.astype(np.float32), z


def perm_accuracy(z_true, z_pred, K=2):
    """Best accuracy over state relabelings."""
    from itertools import permutations
    best = 0.0
    for perm in permutations(range(K)):
        acc = np.mean(np.array([perm[z] for z in z_pred]) == z_true)
        best = max(best, acc)
    return best


class TestGaussianHMM:

    def test_em_increases_likelihood(self):
        x, _ = make_gaussian_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=0, observations='gaussian', rng_seed=0)
        hmm.initialize([x])
        lls = []
        for _ in range(10):
            lls += hmm.fit([x], method='em', num_iters=1, initialize=False)
        lls = np.array(lls)
        assert (np.diff(lls) > -1e-2).all(), 'EM log-likelihood decreased: %s' % lls

    def test_segmentation_recovery(self):
        x, z_true = make_gaussian_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=0, observations='gaussian', rng_seed=0)
        hmm.initialize([x])
        hmm.fit([x], num_iters=20)
        z_pred = hmm.most_likely_states(x)
        assert perm_accuracy(z_true, z_pred) > 0.95

    def test_multiple_variable_length_trials(self):
        x1, _ = make_gaussian_hmm_data(T=200, seed=0)
        x2, _ = make_gaussian_hmm_data(T=350, seed=1)
        hmm = ARHMM(K=2, D=2, lags=0, observations='gaussian', rng_seed=0)
        hmm.initialize([x1, x2])
        lls = hmm.fit([x1, x2], num_iters=5)
        assert np.isfinite(lls).all()
        # total ll additive over trials at fixed params
        ll_joint = hmm.log_likelihood([x1, x2])
        ll_sep = hmm.log_likelihood(x1) + hmm.log_likelihood(x2)
        assert np.allclose(ll_joint, ll_sep, rtol=1e-4)

    def test_diagonal_variant(self):
        x, z_true = make_gaussian_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=0, observations='diagonal_gaussian', rng_seed=0)
        hmm.initialize([x])
        hmm.fit([x], num_iters=15)
        assert perm_accuracy(z_true, hmm.most_likely_states(x)) > 0.95

    def test_studentst_variant(self):
        x, z_true = make_gaussian_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=0, observations='studentst', rng_seed=0)
        hmm.initialize([x])
        hmm.fit([x], num_iters=15)
        assert perm_accuracy(z_true, hmm.most_likely_states(x)) > 0.95


class TestARHMM:

    def test_ar_segmentation_recovery(self):
        x, z_true = make_ar_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0)
        hmm.initialize([x], localize=True)
        hmm.fit([x], num_iters=25)
        z_pred = hmm.most_likely_states(x)
        assert perm_accuracy(z_true, z_pred) > 0.90

    def test_ar_em_monotone(self):
        x, _ = make_ar_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0)
        hmm.initialize([x])
        lls = np.array(hmm.fit([x], num_iters=10))
        assert (np.diff(lls) > -1e-1).all(), lls

    def test_ar2_lags(self):
        x, _ = make_ar_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=2, observations='ar', rng_seed=0)
        hmm.initialize([x])
        lls = hmm.fit([x], num_iters=3)
        assert np.isfinite(lls).all()

    def test_sticky_transitions_reduce_switches(self):
        x, _ = make_ar_hmm_data(seed=3)
        z_by_kappa = {}
        for kappa in (0.0, 1e5):
            hmm = ARHMM(K=2, D=2, lags=1, observations='ar',
                        transitions='sticky' if kappa > 0 else 'stationary',
                        kappa=kappa, rng_seed=0)
            hmm.initialize([x])
            hmm.fit([x], num_iters=10)
            z = hmm.most_likely_states(x)
            z_by_kappa[kappa] = int(np.sum(np.diff(z) != 0))
        assert z_by_kappa[1e5] <= z_by_kappa[0.0]

    def test_recurrent_transitions_fit(self):
        x, _ = make_ar_hmm_data()
        for trans in ('recurrent', 'recurrent_only'):
            hmm = ARHMM(K=2, D=2, lags=1, observations='ar', transitions=trans, rng_seed=0)
            hmm.initialize([x])
            lls = hmm.fit([x], num_iters=3)
            assert np.isfinite(lls).all()
            z = hmm.most_likely_states(x)
            assert z.shape == (len(x),)

    def test_permute(self):
        x, _ = make_ar_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0)
        hmm.initialize([x])
        hmm.fit([x], num_iters=5)
        ll_before = hmm.log_likelihood(x)
        z_before = hmm.most_likely_states(x)
        hmm.permute([1, 0])
        ll_after = hmm.log_likelihood(x)
        z_after = hmm.most_likely_states(x)
        assert np.allclose(ll_before, ll_after, rtol=1e-4)
        assert (np.asarray(z_after) == 1 - np.asarray(z_before)).all()

    def test_pickle_roundtrip(self, tmpdir):
        import pickle
        x, _ = make_ar_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0)
        hmm.initialize([x])
        hmm.fit([x], num_iters=2)
        path = str(tmpdir.join('best_val_model.pt'))
        with open(path, 'wb') as f:
            pickle.dump(hmm, f)
        with open(path, 'rb') as f:
            hmm2 = pickle.load(f)
        assert np.allclose(hmm.log_likelihood(x), hmm2.log_likelihood(x), rtol=1e-5)
        assert (hmm.most_likely_states(x) == hmm2.most_likely_states(x)).all()

    def test_sample_roundtrip(self):
        x, _ = make_ar_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0)
        hmm.initialize([x])
        hmm.fit([x], num_iters=10)
        zs, xs = hmm.sample(100)
        assert zs.shape == (100,)
        assert xs.shape == (100, 2)
        assert np.isfinite(xs).all()
        # conditioned sampling
        xs2 = hmm.sample_x(zs)
        assert xs2.shape == (100, 2)

    def test_invalid_args(self):
        with pytest.raises(ValueError):
            ARHMM(K=2, D=2, observations='bogus')
        with pytest.raises(ValueError):
            ARHMM(K=2, D=2, transitions='bogus')

    def test_fit_tolerance_stops_early(self):
        """fit(tolerance=) must trigger a relative-LL convergence stop."""
        x, _ = make_gaussian_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=0, observations='gaussian', rng_seed=0)
        hmm.initialize([x])
        lls = hmm.fit([x], num_iters=50, tolerance=1e-4)
        assert len(lls) < 50, 'tolerance-based stop never fired'
        assert abs((lls[-1] - lls[-2]) / lls[-1]) < 1e-4
        # tolerance=0 (default) runs all requested iterations
        hmm2 = ARHMM(K=2, D=2, lags=0, observations='gaussian', rng_seed=0)
        hmm2.initialize([x])
        assert len(hmm2.fit([x], num_iters=5)) == 5

    def test_recurrent_sample_follows_drive(self):
        """sample() must use the input-driven transitions, not the base matrix."""
        import jax
        hmm = ARHMM(K=2, D=1, lags=0, observations='gaussian',
                    transitions='recurrent_only', rng_seed=0)
        # state 0 emits +1, state 1 emits -1 (tiny noise); the drive maps
        # x>0 -> state 1 and x<0 -> state 0, forcing strict alternation
        hmm.params = dict(
            hmm.params,
            bs=np.array([[1.0], [-1.0]], dtype=np.float32),
            Sigmas=np.full((2, 1, 1), 1e-6, dtype=np.float32),
            Rs=np.array([[-50.0], [50.0]], dtype=np.float32),
            r=np.zeros(2, dtype=np.float32))
        zs, xs = hmm.sample(60, key=jax.random.PRNGKey(0))
        flips = np.mean(np.diff(zs) != 0)
        assert flips > 0.95, 'recurrent drive ignored in sampling (flip rate %.2f)' % flips
        # emitted observations track the sampled states
        assert np.all(np.sign(xs[:, 0]) == np.where(zs == 0, 1, -1))


class TestMeshEM:
    """Data-parallel EM over a device mesh matches single-device EM exactly."""

    def _fit(self, datas, mesh=None, transitions='stationary'):
        hmm = ARHMM(K=2, D=2, lags=1, observations='ar',
                    transitions=transitions, rng_seed=0)
        hmm.initialize(datas)
        lls = hmm.fit(datas, num_iters=5, mesh=mesh)
        return hmm, lls

    def test_sharded_em_matches_single_device(self):
        import jax
        from jax.sharding import Mesh
        # 5 trials over 8 devices: exercises inert-trial padding too
        datas = [make_ar_hmm_data(T=120 + 10 * i, seed=i)[0] for i in range(5)]
        mesh = Mesh(np.array(jax.devices()), ('dp',))
        hmm_s, lls_s = self._fit(datas)
        hmm_m, lls_m = self._fit(datas, mesh=mesh)
        assert np.allclose(lls_s, lls_m, rtol=1e-4), (lls_s, lls_m)
        for k in ('log_pi0', 'log_Ps', 'As', 'bs', 'Sigmas'):
            assert np.allclose(np.asarray(hmm_s.params[k]),
                               np.asarray(hmm_m.params[k]),
                               rtol=1e-4, atol=1e-5), k

    def test_sharded_recurrent_transitions(self):
        import jax
        from jax.sharding import Mesh
        datas = [make_ar_hmm_data(T=100, seed=i)[0] for i in range(3)]
        mesh = Mesh(np.array(jax.devices()), ('dp',))
        hmm_s, lls_s = self._fit(datas, transitions='recurrent')
        hmm_m, lls_m = self._fit(datas, mesh=mesh, transitions='recurrent')
        assert np.allclose(lls_s, lls_m, rtol=1e-4), (lls_s, lls_m)

    def test_states_after_sharded_fit(self):
        import jax
        from jax.sharding import Mesh
        x, z_true = make_ar_hmm_data()
        mesh = Mesh(np.array(jax.devices()), ('dp',))
        hmm = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0)
        hmm.initialize([x], localize=True)
        hmm.fit([x], num_iters=25, mesh=mesh)
        assert perm_accuracy(z_true, hmm.most_likely_states(x)) > 0.90


class TestStudentstNu:

    def test_nu_adapts_to_heavy_tails(self):
        """Heavy-tailed data should drive nu down; clean data keeps nu high."""
        rng = np.random.RandomState(0)
        mus = np.array([[-3.0, -3.0], [3.0, 3.0]])
        z = np.zeros(600, dtype=int)
        for t in range(1, 600):
            z[t] = z[t - 1] if rng.rand() < 0.95 else 1 - z[t - 1]
        # t-distributed noise with 3 dof (heavy tails)
        x_heavy = (mus[z] + 0.5 * rng.standard_t(3, size=(600, 2))).astype(np.float32)
        x_clean = (mus[z] + 0.5 * rng.randn(600, 2)).astype(np.float32)

        nus = {}
        for name, x in (('heavy', x_heavy), ('clean', x_clean)):
            hmm = ARHMM(K=2, D=2, lags=0, observations='studentst', nu=20.0, rng_seed=0)
            hmm.initialize([x])
            hmm.fit([x], num_iters=15)
            nus[name] = float(np.mean(np.asarray(hmm.params['nus'])))
        assert nus['heavy'] < nus['clean'], nus
        assert nus['heavy'] < 15.0, nus

    def test_nu_update_keeps_ll_improving(self):
        x, z_true = make_gaussian_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=0, observations='studentst', rng_seed=0)
        hmm.initialize([x])
        lls = []
        for _ in range(10):
            lls += hmm.fit([x], num_iters=1)
        lls = np.array(lls)
        assert np.isfinite(lls).all()
        assert lls[-1] > lls[0]


class TestItersPerDispatch:
    """fit(iters_per_dispatch=k) scans k EM iterations in one device program."""

    def _fit_pair(self, k, num_iters):
        x, _ = make_ar_hmm_data()
        ref = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0)
        ref.initialize([x])
        lls_ref = ref.fit([x], num_iters=num_iters)
        fused = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0)
        fused.initialize([x])
        lls_fused = fused.fit([x], num_iters=num_iters, iters_per_dispatch=k)
        return ref, lls_ref, fused, lls_fused

    def test_matches_sequential(self):
        ref, lls_ref, fused, lls_fused = self._fit_pair(k=3, num_iters=6)
        assert len(lls_fused) == len(lls_ref) == 6
        np.testing.assert_allclose(lls_fused, lls_ref, rtol=1e-5)
        for key in ref.params:
            np.testing.assert_allclose(
                np.asarray(fused.params[key]), np.asarray(ref.params[key]),
                rtol=1e-4, atol=1e-5, err_msg=key)

    def test_remainder_runs_single_step(self):
        # 7 = 4 + 3 leftover: the tail falls back to the per-iteration step
        ref, lls_ref, fused, lls_fused = self._fit_pair(k=4, num_iters=7)
        assert len(lls_fused) == 7
        np.testing.assert_allclose(lls_fused, lls_ref, rtol=1e-5)

    def test_tolerance_chunk_granularity(self):
        x, _ = make_ar_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0)
        hmm.initialize([x])
        tol = 1e-3
        lls = hmm.fit([x], num_iters=40, tolerance=tol, iters_per_dispatch=4)
        assert len(lls) <= 40
        if len(lls) < 40:  # stopped: the rule must actually have fired
            assert abs((lls[-1] - lls[-2]) / lls[-1]) < tol

    def test_pickle_after_fused_fit(self):
        import pickle
        x, _ = make_ar_hmm_data()
        hmm = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0)
        hmm.initialize([x])
        hmm.fit([x], num_iters=4, iters_per_dispatch=2)
        clone = pickle.loads(pickle.dumps(hmm))
        assert clone._fit_scan is None
        np.testing.assert_allclose(
            np.asarray(clone.params['As']), np.asarray(hmm.params['As']))
