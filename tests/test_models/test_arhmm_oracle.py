"""Independent f64 numpy oracle for the ARHMM EM step.

BASELINE.md's gate is "state sequences match reference ssm EM up to label
permutation"; ssm itself is not installed here, so this plain-numpy,
float64, loop-based EM (textbook formulas, written without reference to the
JAX implementation's vectorized forms) serves as the in-repo numerical
oracle: at identical starting parameters, one `ARHMM._em_step` must
reproduce the oracle's updated parameters and log-likelihood.

Model conventions shared with the engine (and ssm): the first ``lags``
frames of each trial are scored under a fixed N(0, I) initial condition for
every state, and the AR regression uses only rows with a full lag history.
"""

import numpy as np
from scipy.special import logsumexp

from behavenet_tpu.models.arhmm import ARHMM

LN2PI = np.log(2 * np.pi)


# ------------------------------------------------------------------ oracle
def _oracle_log_likes(params, x, lags):
    """(T, K) gaussian/AR observation log-likelihoods in f64."""
    T, D = x.shape
    K = params['bs'].shape[0]
    ll = np.zeros((T, K))
    for k in range(K):
        Sigma = params['Sigmas'][k]
        sign, logdet = np.linalg.slogdet(Sigma)
        Sinv = np.linalg.inv(Sigma)
        for t in range(T):
            if t < lags:
                ll[t, k] = -0.5 * (D * LN2PI + x[t] @ x[t])
                continue
            mu = params['bs'][k].copy()
            for l in range(1, lags + 1):
                mu = mu + params['As'][k][:, (l - 1) * D:l * D] @ x[t - l]
            d = x[t] - mu
            ll[t, k] = -0.5 * (D * LN2PI + logdet + d @ Sinv @ d)
    return ll


def _oracle_forward_backward(log_pi0, log_P, ll):
    """Standard log-space forward-backward. Returns (gamma, log_Z, xi_sum)."""
    T, K = ll.shape
    la = np.zeros((T, K))
    la[0] = log_pi0 + ll[0]
    for t in range(1, T):
        la[t] = logsumexp(la[t - 1][:, None] + log_P, axis=0) + ll[t]
    lb = np.zeros((T, K))
    for t in range(T - 2, -1, -1):
        lb[t] = logsumexp(log_P + (ll[t + 1] + lb[t + 1])[None, :], axis=1)
    log_Z = logsumexp(la[-1])
    lg = la + lb
    gamma = np.exp(lg - logsumexp(lg, axis=1, keepdims=True))
    xi_sum = np.zeros((K, K))
    for t in range(T - 1):
        lx = la[t][:, None] + log_P + (ll[t + 1] + lb[t + 1])[None, :]
        xi_sum += np.exp(lx - logsumexp(lx))
    return gamma, log_Z, xi_sum


def oracle_em_step(params, datas, lags, kappa=0.0, sticky=False):
    """One EM iteration in f64. Returns (new_params, total_ll)."""
    K = params['bs'].shape[0]
    D = datas[0].shape[1]
    log_P = params['log_Ps'] - logsumexp(params['log_Ps'], axis=1, keepdims=True)

    gammas, log_Zs, xi_total = [], [], np.zeros((K, K))
    for x in datas:
        ll = _oracle_log_likes(params, x, lags)
        gamma, log_Z, xi_sum = _oracle_forward_backward(params['log_pi0'], log_P, ll)
        gammas.append(gamma)
        log_Zs.append(log_Z)
        xi_total += xi_sum

    new = {}
    pi0 = np.mean([g[0] for g in gammas], axis=0) + 1e-8
    new['log_pi0'] = np.log(pi0 / pi0.sum())

    counts = xi_total + (kappa * np.eye(K) if sticky else 0.0) + 1e-8
    new['log_Ps'] = np.log(counts / counts.sum(axis=1, keepdims=True))

    # weighted least squares over rows with a full lag history
    rows_X, rows_Y, rows_W = [], [], []
    for x, gamma in zip(datas, gammas):
        T = x.shape[0]
        for t in range(lags, T):
            feat = [x[t - l] for l in range(1, lags + 1)]
            rows_X.append(np.concatenate(feat + [np.ones(1)]))
            rows_Y.append(x[t])
            rows_W.append(gamma[t])
    X = np.array(rows_X)          # (M, D*lags + 1)
    Y = np.array(rows_Y)          # (M, D)
    W = np.array(rows_W)          # (M, K)

    As = np.zeros((K, D, max(D * lags, 1)))
    bs = np.zeros((K, D))
    Sigmas = np.zeros((K, D, D))
    for k in range(K):
        Wk = W[:, k]
        A = (X * Wk[:, None]).T @ X
        B = (X * Wk[:, None]).T @ Y
        beta = np.linalg.solve(A + 1e-10 * np.eye(A.shape[0]), B)
        if lags > 0:
            As[k] = beta[:-1].T
        bs[k] = beta[-1]
        resid = Y - X @ beta
        Sigmas[k] = (resid * Wk[:, None]).T @ resid / max(Wk.sum(), 1e-8)
    new['As'] = As
    new['bs'] = bs
    new['Sigmas'] = Sigmas
    return new, float(np.sum(log_Zs))


# ------------------------------------------------------------------- tests
def _sticky_data(T, D, seed, n_states=3):
    rng = np.random.RandomState(seed)
    mus = rng.randn(n_states, D) * 3
    z = np.zeros(T, dtype=int)
    for t in range(1, T):
        z[t] = z[t - 1] if rng.rand() < 0.9 else rng.randint(n_states)
    return (mus[z] + 0.5 * rng.randn(T, D)).astype(np.float32)


def _params_f64(hmm):
    return {k: np.asarray(v, dtype=np.float64) for k, v in hmm.params.items()}


def _run_em_compare(hmm, datas, lags, n_iters=3, kappa=0.0, sticky=False):
    """Per iteration: run oracle and engine from the SAME params; compare;
    advance the engine. Isolates single-step accuracy from f32 drift."""
    for it in range(n_iters):
        p64 = _params_f64(hmm)
        new64, ll64 = oracle_em_step(p64, [np.asarray(d, np.float64) for d in datas],
                                     lags, kappa=kappa, sticky=sticky)
        lls = hmm.fit(list(datas), num_iters=1)
        assert np.allclose(lls[0], ll64, rtol=2e-5), \
            'iter %d ll: engine %.6f oracle %.6f' % (it, lls[0], ll64)
        for key in ('log_pi0', 'log_Ps', 'bs', 'Sigmas') + (('As',) if lags else ()):
            got = np.asarray(hmm.params[key], dtype=np.float64)
            want = new64[key]
            assert np.allclose(got, want, rtol=2e-3, atol=2e-4), \
                'iter %d %s:\n%s\nvs oracle\n%s' % (it, key, got, want)


class TestOracleEM:

    def test_gaussian_em_matches_oracle(self):
        datas = [_sticky_data(80, 2, seed=s) for s in range(2)]
        hmm = ARHMM(K=3, D=2, lags=0, observations='gaussian', rng_seed=0)
        hmm.initialize(datas)
        _run_em_compare(hmm, datas, lags=0)

    def test_ar1_em_matches_oracle(self):
        rng = np.random.RandomState(0)
        datas = []
        for s in range(2):
            x = np.zeros((90, 2))
            for t in range(1, 90):
                A = 0.9 * np.eye(2) if (t // 30) % 2 == 0 else \
                    np.array([[0.0, -0.8], [0.8, 0.0]])
                x[t] = A @ x[t - 1] + 0.2 * rng.randn(2)
            datas.append(x.astype(np.float32))
        hmm = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0)
        hmm.initialize(datas)
        _run_em_compare(hmm, datas, lags=1)

    def test_ar2_em_matches_oracle(self):
        rng = np.random.RandomState(1)
        x = np.zeros((100, 2))
        for t in range(2, 100):
            x[t] = 0.5 * x[t - 1] + 0.3 * x[t - 2] + 0.3 * rng.randn(2)
        hmm = ARHMM(K=2, D=2, lags=2, observations='ar', rng_seed=0)
        hmm.initialize([x.astype(np.float32)])
        _run_em_compare(hmm, [x.astype(np.float32)], lags=2)

    def test_sticky_em_matches_oracle(self):
        datas = [_sticky_data(80, 2, seed=7)]
        hmm = ARHMM(K=3, D=2, lags=0, observations='gaussian',
                    transitions='sticky', kappa=50.0, rng_seed=0)
        hmm.initialize(datas)
        _run_em_compare(hmm, datas, lags=0, kappa=50.0, sticky=True)


class TestFloat64EM:
    """ARHMM(dtype='float64'): CPU parity mode runs the whole EM in f64."""

    def test_f64_requires_x64_mode(self):
        import jax
        if jax.config.jax_enable_x64:
            import pytest
            pytest.skip('x64 already enabled in this process')
        import pytest
        with pytest.raises(RuntimeError, match='x64'):
            ARHMM(K=2, D=2, lags=0, observations='gaussian', dtype='float64')

    def test_f64_em_matches_oracle_tightly(self):
        """In a subprocess with JAX_ENABLE_X64, the f64 engine should track
        the f64 numpy oracle to near machine precision (vs the f32 engine's
        ~1e-3 tolerance above)."""
        import os
        import subprocess
        import sys
        code = r'''
import os
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax
jax.config.update('jax_enable_x64', True)
import numpy as np
import sys
sys.path.insert(0, %r)
sys.path.insert(0, %r)
from behavenet_tpu.models.arhmm import ARHMM
from test_models.test_arhmm_oracle import _sticky_data, oracle_em_step

datas = [_sticky_data(80, 2, seed=s) for s in range(2)]
hmm = ARHMM(K=3, D=2, lags=0, observations='gaussian', rng_seed=0,
            dtype='float64')
hmm.initialize(datas)
assert hmm.params['Sigmas'].dtype == np.float64
from behavenet_tpu.models.arhmm import _pad_datas
x, mask = _pad_datas(datas, np.float64)
assert x.dtype == np.float64
params64 = {k: np.asarray(v, dtype=np.float64) for k, v in hmm.params.items()}
for it in range(3):
    new64, ll64 = oracle_em_step(params64, [np.asarray(d, np.float64) for d in datas],
                                  lags=0)
    lls = hmm.fit(datas, num_iters=1, initialize=False)
    assert np.allclose(lls[0], ll64, rtol=1e-9), (lls[0], ll64)
    for key in ('log_pi0', 'log_Ps', 'bs', 'Sigmas'):
        got = np.asarray(hmm.params[key])
        assert got.dtype == np.float64
        assert np.allclose(got, new64[key], rtol=1e-4, atol=1e-7), (it, key)
    params64 = {k: np.asarray(v) for k, v in hmm.params.items()}
print('F64 OK')
'''
        import behavenet_tpu
        repo = os.path.dirname(os.path.dirname(os.path.abspath(behavenet_tpu.__file__)))
        code = code % (repo, os.path.join(repo, 'tests'))
        env = dict(os.environ, JAX_PLATFORMS='cpu', PALLAS_AXON_POOL_IPS='')
        out = subprocess.run([sys.executable, '-c', code], capture_output=True,
                             text=True, env=env, timeout=600)
        assert out.returncode == 0, out.stdout + out.stderr
        assert 'F64 OK' in out.stdout


    def test_f64_pickle_needs_x64_to_load(self):
        """An f64-fitted pickle must refuse to load silently downcast."""
        import io
        import pickle
        import jax
        if jax.config.jax_enable_x64:
            import pytest
            pytest.skip('x64 enabled; the guard cannot trip in this process')
        hmm = ARHMM(K=2, D=2, lags=0, observations='gaussian')
        blob = io.BytesIO()
        pickle.dump(hmm, blob)
        state_patch = pickle.loads(blob.getvalue())  # f32 round-trip fine
        assert state_patch.dtype == 'float32'
        # forge an f64-tagged pickle (as written by an x64 process)
        hmm.dtype = 'float64'
        blob = io.BytesIO()
        pickle.dump(hmm, blob)
        import pytest
        with pytest.raises(RuntimeError, match='x64'):
            pickle.loads(blob.getvalue())
