"""Literal ssm-EM parity gate (runs when the reference's `ssm` is installed).

BASELINE.md's ARHMM acceptance is "state sequences match reference ssm EM
up to label permutation"; the reference delegates its whole ARHMM engine to
``ssm.HMM`` (reference fitting/arhmm_grid_search.py:132-137). This script
runs the literal comparison whenever ``import ssm`` succeeds:

1. generate synthetic trials from a ground-truth ARHMM;
2. build the in-repo engine (``behavenet_tpu.models.ARHMM``) and an
   ``ssm.HMM`` from IDENTICAL initial parameters;
3. run N EM iterations on each and compare
   - per-iteration log-likelihoods (relative agreement), and
   - Viterbi state sequences after Hungarian label matching
     (fraction of matching frames).

When ssm is not importable (it is not installed in this image) the script
SKIPS LOUDLY with exit code 0 — the comparison logic itself
(:func:`match_states`, :func:`assert_parity`) is unit-tested against the
in-repo f64 numpy EM oracle in tests/test_models/test_ssm_parity.py, so
the gate is exercised even where ssm is absent.

Run (CPU):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/ssm_parity.py
Protocol doc: docs/user_guide.arhmms.md ("ssm parity protocol").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# thresholds for the gate: EM on identical inits/data should agree to f32
# rounding in the LL trace and near-perfectly on decoded states
LL_RTOL = 1e-3
MIN_STATE_MATCH = 0.98


# ---------------------------------------------------------------------------
# comparison logic (unit-tested; no ssm dependency)

def match_states(states_a, states_b, K):
    """Best label permutation mapping b's labels onto a's (Hungarian).

    Returns (perm, frac): ``perm[j]`` is the a-label assigned to b-label j,
    and ``frac`` the fraction of frames matching after relabeling.
    """
    from scipy.optimize import linear_sum_assignment
    a = np.concatenate([np.asarray(s).ravel() for s in states_a])
    b = np.concatenate([np.asarray(s).ravel() for s in states_b])
    if a.shape != b.shape:
        raise ValueError('state sequences differ in total length')
    conf = np.zeros((K, K))
    for j in range(K):
        sel = b == j
        if np.any(sel):
            conf[j] = np.bincount(a[sel], minlength=K)
    rows, cols = linear_sum_assignment(-conf)
    perm = np.empty(K, dtype=int)
    perm[rows] = cols
    frac = float(np.mean(perm[b] == a))
    return perm, frac


def assert_parity(lls_a, lls_b, states_a, states_b, K,
                  ll_rtol=LL_RTOL, min_match=MIN_STATE_MATCH):
    """The gate: per-iteration LL agreement + permutation-matched states.

    Returns a report dict; raises AssertionError on failure.
    """
    lls_a = np.asarray(lls_a, dtype=np.float64)
    lls_b = np.asarray(lls_b, dtype=np.float64)
    if lls_a.shape != lls_b.shape:
        raise AssertionError('LL traces differ in length: %d vs %d'
                             % (lls_a.size, lls_b.size))
    scale = np.maximum(np.abs(lls_a), np.abs(lls_b))
    rel = np.abs(lls_a - lls_b) / np.maximum(scale, 1.0)
    if not np.all(rel < ll_rtol):
        raise AssertionError(
            'per-iteration LL disagreement: max rel %.2e (tol %.0e) at iter %d'
            % (rel.max(), ll_rtol, int(rel.argmax())))
    perm, frac = match_states(states_a, states_b, K)
    if frac < min_match:
        raise AssertionError(
            'state sequences match only %.1f%% of frames after label '
            'permutation (need >= %.1f%%)' % (frac * 100, min_match * 100))
    return {'ll_max_rel': float(rel.max()), 'state_match_frac': frac,
            'perm': perm.tolist()}


# ---------------------------------------------------------------------------
# shared setup

def make_data(K=3, D=2, lags=1, n_trials=5, T=400, seed=0):
    """Trials sampled from a ground-truth ARHMM with well-separated states."""
    rs = np.random.RandomState(seed)
    # rotation-ish AR matrices per state + distinct biases
    As, bs = [], []
    for k in range(K):
        th = 0.3 * (k - 1)
        R = 0.95 * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        A = np.kron(np.ones((1, lags)) / lags, R)[:D, :D * lags] if D == 2 else \
            0.9 * np.tile(np.eye(D) / lags, (1, lags))
        As.append(A)
        bs.append(2.0 * rs.randn(D))
    P = 0.90 * np.eye(K) + 0.10 / (K - 1) * (1 - np.eye(K))
    datas, true_states = [], []
    for _ in range(n_trials):
        z = np.zeros(T, dtype=int)
        x = np.zeros((T, D))
        x[:lags] = rs.randn(lags, D)
        z[0] = rs.randint(K)
        for t in range(1, T):
            z[t] = rs.choice(K, p=P[z[t - 1]])
        for t in range(lags, T):
            mu = bs[z[t]].copy()
            for lag in range(1, lags + 1):
                mu += As[z[t]][:, (lag - 1) * D:lag * D] @ x[t - lag]
            x[t] = mu + 0.3 * rs.randn(D)
        datas.append(x.astype(np.float64))
        true_states.append(z)
    return datas, true_states


def common_init(K, D, lags, seed=0):
    """One initial parameter set both engines start EM from."""
    rs = np.random.RandomState(seed + 100)
    Ps = 0.95 * np.eye(K) + 0.05 * rs.rand(K, K)
    Ps /= Ps.sum(axis=1, keepdims=True)
    return {
        'log_pi0': np.log(np.ones(K) / K),
        'log_Ps': np.log(Ps),
        'As': 0.8 * np.tile(np.eye(D), (K, 1, lags)) + 0.01 * rs.randn(K, D, D * lags),
        'bs': 0.1 * rs.randn(K, D),
        'Sigmas': np.tile(np.eye(D), (K, 1, 1)),
    }


# ---------------------------------------------------------------------------
# the two engines

def run_inrepo(datas, init, K, D, lags, n_iters):
    """In-repo EM from the given init; returns (lls, viterbi paths)."""
    import jax.numpy as jnp
    from behavenet_tpu.models.arhmm import ARHMM
    model = ARHMM(K, D, lags=lags, observations='ar', transitions='stationary')
    model.params = dict(model.params)
    for key, val in init.items():
        model.params[key] = jnp.asarray(np.asarray(val), dtype=model.np_dtype)
    lls = model.fit(datas, num_iters=n_iters, initialize=False)
    states = [np.asarray(model.most_likely_states(x)) for x in datas]
    return np.asarray(lls, dtype=np.float64), states


def run_ssm(datas, init, K, D, lags, n_iters):
    """Reference ssm EM from the same init; returns (lls, viterbi paths)."""
    import ssm
    hmm = ssm.HMM(K, D, observations='ar',
                  observation_kwargs={'lags': lags}, transitions='stationary')
    # identical starting point (ssm stores log_pi0 on the init distn,
    # log_Ps on transitions, As/bs/Sigmas on observations)
    hmm.init_state_distn.log_pi0 = np.asarray(init['log_pi0'], dtype=float)
    hmm.transitions.log_Ps = np.asarray(init['log_Ps'], dtype=float)
    hmm.observations.As = np.asarray(init['As'], dtype=float)
    hmm.observations.bs = np.asarray(init['bs'], dtype=float)
    hmm.observations.Sigmas = np.asarray(init['Sigmas'], dtype=float)
    lls = hmm.fit(datas, method='em', num_iters=n_iters, initialize=False,
                  tolerance=0.0, verbose=0)
    lls = np.asarray(lls, dtype=np.float64)
    # ssm's fit may log an extra pre-update evaluation; align from the end
    states = [np.asarray(hmm.most_likely_states(x)) for x in datas]
    return lls, states


def main(n_iters=30, require_ssm=False):
    try:
        import ssm  # noqa: F401
    except ImportError:
        if require_ssm:
            # nightly-CI hard gate (VERDICT r4 item 3): the whole point of
            # the CI step is the literal comparison, so a missing ssm is a
            # failure there, not a skip
            print('FAIL: --require-ssm set but `ssm` is not importable')
            return 2
        print('=' * 66)
        print('SKIP: reference `ssm` package is not installed in this')
        print('environment, so the literal ssm-EM comparison cannot run.')
        print('The comparison/assertion logic (match_states, assert_parity)')
        print('is unit-tested against the in-repo f64 EM oracle in')
        print('tests/test_models/test_ssm_parity.py. To run the literal gate:')
        print('    pip install ssm   # Linderman lab, github.com/lindermanlab/ssm')
        print('    python tools/ssm_parity.py')
        print('=' * 66)
        return 0

    K, D, lags = 3, 2, 1
    datas, _ = make_data(K=K, D=D, lags=lags)
    init = common_init(K, D, lags)
    print('running in-repo EM (%d iters)...' % n_iters)
    lls_a, states_a = run_inrepo(datas, init, K, D, lags, n_iters)
    print('running ssm EM (%d iters)...' % n_iters)
    lls_b, states_b = run_ssm(datas, init, K, D, lags, n_iters)
    if lls_b.size > lls_a.size:   # ssm logs an extra initial evaluation
        lls_b = lls_b[-lls_a.size:]
    report = assert_parity(lls_a, lls_b, states_a, states_b, K)
    print('PASS: max per-iteration LL rel gap %.2e; state sequences match '
          '%.2f%% of frames under permutation %s'
          % (report['ll_max_rel'], report['state_match_frac'] * 100,
             report['perm']))
    return 0


if __name__ == '__main__':
    sys.exit(main(require_ssm='--require-ssm' in sys.argv))
