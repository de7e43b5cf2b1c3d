"""The ssm-parity gate's comparison logic, exercised against the f64 oracle.

`tools/ssm_parity.py` runs the literal in-repo-EM vs reference-ssm-EM
comparison whenever `import ssm` succeeds (it is not installed in this
image). These tests pin the gate's own machinery without ssm:

- the f64 numpy EM oracle (tests/test_models/test_arhmm_oracle.py) stands
  in for the second engine, started from a LABEL-PERMUTED copy of the
  shared init — EM is exactly equivariant under state relabeling, so the
  LL traces must agree and the decoded states must match only after the
  Hungarian label matching that the gate performs;
- failure modes (shuffled states, perturbed LLs) must raise;
- the CLI must skip loudly (exit 0) when ssm is absent.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.special import logsumexp

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..', 'tools'))

import ssm_parity

from .test_arhmm_oracle import _oracle_log_likes, oracle_em_step

K, D, LAGS = 3, 2, 1


def _oracle_viterbi(params, x, lags):
    """Plain numpy Viterbi under the oracle's model conventions."""
    ll = _oracle_log_likes(params, x, lags)
    log_P = params['log_Ps'] - logsumexp(params['log_Ps'], axis=1, keepdims=True)
    T = ll.shape[0]
    delta = params['log_pi0'] + ll[0]
    psi = np.zeros((T, K), dtype=int)
    for t in range(1, T):
        scores = delta[:, None] + log_P
        psi[t] = np.argmax(scores, axis=0)
        delta = scores[psi[t], np.arange(K)] + ll[t]
    z = np.zeros(T, dtype=int)
    z[-1] = int(np.argmax(delta))
    for t in range(T - 2, -1, -1):
        z[t] = psi[t + 1][z[t + 1]]
    return z


def _permute_init(init, perm):
    """Relabel states: state k of the output is state perm[k] of the input."""
    return {
        'log_pi0': init['log_pi0'][perm],
        'log_Ps': init['log_Ps'][np.ix_(perm, perm)],
        'As': init['As'][perm],
        'bs': init['bs'][perm],
        'Sigmas': init['Sigmas'][perm],
    }


def _run_oracle(datas, init, n_iters):
    params = {k: np.asarray(v, dtype=np.float64) for k, v in init.items()}
    lls = []
    for _ in range(n_iters):
        params, ll = oracle_em_step(params, datas, LAGS)
        lls.append(ll)
    states = [_oracle_viterbi(params, x, LAGS) for x in datas]
    return np.asarray(lls), states


@pytest.fixture(scope='module')
def runs():
    datas, _ = ssm_parity.make_data(K=K, D=D, lags=LAGS, n_trials=2, T=150)
    init = ssm_parity.common_init(K, D, LAGS)
    lls_a, states_a = ssm_parity.run_inrepo(datas, init, K, D, LAGS, n_iters=5)
    perm_true = np.array([2, 0, 1])
    lls_b, states_b = _run_oracle(datas, _permute_init(init, perm_true), 5)
    return lls_a, states_a, lls_b, states_b, perm_true


class TestSsmParityProtocol:

    def test_gate_passes_engine_vs_permuted_oracle(self, runs):
        lls_a, states_a, lls_b, states_b, perm_true = runs
        report = ssm_parity.assert_parity(lls_a, lls_b, states_a, states_b, K)
        assert report['state_match_frac'] >= 0.98
        assert report['ll_max_rel'] < ssm_parity.LL_RTOL
        # the recovered permutation must invert the one applied to the init
        np.testing.assert_array_equal(np.asarray(report['perm']), perm_true)

    def test_gate_rejects_shuffled_states(self, runs):
        lls_a, states_a, lls_b, states_b, _ = runs
        rs = np.random.RandomState(0)
        bad = [rs.randint(0, K, size=len(s)) for s in states_b]
        with pytest.raises(AssertionError, match='state sequences match only'):
            ssm_parity.assert_parity(lls_a, lls_b, states_a, bad, K)

    def test_gate_rejects_ll_divergence(self, runs):
        lls_a, states_a, lls_b, states_b, _ = runs
        bad = np.asarray(lls_b) * 1.01
        with pytest.raises(AssertionError, match='LL disagreement'):
            ssm_parity.assert_parity(lls_a, bad, states_a, states_b, K)

    def test_match_states_identity(self):
        s = [np.array([0, 1, 2, 2, 1])]
        perm, frac = ssm_parity.match_states(s, s, K)
        assert frac == 1.0
        np.testing.assert_array_equal(perm, np.arange(K))

    def test_cli_skips_loudly_without_ssm(self):
        env = dict(os.environ, JAX_PLATFORMS='cpu', PALLAS_AXON_POOL_IPS='')
        repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')
        out = subprocess.run(
            [sys.executable, os.path.join(repo, 'tools', 'ssm_parity.py')],
            env=env, capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-2000:]
        assert 'SKIP' in out.stdout
