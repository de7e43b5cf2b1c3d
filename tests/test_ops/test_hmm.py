"""HMM message passing verified against brute-force enumeration."""

import itertools

import numpy as np

import jax.numpy as jnp

from behavenet_tpu.ops import hmm as hmm_ops


def _brute_force(log_pi0, log_P, log_lik):
    """Enumerate all state paths: returns (log_Z, gamma, best_path)."""
    T, K = log_lik.shape
    paths = list(itertools.product(range(K), repeat=T))
    log_joints = []
    for path in paths:
        lj = log_pi0[path[0]] + log_lik[0, path[0]]
        for t in range(1, T):
            lj += log_P[path[t - 1], path[t]] + log_lik[t, path[t]]
        log_joints.append(lj)
    log_joints = np.array(log_joints)
    log_Z = np.logaddexp.reduce(log_joints)
    post = np.exp(log_joints - log_Z)
    gamma = np.zeros((T, K))
    for p, w in zip(paths, post):
        for t, k in enumerate(p):
            gamma[t, k] += w
    best = np.array(paths[np.argmax(log_joints)])
    return log_Z, gamma, best


def _random_problem(T=6, K=3, seed=0):
    rng = np.random.RandomState(seed)
    log_pi0 = np.log(rng.dirichlet(np.ones(K)))
    P = rng.dirichlet(np.ones(K), size=K)
    log_lik = rng.randn(T, K).astype(np.float64)
    return log_pi0.astype(np.float32), np.log(P).astype(np.float32), \
        log_lik.astype(np.float32)


class TestForwardBackward:

    def test_log_normalizer_vs_brute_force(self):
        for seed in range(3):
            log_pi0, log_P, log_lik = _random_problem(seed=seed)
            _, log_Z = hmm_ops.forward(
                jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik))
            ref_Z, _, _ = _brute_force(log_pi0, log_P, log_lik)
            assert np.allclose(float(log_Z), ref_Z, atol=1e-4)

    def test_gamma_vs_brute_force(self):
        log_pi0, log_P, log_lik = _random_problem(seed=1)
        gamma, log_Z, xi_sum = hmm_ops.forward_backward(
            jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik))
        ref_Z, ref_gamma, _ = _brute_force(log_pi0, log_P, log_lik)
        assert np.allclose(np.asarray(gamma), ref_gamma, atol=1e-4)
        # gamma rows sum to 1
        assert np.allclose(np.asarray(gamma).sum(axis=1), 1.0, atol=1e-4)
        # xi_sum totals T-1 transitions
        assert np.allclose(float(np.asarray(xi_sum).sum()), log_lik.shape[0] - 1, atol=1e-3)

    def test_viterbi_vs_brute_force(self):
        for seed in range(3):
            log_pi0, log_P, log_lik = _random_problem(T=5, seed=seed)
            path = hmm_ops.viterbi(
                jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik))
            _, _, ref_path = _brute_force(log_pi0, log_P, log_lik)
            assert (np.asarray(path) == ref_path).all()

    def test_masking_equals_truncation(self):
        """Padded+masked trial must give identical results to the short trial."""
        log_pi0, log_P, log_lik = _random_problem(T=8, seed=2)
        T_true = 5
        mask = np.zeros(8, dtype=np.float32)
        mask[:T_true] = 1
        _, log_Z_pad = hmm_ops.forward(
            jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik), jnp.array(mask))
        _, log_Z_short = hmm_ops.forward(
            jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik[:T_true]))
        assert np.allclose(float(log_Z_pad), float(log_Z_short), atol=1e-4)

        gamma_pad, _, xi_pad = hmm_ops.forward_backward(
            jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik), jnp.array(mask))
        gamma_short, _, xi_short = hmm_ops.forward_backward(
            jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik[:T_true]))
        assert np.allclose(np.asarray(gamma_pad)[:T_true], np.asarray(gamma_short), atol=1e-4)
        assert np.allclose(np.asarray(gamma_pad)[T_true:], 0.0)
        assert np.allclose(np.asarray(xi_pad), np.asarray(xi_short), atol=1e-4)

    def test_time_varying_transitions(self):
        T, K = 5, 2
        rng = np.random.RandomState(3)
        log_pi0 = np.log(rng.dirichlet(np.ones(K))).astype(np.float32)
        Ps = rng.dirichlet(np.ones(K), size=(T - 1, K)).astype(np.float32)
        log_P = np.log(Ps)
        log_lik = rng.randn(T, K).astype(np.float32)
        # brute force with time-varying transitions
        paths = list(itertools.product(range(K), repeat=T))
        ljs = []
        for path in paths:
            lj = log_pi0[path[0]] + log_lik[0, path[0]]
            for t in range(1, T):
                lj += log_P[t - 1, path[t - 1], path[t]] + log_lik[t, path[t]]
            ljs.append(lj)
        ref_Z = np.logaddexp.reduce(np.array(ljs))
        _, log_Z = hmm_ops.forward(jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik))
        assert np.allclose(float(log_Z), ref_Z, atol=1e-4)


class TestSampling:

    def test_sample_states_distribution(self):
        import jax
        K = 2
        log_pi0 = jnp.log(jnp.array([0.9, 0.1]))
        log_P = jnp.log(jnp.array([[0.95, 0.05], [0.05, 0.95]]))
        zs = hmm_ops.sample_states(jax.random.PRNGKey(0), log_pi0, log_P, 2000)
        zs = np.asarray(zs)
        # sticky chain: few transitions
        n_switches = int(np.sum(np.diff(zs) != 0))
        assert n_switches < 300
        assert set(np.unique(zs)) <= {0, 1}


class TestSamplePosterior:

    def test_marginals_match_smoothed_posteriors(self):
        """Empirical state frequencies over many FFBS draws ≈ gamma."""
        import jax
        log_pi0, log_P, log_lik = map(
            jnp.array, _random_problem(T=6, K=3, seed=3))
        gamma, _, _ = hmm_ops.forward_backward(log_pi0, log_P, log_lik)
        n = 4000
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        draw = jax.jit(jax.vmap(
            lambda k: hmm_ops.sample_posterior(k, log_pi0, log_P, log_lik)))
        zs = np.asarray(draw(keys))  # (n, T)
        freq = np.stack([(zs == k).mean(axis=0) for k in range(3)], axis=1)
        np.testing.assert_allclose(freq, np.asarray(gamma), atol=0.04)

    def test_pairwise_match_smoothed_transitions(self):
        """Joint (z_t, z_{t+1}) frequencies ≈ the smoothed xi posteriors —
        the map-composition draw gets the couplings right, not just the
        marginals."""
        import jax
        log_pi0, log_P, log_lik = _random_problem(T=4, K=2, seed=5)
        # exact pairwise posterior by brute force over all K^T paths
        T, K = log_lik.shape
        from itertools import product
        joint = np.zeros((T - 1, K, K))
        tot = 0.0
        for path in product(range(K), repeat=T):
            lp = log_pi0[path[0]] + log_lik[0, path[0]]
            for t in range(1, T):
                lp += log_P[path[t - 1], path[t]] + log_lik[t, path[t]]
            w = np.exp(lp)
            tot += w
            for t in range(T - 1):
                joint[t, path[t], path[t + 1]] += w
        joint /= tot
        n = 6000
        keys = jax.random.split(jax.random.PRNGKey(1), n)
        zs = np.asarray(jax.jit(jax.vmap(
            lambda k: hmm_ops.sample_posterior(
                k, log_pi0, log_P, log_lik)))(keys))
        emp = np.zeros_like(joint)
        for t in range(T - 1):
            for i in range(K):
                for j in range(K):
                    emp[t, i, j] = np.mean((zs[:, t] == i) & (zs[:, t + 1] == j))
        np.testing.assert_allclose(emp, joint, atol=0.04)

    def test_parallel_identical_draws(self):
        """Pointer-doubling composition realizes the same paths as the
        sequential backtrace (same presampled maps, same key). The two
        forward passes differ by float reassociation, so a Gumbel draw
        landing within roundoff of a decision boundary can legitimately
        flip a map entry — require (near-)universal exact path equality
        over many keys instead of equality for every key."""
        import jax
        log_pi0, log_P, log_lik = _random_problem(T=57, K=3, seed=4)
        draw_seq = jax.jit(lambda k: hmm_ops.sample_posterior(
            k, log_pi0, log_P, log_lik))
        draw_par = jax.jit(lambda k: hmm_ops.sample_posterior(
            k, log_pi0, log_P, log_lik, parallel=True))
        n_equal = sum(
            int(np.array_equal(np.asarray(draw_seq(jax.random.PRNGKey(i))),
                               np.asarray(draw_par(jax.random.PRNGKey(i)))))
            for i in range(20))
        assert n_equal >= 18, n_equal

    def test_masked_tail_carries_state(self):
        import jax
        log_pi0, log_P, log_lik = _random_problem(T=30, K=3, seed=6)
        valid = 19
        mask = (np.arange(30) < valid).astype(np.float32)
        z = np.asarray(hmm_ops.sample_posterior(
            jax.random.PRNGKey(2), log_pi0, log_P, log_lik, mask))
        assert np.all(z[valid - 1:] == z[valid - 1])

    def test_draws_not_degenerate_at_large_alpha_magnitude(self):
        """Unnormalized filtered alphas grow ~O(T in log mass); without the
        row-max subtraction before each categorical draw, f32 logits at
        ~1e8 magnitude (ULP 8) quantize the O(1) Gumbel noise to zero and
        every 'draw' degenerates to argmax — here a two-state chain exactly
        symmetric under 0<->1 swap, whose true marginals are 0.5/0.5 at any
        magnitude, would come out ~100% state 0. (Miniature of the
        T~1e5 design point, where alpha reaches -1e6..-1e7.)"""
        import jax
        T, K = 32, 2
        log_pi0 = jnp.log(jnp.full((K,), 0.5))
        log_P = jnp.log(jnp.full((K, K), 0.5))
        log_lik = jnp.full((T, K), -3e6)  # alpha_T ~ -1e8, both states equal
        for parallel in (False, True):
            keys = jax.random.split(jax.random.PRNGKey(13), 200)
            zs = np.asarray(jax.vmap(
                lambda k: hmm_ops.sample_posterior(
                    k, log_pi0, log_P, log_lik, parallel=parallel))(keys))
            frac0 = (zs == 0).mean()
            assert 0.35 < frac0 < 0.65, frac0


class TestForwardParallel:

    def test_matches_sequential(self):
        from behavenet_tpu.ops.hmm import forward, forward_parallel
        for seed in range(3):
            log_pi0, log_P, log_lik = _random_problem(T=50, K=4, seed=seed)
            a_seq, z_seq = forward(jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik))
            a_par, z_par = forward_parallel(
                jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik))
            assert np.allclose(float(z_seq), float(z_par), atol=1e-3)
            assert np.allclose(np.asarray(a_seq), np.asarray(a_par), atol=1e-3)

    def test_masked_matches_sequential(self):
        from behavenet_tpu.ops.hmm import forward, forward_parallel
        log_pi0, log_P, log_lik = _random_problem(T=32, K=3, seed=5)
        mask = np.ones(32, dtype=np.float32)
        mask[20:] = 0
        _, z_seq = forward(jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik),
                           jnp.array(mask))
        _, z_par = forward_parallel(jnp.array(log_pi0), jnp.array(log_P),
                                    jnp.array(log_lik), jnp.array(mask))
        assert np.allclose(float(z_seq), float(z_par), atol=1e-3)

    def test_time_varying_transitions(self):
        import numpy as np
        from behavenet_tpu.ops.hmm import forward, forward_parallel
        rng = np.random.RandomState(7)
        T, K = 20, 3
        log_pi0 = np.log(rng.dirichlet(np.ones(K))).astype(np.float32)
        log_P = np.log(rng.dirichlet(np.ones(K), size=(T - 1, K))).astype(np.float32)
        log_lik = rng.randn(T, K).astype(np.float32)
        _, z_seq = forward(jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik))
        _, z_par = forward_parallel(jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik))
        assert np.allclose(float(z_seq), float(z_par), atol=1e-3)


class TestBackwardParallel:

    def test_matches_sequential(self):
        for seed in range(3):
            log_pi0, log_P, log_lik = _random_problem(T=17, K=4, seed=seed)
            b_seq = hmm_ops.backward(jnp.array(log_P), jnp.array(log_lik))
            b_par = hmm_ops.backward_parallel(jnp.array(log_P), jnp.array(log_lik))
            assert np.allclose(np.asarray(b_seq), np.asarray(b_par), atol=1e-3)

    def test_matches_sequential_masked(self):
        log_pi0, log_P, log_lik = _random_problem(T=15, K=3, seed=1)
        mask = np.ones(15, dtype=np.float32)
        mask[9:] = 0.0
        b_seq = hmm_ops.backward(jnp.array(log_P), jnp.array(log_lik), jnp.array(mask))
        b_par = hmm_ops.backward_parallel(
            jnp.array(log_P), jnp.array(log_lik), jnp.array(mask))
        assert np.allclose(np.asarray(b_seq), np.asarray(b_par), atol=1e-3)

    def test_forward_backward_parallel_flag(self):
        log_pi0, log_P, log_lik = _random_problem(T=12, K=3, seed=2)
        mask = np.ones(12, dtype=np.float32)
        mask[10:] = 0.0
        args = (jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik),
                jnp.array(mask))
        g_s, z_s, xi_s = hmm_ops.forward_backward(*args)
        g_p, z_p, xi_p = hmm_ops.forward_backward(*args, parallel=True)
        assert np.allclose(float(z_s), float(z_p), rtol=1e-4)
        assert np.allclose(np.asarray(g_s), np.asarray(g_p), atol=1e-3)
        assert np.allclose(np.asarray(xi_s), np.asarray(xi_p), atol=1e-3)

    def test_arhmm_parallel_scan_fit_matches(self):
        from behavenet_tpu.models.arhmm import ARHMM
        rng = np.random.RandomState(0)
        mus = np.array([[-3.0, -3.0], [3.0, 3.0]])
        z = np.zeros(300, dtype=int)
        for t in range(1, 300):
            z[t] = z[t - 1] if rng.rand() < 0.95 else 1 - z[t - 1]
        x = (mus[z] + 0.5 * rng.randn(300, 2)).astype(np.float32)
        fits = {}
        for par in (False, True):
            np.random.seed(0)
            hmm = ARHMM(K=2, D=2, lags=1, observations='ar', rng_seed=0,
                        parallel_scan=par)
            hmm.initialize([x])
            fits[par] = (hmm.fit([x], num_iters=5), hmm)
        assert np.allclose(fits[False][0], fits[True][0], rtol=1e-4)
        for k in ('log_pi0', 'log_Ps', 'As', 'bs', 'Sigmas'):
            assert np.allclose(np.asarray(fits[False][1].params[k]),
                               np.asarray(fits[True][1].params[k]),
                               rtol=1e-3, atol=1e-4), k


class TestViterbiParallel:

    def test_matches_brute_force(self):
        for seed in range(3):
            log_pi0, log_P, log_lik = _random_problem(T=6, K=3, seed=seed)
            _, _, best = _brute_force(log_pi0, log_P, log_lik)
            z = hmm_ops.viterbi_parallel(
                jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik))
            assert (np.asarray(z) == best).all()

    def test_matches_sequential_long(self):
        log_pi0, log_P, log_lik = _random_problem(T=200, K=4, seed=0)
        z_s = hmm_ops.viterbi(jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik))
        z_p = hmm_ops.viterbi_parallel(
            jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik))
        assert (np.asarray(z_s) == np.asarray(z_p)).all()

    def test_masked(self):
        log_pi0, log_P, log_lik = _random_problem(T=20, K=3, seed=1)
        mask = np.ones(20, dtype=np.float32)
        mask[14:] = 0.0
        z_s = hmm_ops.viterbi(
            jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik), jnp.array(mask))
        z_p = hmm_ops.viterbi_parallel(
            jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik), jnp.array(mask))
        assert (np.asarray(z_s)[:14] == np.asarray(z_p)[:14]).all()


class TestLongSequenceStability:

    def test_gamma_finite_under_huge_loglik_magnitudes(self):
        """Regression: alpha_t+beta_t-log_Z drift used to overflow exp().

        At |alpha| ~ 1e9 the f32 ULP is ~64, so the sequential recursions'
        random-walk roundoff exceeds exp's overflow threshold within ~1k
        steps — the same mechanism that NaN'd 100k-frame E-steps at
        |alpha| ~ 1e6 before per-step posterior normalization.
        """
        rng = np.random.RandomState(0)
        T, K = 2000, 4
        log_pi0 = np.log(np.ones(K) / K).astype(np.float32)
        log_P = np.log(rng.dirichlet(np.ones(K), K)).astype(np.float32)
        # huge per-frame magnitudes: |alpha| reaches ~1e9 by the end
        log_lik = (rng.randn(T, K) - 1e6).astype(np.float32)
        gamma, log_Z, xi_sum = hmm_ops.forward_backward(
            jnp.array(log_pi0), jnp.array(log_P), jnp.array(log_lik))
        g = np.asarray(gamma)
        assert np.isfinite(g).all()
        assert np.allclose(g.sum(axis=1), 1.0, atol=1e-3)
        assert np.isfinite(np.asarray(xi_sum)).all()


class TestChunkedParallel:
    """Auto-chunked parallel passes == unchunked (compile-time fix path)."""

    def test_chunked_matches_sequential(self, monkeypatch):
        from behavenet_tpu.ops import hmm as hmm_ops
        monkeypatch.setattr(hmm_ops, '_CHUNK_ABOVE', 16)
        monkeypatch.setattr(hmm_ops, '_CHUNK', 8)
        rng = np.random.RandomState(0)
        T, K = 83, 4
        log_pi0 = jnp.log(jnp.ones(K) / K)
        log_P = jnp.asarray(np.log(rng.dirichlet(np.ones(K), size=K)), jnp.float32)
        ll = jnp.asarray(rng.randn(T, K).astype(np.float32))
        mask = jnp.asarray(
            np.concatenate([[1.0], (rng.rand(T - 1) > 0.1)]).astype(np.float32))
        a_par, z_par = hmm_ops.forward_parallel(log_pi0, log_P, ll, mask)
        a_seq, z_seq = hmm_ops.forward(log_pi0, log_P, ll, mask)
        assert np.allclose(float(z_par), float(z_seq), atol=1e-3)
        assert np.allclose(np.asarray(a_par), np.asarray(a_seq), atol=1e-3)
        b_par = hmm_ops.backward_parallel(log_P, ll, mask)
        b_seq = hmm_ops.backward(log_P, ll, mask)
        assert np.allclose(np.asarray(b_par), np.asarray(b_seq), atol=1e-3)
        v_par = hmm_ops.viterbi_parallel(log_pi0, log_P, ll, mask)
        v_seq = hmm_ops.viterbi(log_pi0, log_P, ll, mask)
        assert (np.asarray(v_par) == np.asarray(v_seq)).all()

    def test_parallel_backtrace_self_consistent(self):
        """Pointer-doubling backtrace satisfies z[t] == psi[t][z[t+1]] for
        its own backpointers (exactly the sequential backtrace's output)."""
        from behavenet_tpu.ops import hmm as hmm_ops
        rng = np.random.RandomState(2)
        T, K = 700, 5
        log_pi0 = jnp.log(jnp.ones(K) / K)
        log_P = jnp.asarray(np.log(rng.dirichlet(np.ones(K), size=K)), jnp.float32)
        ll = jnp.asarray(rng.randn(T, K).astype(np.float32))
        lp = jnp.broadcast_to(log_P[None], (T - 1, K, K))
        Ms = lp + ll[1:, None, :]
        identity = jnp.where(jnp.eye(K) > 0, 0.0, -jnp.inf)
        prefix = hmm_ops._prefix(hmm_ops._maxplus_matmul, Ms, identity)
        delta0 = log_pi0 + ll[0]
        deltas = jnp.max(delta0[None, :, None] + prefix, axis=1)
        delta = jnp.concatenate([delta0[None], deltas], axis=0)
        psi = np.asarray(jnp.argmax(delta[:-1, :, None] + lp, axis=1))
        z = np.asarray(hmm_ops.viterbi_parallel(log_pi0, log_P, ll))
        assert z[-1] == int(np.argmax(np.asarray(delta)[-1]))
        assert all(z[t] == psi[t][z[t + 1]] for t in range(T - 1))
