"""Sequence-parallel scans: exact agreement with the single-device kernels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavenet_tpu.ops import hmm
from behavenet_tpu.ops import kalman
from behavenet_tpu.parallel.mesh import make_mesh
from behavenet_tpu.parallel.seq import (
    sp_scan, sp_forward_backward, sp_viterbi,
    sp_kalman_filter, sp_kalman_smooth)


@pytest.fixture(scope='module')
def mesh():
    return make_mesh(axis_name='sp')


def _chain(T=50, K=4, seed=0):
    rng = np.random.RandomState(seed)
    log_pi0 = jnp.asarray(np.log(rng.dirichlet(np.ones(K))))
    log_P = jnp.asarray(np.log(rng.dirichlet(np.ones(K), size=K)))
    log_lik = jnp.asarray(rng.randn(T, K).astype(np.float32))
    return log_pi0, log_P, log_lik


class TestSpScan:

    @pytest.mark.parametrize('reverse', [False, True])
    @pytest.mark.parametrize('T', [5, 48, 57])  # < n, divisible, ragged
    def test_matches_associative_scan(self, mesh, reverse, T):
        K = 4
        rng = np.random.RandomState(1)
        Ms = jnp.asarray(rng.randn(T, K, K).astype(np.float32))
        identity = jnp.where(jnp.eye(K) > 0, 0.0, -jnp.inf)
        ref = jax.lax.associative_scan(hmm._log_matmul, Ms, reverse=reverse)
        out = sp_scan(hmm._log_matmul, Ms, identity, mesh, reverse=reverse)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_integer_monoid(self, mesh):
        """Backtrace-composition monoid (int index maps) survives sharding."""
        T, K = 37, 5
        rng = np.random.RandomState(2)
        psi = jnp.asarray(rng.randint(0, K, (T, K)), jnp.int32)
        ident = jnp.arange(K, dtype=jnp.int32)

        def compose(later, earlier):
            return jnp.take_along_axis(earlier, later, axis=-1)

        ref = jax.lax.associative_scan(compose, psi, reverse=True)
        out = sp_scan(compose, psi, ident, mesh, reverse=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_under_jit(self, mesh):
        K = 3
        Ms = jnp.asarray(np.random.RandomState(3).randn(26, K, K), jnp.float32)
        identity = jnp.where(jnp.eye(K) > 0, 0.0, -jnp.inf)
        f = jax.jit(lambda m: sp_scan(hmm._log_matmul, m, identity, mesh))
        np.testing.assert_allclose(
            np.asarray(f(Ms)),
            np.asarray(jax.lax.associative_scan(hmm._log_matmul, Ms)),
            rtol=2e-5, atol=2e-5)


class TestSpForwardBackward:

    @pytest.mark.parametrize('T', [40, 61])
    def test_matches_sequential(self, mesh, T):
        log_pi0, log_P, log_lik = _chain(T=T)
        g0, z0, x0 = hmm.forward_backward(log_pi0, log_P, log_lik)
        g1, z1, x1 = sp_forward_backward(log_pi0, log_P, log_lik, mesh=mesh)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-4, atol=1e-5)
        assert abs(float(z1) - float(z0)) < 1e-3
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                                   rtol=1e-4, atol=1e-5)

    def test_masked_tail(self, mesh):
        T, valid = 45, 31
        log_pi0, log_P, log_lik = _chain(T=T, seed=4)
        mask = jnp.asarray((np.arange(T) < valid).astype(np.float32))
        g0, z0, x0 = hmm.forward_backward(log_pi0, log_P, log_lik, mask)
        g1, z1, x1 = sp_forward_backward(log_pi0, log_P, log_lik, mask,
                                         mesh=mesh)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-4, atol=1e-5)
        assert abs(float(z1) - float(z0)) < 1e-3
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                                   rtol=1e-4, atol=1e-5)
        assert np.all(np.asarray(g1)[valid:] == 0)


class TestSpViterbi:

    @pytest.mark.parametrize('T', [33, 64])
    def test_matches_sequential(self, mesh, T):
        log_pi0, log_P, log_lik = _chain(T=T, seed=5)
        z_ref = hmm.viterbi(log_pi0, log_P, log_lik)
        z_sp = sp_viterbi(log_pi0, log_P, log_lik, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(z_sp), np.asarray(z_ref))


def _lds(T=53, n=3, d=2, seed=7):
    rng = np.random.RandomState(seed)
    F = jnp.asarray(np.tile(0.9 * np.eye(n) + 0.05 * rng.randn(n, n),
                            (T, 1, 1)).astype(np.float32))
    c = jnp.asarray(0.1 * rng.randn(T, n).astype(np.float32))
    Q = jnp.asarray(np.tile(0.1 * np.eye(n), (T, 1, 1)).astype(np.float32))
    H = jnp.asarray(rng.randn(d, n).astype(np.float32))
    R = jnp.asarray((0.5 * np.eye(d)).astype(np.float32))
    y = jnp.asarray(rng.randn(T, d).astype(np.float32))
    mask = jnp.ones(T)
    m0 = jnp.zeros(n)
    P0 = jnp.eye(n)
    return F, c, Q, H, R, y, mask, m0, P0


class TestSpKalman:

    @pytest.mark.parametrize('T', [40, 53])
    def test_filter_matches_single_device(self, mesh, T):
        F, c, Q, H, R, y, mask, m0, P0 = _lds(T=T)
        ms0, Ps0 = kalman.filter_parallel(F, c, Q, H, R, y, mask, m0, P0)
        ms1, Ps1 = sp_kalman_filter(F, c, Q, H, R, y, mask, m0, P0, mesh)
        np.testing.assert_allclose(np.asarray(ms1), np.asarray(ms0),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(Ps1), np.asarray(Ps0),
                                   rtol=1e-4, atol=1e-4)

    def test_smooth_matches_single_device(self, mesh):
        F, c, Q, H, R, y, mask, m0, P0 = _lds(T=47, seed=8)
        ms, Ps = kalman.filter_parallel(F, c, Q, H, R, y, mask, m0, P0)
        s0 = kalman.smooth_parallel(F, c, Q, ms, Ps)
        s1 = sp_kalman_smooth(F, c, Q, ms, Ps, mesh)
        np.testing.assert_allclose(np.asarray(s1[0]), np.asarray(s0[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s1[1]), np.asarray(s0[1]),
                                   rtol=1e-4, atol=1e-4)

    def test_masked_steps(self, mesh):
        """Prediction-only (masked) timesteps survive the time sharding."""
        T = 41
        F, c, Q, H, R, y, mask, m0, P0 = _lds(T=T, seed=9)
        mask = jnp.asarray(
            (np.random.RandomState(1).rand(T) > 0.3).astype(np.float32))
        ms0, Ps0 = kalman.filter_parallel(F, c, Q, H, R, y, mask, m0, P0)
        ms1, Ps1 = sp_kalman_filter(F, c, Q, H, R, y, mask, m0, P0, mesh)
        np.testing.assert_allclose(np.asarray(ms1), np.asarray(ms0),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(Ps1), np.asarray(Ps0),
                                   rtol=1e-4, atol=1e-4)


class TestBayesianDecoderSequenceParallel:
    """decode(mesh=...) matches decode(parallel=True) end to end."""

    def test_decode_matches(self, mesh):
        from behavenet_tpu.models.arhmm import ARHMM
        from behavenet_tpu.models.bayesian import BayesianDecoder
        rng = np.random.RandomState(0)
        data = rng.randn(97, 3).astype(np.float32)
        hmm_model = ARHMM(K=3, D=3, observations='ar', rng_seed=0)
        hmm_model.fit([data], num_iters=2)
        dec0 = BayesianDecoder(hmm_model, obs_noise=0.1 * np.eye(3))
        out0 = dec0.decode(data, parallel=True)
        dec1 = BayesianDecoder(hmm_model, obs_noise=0.1 * np.eye(3))
        out1 = dec1.decode(data, mesh=mesh)
        np.testing.assert_allclose(out1['latents'], out0['latents'],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(
            out1['states_posterior'], out0['states_posterior'],
            rtol=1e-3, atol=1e-4)
        np.testing.assert_array_equal(out1['states'], out0['states'])


class TestSpSamplePosterior:

    def test_matches_single_device_draw(self, mesh):
        """Same key, same presampled maps — identical realized path.
        The distributed and single-device alpha prefixes reassociate
        floats differently, so a Gumbel draw within roundoff of a tie can
        legitimately flip; require equality for nearly all keys."""
        from behavenet_tpu.parallel.seq import sp_sample_posterior
        log_pi0, log_P, log_lik = _chain(T=44, K=3, seed=6)
        n_equal = 0
        for i in range(6):
            key = jax.random.PRNGKey(i)
            z0 = hmm.sample_posterior(key, log_pi0, log_P, log_lik,
                                      parallel=True)
            z1 = sp_sample_posterior(key, log_pi0, log_P, log_lik, mesh=mesh)
            n_equal += int(np.array_equal(np.asarray(z0), np.asarray(z1)))
        assert n_equal >= 5, n_equal


class TestShardTimeEM:
    """fit(mesh=..., shard_time=True) matches single-device EM."""

    def test_em_equivalence(self, mesh):
        from behavenet_tpu.models.arhmm import ARHMM
        rng = np.random.RandomState(0)
        datas = [rng.randn(157, 2).astype(np.float32) for _ in range(2)]

        h0 = ARHMM(K=3, D=2, observations='ar', rng_seed=0)
        h0.initialize(datas)
        lls0 = h0.fit(datas, num_iters=3)

        h1 = ARHMM(K=3, D=2, observations='ar', rng_seed=0)
        h1.initialize(datas)
        lls1 = h1.fit(datas, num_iters=3, mesh=mesh, shard_time=True)

        np.testing.assert_allclose(lls1, lls0, rtol=1e-4)
        for key in ('As', 'bs', 'Sigmas', 'log_Ps', 'log_pi0'):
            np.testing.assert_allclose(
                np.asarray(h1.params[key]), np.asarray(h0.params[key]),
                rtol=1e-3, atol=1e-4, err_msg=key)

    @pytest.mark.parametrize('shard_time', [False, True])
    def test_iters_per_dispatch_composes_with_mesh(self, mesh, shard_time):
        """fit(iters_per_dispatch=k) with mesh=/shard_time= matches the
        sequential single-device fit (the fused-dispatch scan branch caches
        a mesh-closing program; ADVICE r3 flagged it as untested)."""
        from behavenet_tpu.models.arhmm import ARHMM
        rng = np.random.RandomState(0)
        datas = [rng.randn(157, 2).astype(np.float32) for _ in range(2)]

        h0 = ARHMM(K=3, D=2, observations='ar', rng_seed=0)
        h0.initialize(datas)
        lls0 = h0.fit(datas, num_iters=4)

        h1 = ARHMM(K=3, D=2, observations='ar', rng_seed=0)
        h1.initialize(datas)
        lls1 = h1.fit(datas, num_iters=4, mesh=mesh, shard_time=shard_time,
                      iters_per_dispatch=2)

        np.testing.assert_allclose(lls1, lls0, rtol=1e-4)
        for key in ('As', 'bs', 'Sigmas', 'log_Ps', 'log_pi0'):
            np.testing.assert_allclose(
                np.asarray(h1.params[key]), np.asarray(h0.params[key]),
                rtol=1e-3, atol=1e-4, err_msg=key)

    def test_recurrent_raises(self, mesh):
        from behavenet_tpu.models.arhmm import ARHMM
        h = ARHMM(K=2, D=2, observations='ar', transitions='recurrent',
                  rng_seed=0)
        with pytest.raises(NotImplementedError):
            h.fit([np.zeros((40, 2), np.float32)], mesh=mesh, shard_time=True)

    def test_shard_time_without_mesh_raises(self):
        """shard_time=True with no mesh must fail loudly, not silently run
        the single-device path the caller explicitly asked to avoid."""
        from behavenet_tpu.models.arhmm import ARHMM
        h = ARHMM(K=2, D=2, observations='ar', rng_seed=0)
        with pytest.raises(ValueError, match='mesh'):
            h.fit([np.zeros((40, 2), np.float32)], shard_time=True)


class TestARHMMSequenceParallel:
    """ARHMM single-trial inference with mesh= matches the scalar path."""

    def test_states_and_posteriors(self, mesh):
        from behavenet_tpu.models.arhmm import ARHMM
        rng = np.random.RandomState(0)
        data = rng.randn(203, 3).astype(np.float32)
        hmm_model = ARHMM(K=4, D=3, observations='ar', rng_seed=0)
        hmm_model.fit([data], num_iters=3)
        z0 = hmm_model.most_likely_states(data)
        z1 = hmm_model.most_likely_states(data, mesh=mesh)
        np.testing.assert_array_equal(z0, z1)
        g0 = hmm_model.expected_states(data)
        g1 = hmm_model.expected_states(data, mesh=mesh)
        # fitted (peaked) posteriors at T=203: reassociation roundoff is
        # ~1e-4 absolute — looser than the synthetic-chain tests above
        np.testing.assert_allclose(g1, g0, rtol=1e-3, atol=1e-4)
