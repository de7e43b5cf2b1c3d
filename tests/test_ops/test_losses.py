"""Loss zoo parity with the reference formulas (checked against hand math / torch)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from behavenet_tpu.ops import losses

LN2PI = np.log(2 * np.pi)


class TestBasicLosses:

    def test_mse(self):
        rng = np.random.RandomState(0)
        a = rng.randn(10, 4).astype(np.float32)
        b = rng.randn(10, 4).astype(np.float32)
        assert np.allclose(np.asarray(losses.mse(jnp.array(a), jnp.array(b))),
                           np.mean((a - b) ** 2), atol=1e-6)

    def test_mse_masked_divides_by_total_elements(self):
        rng = np.random.RandomState(1)
        a = rng.randn(10, 4).astype(np.float32)
        b = rng.randn(10, 4).astype(np.float32)
        m = (rng.rand(10, 4) > 0.5).astype(np.float32)
        # reference semantics: mean over ALL elements (losses.py:57)
        expected = np.mean(((a - b) ** 2) * m)
        assert np.allclose(np.asarray(losses.mse(jnp.array(a), jnp.array(b), jnp.array(m))),
                           expected, atol=1e-6)

    def test_gaussian_ll(self):
        rng = np.random.RandomState(2)
        a = rng.randn(8, 3, 5).astype(np.float32)
        b = rng.randn(8, 3, 5).astype(np.float32)
        n_dims = 15
        expected = np.mean(
            -0.5 * LN2PI * n_dims - 0.5 * np.sum((a - b) ** 2, axis=(1, 2)))
        assert np.allclose(np.asarray(losses.gaussian_ll(jnp.array(a), jnp.array(b))),
                           expected, atol=1e-5)

    def test_gaussian_ll_to_mse_roundtrip(self):
        rng = np.random.RandomState(3)
        a = rng.randn(8, 6).astype(np.float32)
        b = rng.randn(8, 6).astype(np.float32)
        ll = float(np.asarray(losses.gaussian_ll(jnp.array(a), jnp.array(b))))
        mse_val = losses.gaussian_ll_to_mse(ll, 6)
        assert np.allclose(mse_val, np.mean((a - b) ** 2), atol=1e-5)

    def test_kl_div_to_std_normal_zero_at_prior(self):
        mu = jnp.zeros((5, 3))
        logvar = jnp.zeros((5, 3))
        assert np.allclose(np.asarray(losses.kl_div_to_std_normal(mu, logvar)), 0.0)

    def test_kl_div_hand_math(self):
        mu = jnp.array([[1.0, 0.0]])
        logvar = jnp.array([[0.0, np.log(2.0)]])
        expected = 0.5 * ((1 - 0 + 1 - 1) + (2 - np.log(2.0) + 0 - 1))
        assert np.allclose(np.asarray(losses.kl_div_to_std_normal(mu, logvar)),
                           expected, atol=1e-6)


class TestDecomposedKL:

    def test_consistency_with_standalone_estimators(self):
        """decomposed_kl must agree with the three standalone estimators (reference test :76)."""
        rng = np.random.RandomState(4)
        z = jnp.array(rng.randn(12, 5).astype(np.float32))
        mu = jnp.array(rng.randn(12, 5).astype(np.float32))
        logvar = jnp.array(0.1 * rng.randn(12, 5).astype(np.float32))
        mi, tc, dwkl = losses.decomposed_kl(z, mu, logvar)
        assert np.allclose(np.asarray(mi), np.asarray(losses.index_code_mi(z, mu, logvar)),
                           atol=1e-5)
        assert np.allclose(np.asarray(tc), np.asarray(losses.total_correlation(z, mu, logvar)),
                           atol=1e-5)
        assert np.allclose(
            np.asarray(dwkl), np.asarray(losses.dimension_wise_kl_to_std_normal(z, mu, logvar)),
            atol=1e-5)


class TestSubspaceOverlap:

    def test_orthogonal_rows_give_zero(self):
        from scipy.stats import ortho_group
        m = ortho_group.rvs(dim=6, random_state=np.random.RandomState(0)).astype(np.float32)
        A, B = jnp.array(m[:3]), jnp.array(m[3:])
        assert np.asarray(losses.subspace_overlap(A, B)) < 1e-10


class TestGaussianNegLogProb:

    def test_against_torch_mvn(self):
        rng = np.random.RandomState(5)
        d = 4
        pred = rng.randn(7, d).astype(np.float32)
        tgt = rng.randn(7, d).astype(np.float32)
        A = rng.randn(d, d).astype(np.float32)
        cov = (A @ A.T).astype(np.float32)
        out = np.asarray(losses.gaussian_neg_log_prob(
            jnp.array(pred), jnp.array(tgt), jnp.array(cov)))
        dist = torch.distributions.MultivariateNormal(
            loc=torch.tensor(pred),
            covariance_matrix=1e-3 * torch.eye(d) + torch.tensor(cov))
        ref = torch.mean(-dist.log_prob(torch.tensor(tgt))).item()
        assert np.allclose(out, ref, atol=1e-3)


class TestTripletLoss:

    def test_shapes_and_nonnegative(self):
        rng = np.random.RandomState(6)
        key = jax.random.PRNGKey(0)
        for n_datasets in (2, 3, 4):
            seg = 36
            z = jnp.array(rng.randn(n_datasets * seg, 5).astype(np.float32))
            val = np.asarray(losses.triplet_loss(key, z, (seg,) * n_datasets))
            assert np.isfinite(val)
            assert val.shape == ()

    def test_separated_clusters_have_low_loss(self):
        key = jax.random.PRNGKey(1)
        seg = 30
        # two far-apart tight clusters: within-pair distances ~0, margins satisfied
        z0 = jnp.zeros((seg, 3))
        z1 = 100.0 + jnp.zeros((seg, 3))
        z = jnp.concatenate([z0, z1], axis=0)
        val = np.asarray(losses.triplet_loss(key, z, (seg, seg)))
        assert val < 1e-3

    def test_all_ones_mask_matches_unmasked(self):
        rng = np.random.RandomState(7)
        key = jax.random.PRNGKey(2)
        for n_datasets in (2, 3, 4):
            seg = 27
            z = jnp.array(rng.randn(n_datasets * seg, 5).astype(np.float32))
            lens = (seg,) * n_datasets
            a = np.asarray(losses.triplet_loss(key, z, lens))
            b = np.asarray(losses.triplet_loss(
                key, z, lens, seg_mask=jnp.ones(n_datasets * seg)))
            assert np.allclose(a, b, atol=1e-6), n_datasets

    def test_padded_rows_are_inert(self):
        """With constant within-session embeddings, the masked padded value
        equals the exact-shape value regardless of permutation draws."""
        key = jax.random.PRNGKey(3)
        vec_a = np.array([1.0, 2.0, 3.0])
        vec_b = np.array([-4.0, 0.0, 5.0])
        # exact: 30 + 30 rows
        z_exact = jnp.array(np.vstack([np.tile(vec_a, (30, 1)),
                                       np.tile(vec_b, (30, 1))]), dtype=jnp.float32)
        want = np.asarray(losses.triplet_loss(key, z_exact, (30, 30)))
        # padded: segments of 33 with 30 valid rows + 3 zero-pad rows
        def pad_seg(vec):
            return np.vstack([np.tile(vec, (30, 1)), np.zeros((3, 3))])
        z_pad = jnp.array(np.vstack([pad_seg(vec_a), pad_seg(vec_b)]),
                          dtype=jnp.float32)
        mask = jnp.array(np.concatenate(
            [np.ones(30), np.zeros(3), np.ones(30), np.zeros(3)]), dtype=jnp.float32)
        got = np.asarray(losses.triplet_loss(
            jax.random.PRNGKey(99), z_pad, (33, 33), seg_mask=mask))
        assert np.allclose(got, want, atol=1e-5), (got, want)
        # without the mask, the zero pad rows contaminate the estimate
        bad = np.asarray(losses.triplet_loss(
            jax.random.PRNGKey(99), z_pad, (33, 33)))
        assert not np.allclose(bad, want, atol=1e-3)
