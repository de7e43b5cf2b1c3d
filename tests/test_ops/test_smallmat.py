"""Unrolled small-matrix routines vs the generic linalg lowerings."""

import numpy as np

import jax.numpy as jnp

from behavenet_tpu.ops import smallmat


def _spd(rng, b, n):
    A = rng.randn(b, n, n).astype(np.float32)
    return jnp.asarray(A @ A.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32))


class TestSolveSmall:

    def test_matches_linalg_solve_batched(self):
        rng = np.random.RandomState(0)
        A = _spd(rng, 40, 7)
        Y = jnp.asarray(rng.randn(40, 7, 3).astype(np.float32))
        X = smallmat.solve_small(A, Y)
        ref = jnp.linalg.solve(A, Y)
        assert np.allclose(np.asarray(X), np.asarray(ref), atol=1e-3)

    def test_vector_rhs(self):
        rng = np.random.RandomState(1)
        A = _spd(rng, 25, 5)
        y = jnp.asarray(rng.randn(25, 5).astype(np.float32))
        x = smallmat.solve_small(A, y)
        assert x.shape == (25, 5)
        ref = jnp.linalg.solve(A, y[..., None])[..., 0]
        assert np.allclose(np.asarray(x), np.asarray(ref), atol=1e-3)

    def test_unbatched(self):
        rng = np.random.RandomState(2)
        A = _spd(rng, 1, 6)[0]
        Y = jnp.asarray(rng.randn(6, 2).astype(np.float32))
        assert np.allclose(np.asarray(smallmat.solve_small(A, Y)),
                           np.asarray(jnp.linalg.solve(A, Y)), atol=1e-4)


class TestCholeskySmall:

    def test_matches_linalg_cholesky(self):
        rng = np.random.RandomState(3)
        A = _spd(rng, 30, 8)
        L = smallmat.cholesky_small(A)
        ref = jnp.linalg.cholesky(A)
        assert np.allclose(np.asarray(L), np.asarray(ref), atol=1e-3)

    def test_forward_substitution(self):
        rng = np.random.RandomState(4)
        A = _spd(rng, 30, 8)
        L = smallmat.cholesky_small(A)
        b = jnp.asarray(rng.randn(30, 8).astype(np.float32))
        x = smallmat.solve_tril_small(L, b)
        recon = jnp.einsum('bij,bj->bi', L, x)
        assert np.allclose(np.asarray(recon), np.asarray(b), atol=1e-3)


class TestPivotedSolve:

    def test_zero_leading_pivot(self):
        """pivot=True handles matrices whose leading minor is singular."""
        A = jnp.asarray(np.array([[[0.0, 1.0], [1.0, 0.0]],
                                  [[0.0, 2.0], [3.0, 1.0]]], dtype=np.float32))
        Y = jnp.asarray(np.array([[[1.0], [2.0]], [[4.0], [5.0]]], dtype=np.float32))
        X = smallmat.solve_small(A, Y, pivot=True)
        ref = jnp.linalg.solve(A, Y)
        assert np.allclose(np.asarray(X), np.asarray(ref), atol=1e-5)

    def test_pivoted_matches_general_random(self):
        rng = np.random.RandomState(7)
        A = jnp.asarray(rng.randn(50, 6, 6).astype(np.float32))
        Y = jnp.asarray(rng.randn(50, 6, 2).astype(np.float32))
        X = smallmat.solve_small(A, Y, pivot=True)
        ref = jnp.linalg.solve(A, Y)
        assert np.allclose(np.asarray(X), np.asarray(ref), atol=1e-2, rtol=1e-3)
