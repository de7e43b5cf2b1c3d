"""Pallas KL-decomposition kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from behavenet_tpu.ops import losses
from behavenet_tpu.ops.pallas.kl_kernels import decomposed_kl_pallas


class TestDecomposedKLPallas:

    def _data(self, B=100, D=6, seed=0):
        rng = np.random.RandomState(seed)
        z = jnp.asarray(rng.randn(B, D).astype(np.float32))
        mu = jnp.asarray(rng.randn(B, D).astype(np.float32))
        logvar = jnp.asarray(0.2 * rng.randn(B, D).astype(np.float32))
        return z, mu, logvar

    def test_matches_reference(self):
        z, mu, logvar = self._data()
        ref = losses.decomposed_kl(z, mu, logvar)
        out = decomposed_kl_pallas(z, mu, logvar, interpret=True,
                                   block_j=32, block_i=32)
        for r, o in zip(ref, out):
            assert np.allclose(float(r), float(o), atol=1e-3), (float(r), float(o))

    def test_matches_reference_nondivisible_batch(self):
        """Batch not a multiple of the tile sizes: padding must be exact."""
        z, mu, logvar = self._data(B=77, D=5, seed=1)
        ref = losses.decomposed_kl(z, mu, logvar)
        out = decomposed_kl_pallas(z, mu, logvar, interpret=True,
                                   block_j=32, block_i=32)
        for r, o in zip(ref, out):
            assert np.allclose(float(r), float(o), atol=1e-3), (float(r), float(o))

    def test_frame_mask(self):
        z, mu, logvar = self._data(B=64, D=4, seed=2)
        fm = np.ones(64, dtype=np.float32)
        fm[50:] = 0
        ref = losses.decomposed_kl(z[:50], mu[:50], logvar[:50])
        out = decomposed_kl_pallas(z, mu, logvar, frame_mask=jnp.asarray(fm),
                                   interpret=True, block_j=32, block_i=32)
        for r, o in zip(ref, out):
            assert np.allclose(float(r), float(o), atol=1e-3), (float(r), float(o))
