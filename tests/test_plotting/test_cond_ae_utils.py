"""Latent-traversal machinery: interpolate_1d / interpolate_2d contracts."""

import numpy as np

import jax

from behavenet_tpu.models import AE
from behavenet_tpu.models import arch as arch_mod
from behavenet_tpu.plotting.cond_ae_utils import interpolate_1d, interpolate_2d


def _small_ae(n_latents=4):
    a = arch_mod.load_handcrafted_arch([1, 32, 24], n_latents, None, check_memory=False)
    hp = dict(a, model_class='ae', model_type='conv', n_ae_latents=n_latents,
              n_input_channels=1, y_pixels=32, x_pixels=24, rng_seed_model=0)
    model = AE(hp)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


class TestInterpolate:

    def test_1d_latents_shapes(self):
        model, params = _small_ae()
        latents_0 = np.zeros((1, 4), dtype=np.float32)
        ims, markers, crops = interpolate_1d(
            'latents', model, params, None, latents_0, None, None,
            mins=[-1] * 4, maxes=[1] * 4, input_idxs=[0, 2], n_frames=3)
        assert len(ims) == 2 and all(len(row) == 3 for row in ims)
        assert all(im.shape == (32, 24) for row in ims for im in row)
        assert all(np.isnan(m).all() for row in markers for m in row)
        assert all(c == [] for row in crops for c in row)

    def test_1d_traversal_changes_frames(self):
        """Varying a latent dim must change the reconstruction monotonically
        along the traversal path endpoints."""
        model, params = _small_ae()
        latents_0 = np.zeros((1, 4), dtype=np.float32)
        ims, _, _ = interpolate_1d(
            'latents', model, params, None, latents_0, None, None,
            mins=[-2] * 4, maxes=[2] * 4, input_idxs=[0], n_frames=3)
        d01 = np.abs(ims[0][0] - ims[0][1]).mean()
        d02 = np.abs(ims[0][0] - ims[0][2]).mean()
        assert d01 > 0 and d02 > d01

    def test_2d_latents_grid_with_markers_and_crop(self):
        model, params = _small_ae()
        latents_0 = np.zeros((1, 4), dtype=np.float32)
        labels_sc_0 = np.array([[10.0, 8.0, 20.0, 16.0]], dtype=np.float32)
        crop_kwargs = {'y_0': 16, 'y_ext': 6, 'x_0': 12, 'x_ext': 5}
        ims, markers, crops = interpolate_2d(
            'latents', model, params, None, latents_0, None, labels_sc_0,
            mins=[-1] * 4, maxes=[1] * 4, input_idxs=[0, 1], n_frames=2,
            crop_type='fixed', crop_kwargs=crop_kwargs, marker_idxs=[0, 1])
        assert len(ims) == 2 and len(ims[0]) == 2
        # markers: scaled labels shifted by the crop origin
        y_min = crop_kwargs['y_0'] - crop_kwargs['y_ext']
        x_min = crop_kwargs['x_0'] - crop_kwargs['x_ext']
        for row in markers:
            for m in row:
                assert np.allclose(m, [10.0 - y_min, 8.0 - x_min])
        for row in crops:
            for c in row:
                assert np.asarray(c).ndim == 2 and np.asarray(c).size > 0

    def test_2d_distinct_dims_vary_along_distinct_axes(self):
        """Grid rows follow input_idxs[0], columns input_idxs[1]."""
        model, params = _small_ae()
        latents_0 = np.zeros((1, 4), dtype=np.float32)
        ims, _, _ = interpolate_2d(
            'latents', model, params, None, latents_0, None, None,
            mins=[-2] * 4, maxes=[2] * 4, input_idxs=[0, 1], n_frames=2)
        # moving along rows changes dim 0; along cols changes dim 1 —
        # all four corners must be distinct frames
        corners = [ims[0][0], ims[0][1], ims[1][0], ims[1][1]]
        for i in range(4):
            for j in range(i + 1, 4):
                assert np.abs(corners[i] - corners[j]).max() > 0
