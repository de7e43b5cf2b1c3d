"""Numerical parity of conv/pool primitives against torch reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from behavenet_tpu.ops import conv as ops


def _nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1)


class TestConv2d:

    def test_asymmetric_padding(self):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 13, 17, 3).astype(np.float32)
        w = rng.randn(5, 5, 3, 8).astype(np.float32)
        b = rng.randn(8).astype(np.float32)
        pad_y, pad_x = (1, 2), (2, 1)
        out = np.asarray(ops.conv2d(jnp.array(x), jnp.array(w), jnp.array(b), 2, pad_y, pad_x))
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        xt = F.pad(xt, [pad_x[0], pad_x[1], pad_y[0], pad_y[1]])
        wt = torch.tensor(w.transpose(3, 2, 0, 1))
        ref = _nhwc(F.conv2d(xt, wt, torch.tensor(b), stride=2))
        assert out.shape == ref.shape
        assert np.allclose(out, ref, atol=1e-4)

    @pytest.mark.parametrize('stride,pad', [(1, 0), (2, 2), (2, 1)])
    def test_symmetric_padding(self, stride, pad):
        rng = np.random.RandomState(1)
        x = rng.randn(3, 16, 16, 4).astype(np.float32)
        w = rng.randn(3, 3, 4, 6).astype(np.float32)
        b = rng.randn(6).astype(np.float32)
        out = np.asarray(ops.conv2d(
            jnp.array(x), jnp.array(w), jnp.array(b), stride, (pad, pad), (pad, pad)))
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        wt = torch.tensor(w.transpose(3, 2, 0, 1))
        ref = _nhwc(F.conv2d(xt, wt, torch.tensor(b), stride=stride, padding=pad))
        assert np.allclose(out, ref, atol=1e-4)


class TestConvTranspose2d:

    @pytest.mark.parametrize('stride,pad,out_pad', [(2, 2, 1), (1, 0, 0), (3, 1, 2)])
    def test_symmetric(self, stride, pad, out_pad):
        rng = np.random.RandomState(2)
        x = rng.randn(2, 4, 5, 8).astype(np.float32)
        w = rng.randn(5, 5, 8, 3).astype(np.float32)
        b = rng.randn(3).astype(np.float32)
        out = np.asarray(ops.conv_transpose2d(
            jnp.array(x), jnp.array(w), jnp.array(b), stride,
            (pad, pad), (pad, pad), (out_pad, out_pad)))
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        wt = torch.tensor(w.transpose(2, 3, 0, 1))  # torch: (in, out, kh, kw)
        ref = _nhwc(F.conv_transpose2d(
            xt, wt, torch.tensor(b), stride=stride, padding=pad, output_padding=out_pad))
        assert out.shape == ref.shape
        assert np.allclose(out, ref, atol=1e-4)

    def test_asymmetric_crop(self):
        """Asymmetric 'same' padding: reference pads 0 then crops (aes.py:465-470)."""
        rng = np.random.RandomState(3)
        x = rng.randn(2, 4, 5, 8).astype(np.float32)
        w = rng.randn(5, 5, 8, 3).astype(np.float32)
        b = rng.randn(3).astype(np.float32)
        x0, x1, y0, y1 = 1, 2, 2, 1
        out = np.asarray(ops.conv_transpose2d(
            jnp.array(x), jnp.array(w), jnp.array(b), 2, (y0, y1), (x0, x1), (0, 0)))
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        wt = torch.tensor(w.transpose(2, 3, 0, 1))
        ref_t = F.conv_transpose2d(xt, wt, torch.tensor(b), stride=2, padding=0)
        ref = _nhwc(F.pad(ref_t, [-x0, -x1, -y0, -y1]))
        assert out.shape == ref.shape
        assert np.allclose(out, ref, atol=1e-4)


class TestConvTransposeFast:
    """Subpixel forward and custom-VJP gradients are exact rearrangements."""

    @pytest.mark.parametrize('k,stride,pads,out_pad,block', [
        (5, 2, ((1, 2), (2, 1)), 0, 2),
        (5, 2, ((1, 2), (1, 2)), 0, 8),
        (5, 5, ((1, 2), (1, 2)), 0, 5),
        (4, 2, ((2, 2), (2, 2)), 1, 4),
        (3, 2, ((0, 0), (0, 0)), 1, 2),
    ])
    def test_subpixel_matches_dilated(self, k, stride, pads, out_pad, block):
        import jax
        rng = np.random.RandomState(5)
        x = jnp.array(rng.randn(2, 9, 8, 6).astype(np.float32))
        w = jnp.array(rng.randn(k, k, 6, 3).astype(np.float32))
        b = jnp.array(rng.randn(3).astype(np.float32))
        ref = ops._tconv_dilated(x, w, stride, pads[0], pads[1],
                                 (out_pad, out_pad), jnp.float32, jnp.float32) + b
        out = ops.conv_transpose2d(x, w, b, stride, pads[0], pads[1],
                                   (out_pad, out_pad), block=block)
        assert out.shape == ref.shape
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    @pytest.mark.parametrize('block', [None, 2, 4])
    def test_custom_vjp_matches_autodiff(self, block):
        """Hand-written gx/gw (block=None) and autodiff-through-subpixel
        (block=F) both equal autodiff through the raw dilated lowering."""
        import jax
        rng = np.random.RandomState(6)
        x = jnp.array(rng.randn(2, 7, 9, 5).astype(np.float32))
        w = jnp.array(rng.randn(5, 5, 5, 2).astype(np.float32))

        def f_ref(x_, w_):
            o = ops._tconv_dilated(x_, w_, 2, (1, 2), (2, 1), (1, 1),
                                   jnp.float32, jnp.float32)
            return jnp.sum(jnp.sin(o))

        def f_new(x_, w_):
            o = ops.conv_transpose2d(x_, w_, None, 2, (1, 2), (2, 1), (1, 1),
                                     block=block)
            return jnp.sum(jnp.sin(o))

        v0, g0 = jax.value_and_grad(f_ref, argnums=(0, 1))(x, w)
        v1, g1 = jax.value_and_grad(f_new, argnums=(0, 1))(x, w)
        assert np.allclose(v0, v1, atol=1e-4)
        assert np.allclose(np.asarray(g0[0]), np.asarray(g1[0]), atol=1e-3)
        assert np.allclose(np.asarray(g0[1]), np.asarray(g1[1]), atol=1e-3)


class TestMaxPoolUnpool:

    @pytest.mark.parametrize('hw,ceil', [((14, 14), False), ((13, 17), True), ((13, 17), False)])
    def test_pool_indices_and_unpool(self, hw, ceil):
        h, w = hw
        rng = np.random.RandomState(4)
        x = rng.randn(2, h, w, 4).astype(np.float32)
        pooled, idx = ops.max_pool2d_with_indices(jnp.array(x), ceil_mode=ceil)
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        pt, it = F.max_pool2d(xt, 2, 2, ceil_mode=ceil, return_indices=True)
        assert np.allclose(np.asarray(pooled), _nhwc(pt))
        assert (np.asarray(idx) == it.numpy().transpose(0, 2, 3, 1)).all()
        up = np.asarray(ops.max_unpool2d(pooled, idx, (h, w)))
        ut = _nhwc(F.max_unpool2d(pt, it, 2, 2, output_size=(h, w)))
        assert np.allclose(up, ut)


class TestActivations:

    def test_leaky_relu_slope(self):
        x = jnp.array([-2.0, -0.5, 0.0, 1.5])
        out = np.asarray(ops.leaky_relu(x))
        assert np.allclose(out, [-0.1, -0.025, 0.0, 1.5])


class TestGradWS2d:
    """Custom conv2d VJP for tiny-Cin strided layers (s2d grad-w regrouping).

    The space-to-depth phase regrouping must be mathematically exact — the
    lowering is chosen per layer shape at trace time, so both grads are
    checked bit-for-bit against plain autodiff of the reference conv.
    """

    @pytest.mark.parametrize('cfg', [
        # (H, W, ci, co, k, s, pad_y, pad_x) — enc1-like + asymmetric + k3 + s4
        (16, 12, 1, 8, 5, 2, (1, 2), (1, 2)),
        (16, 16, 2, 4, 5, 2, (2, 1), (1, 2)),
        (12, 12, 1, 3, 3, 2, (0, 1), (0, 1)),
        (16, 16, 1, 4, 5, 4, (1, 2), (1, 2)),
    ])
    def test_grads_match_autodiff(self, cfg, monkeypatch):
        H, W, ci, co, k, s, py, px = cfg
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(3, H, W, ci).astype('f'))
        w = jnp.asarray(rng.randn(k, k, ci, co).astype('f'))
        # the guard must actually route this shape through the custom VJP
        # (multi-channel inputs gate on batch size — force the path here)
        from behavenet_tpu.ops import conv as conv_mod
        monkeypatch.setattr(conv_mod, '_S2DGW_MIN_BATCH', 0)
        assert ci * s * s <= 16

        def ref(x_, w_):
            return jax.lax.conv_general_dilated(
                x_, w_, (s, s), (py, px),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        def loss_custom(x_, w_):
            return jnp.sum(ops.conv2d(x_, w_, None, s, py, px) ** 2)

        def loss_ref(x_, w_):
            return jnp.sum(ref(x_, w_).astype(jnp.float32) ** 2)

        assert np.allclose(np.asarray(ops.conv2d(x, w, None, s, py, px)),
                           np.asarray(ref(x, w)), atol=1e-5)
        g1 = jax.grad(loss_custom, argnums=(0, 1))(x, w)
        g0 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        assert np.abs(np.asarray(g1[0]) - np.asarray(g0[0])).max() < 1e-4
        assert np.abs(np.asarray(g1[1]) - np.asarray(g0[1])).max() < 1e-4

    def test_odd_spatial_falls_back(self):
        """Shapes the regrouping cannot express use the default lowering."""
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 15, 15, 1).astype('f'))  # odd: oh*s != h
        w = jnp.asarray(rng.randn(5, 5, 1, 4).astype('f'))
        out = ops.conv2d(x, w, None, 2, (1, 2), (1, 2))
        ref = jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 2), (1, 2)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
