"""2-D conv / conv-transpose / pool primitives with BehaveNet padding semantics.

These are thin, fully-static wrappers around ``jax.lax`` conv primitives, in
NHWC layout (TPU-preferred; images map channels onto lanes). The padding
contract matches the reference torch modules:

- encoder convs use explicit (before, after) per-dim pads from the arch dict
  (reference behavenet/models/aes.py:127-163 inserts a ZeroPad2d for
  asymmetric pads); here asymmetric padding is passed straight to XLA.
- decoder transposed convs reproduce torch ConvTranspose2d with
  ``padding``/``output_padding``, including the reference's negative-pad
  cropping trick for asymmetric 'same' padding (aes.py:407-418, 465-470):
  cropping c pixels off a side is folded into the conv padding directly.
- maxpool (kernel 2, stride 2) returns torch-style flat argmax indices so a
  matching unpool can scatter values back (aes.py:100-110, 281-294).

Compute dtype is configurable: inputs/weights are cast to ``compute_dtype``
(default bfloat16 on TPU) and accumulation is float32 via
``preferred_element_type``.
"""

from functools import partial as _partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DIMSPEC = ('NHWC', 'HWIO', 'NHWC')

# The s2d grad-w regrouping pays a relayout pass + 1.44x MACs (k=5, s=2) for
# s^2-fold sublane occupancy in the batch contraction; batch rides the lane
# dim of both operands, so an awkward batch (189 -> 256-lane tiles, 26% pad
# waste) can erase the win when ci > 1. Measured on v5e (tools/bench_gradw.py,
# enc1 128^2 k5 s2 grad-w, ms): ci=1 s2d wins at every batch (0.117 vs 0.220
# at B=189; 0.441 vs 0.898 at B=1024); ci=2 s2d LOSES at B=189 (0.177 vs
# 0.140) and wins at B=256/378/512/1024 (0.132/0.158/0.253/0.746 vs
# 0.274/0.376/0.477/0.903) — so multi-channel inputs gate on batch size.
# Tests monkeypatch this to 0 to force the custom-VJP path.
_S2DGW_MIN_BATCH = 256


def conv2d(x, w, b, stride, pad_y, pad_x, compute_dtype=None, out_dtype=None):
    """Conv with explicit asymmetric padding.

    Parameters
    ----------
    x : (N, H, W, Cin)
    w : (kh, kw, Cin, Cout)
    b : (Cout,) or None
    stride : int
    pad_y, pad_x : (before, after) tuples
    out_dtype : activation dtype for the output (default float32). Passing
        the compute dtype keeps the activation chain low-precision end to
        end, halving inter-layer HBM traffic on bandwidth-bound layers.

    Tiny-Cin strided layers (``Cin*s^2 <= 16``, e.g. the 1-channel first
    image conv; multi-channel inputs additionally need
    ``N >= _S2DGW_MIN_BATCH``) route through a custom VJP whose grad-w uses
    the space-to-depth phase regrouping (see ``_gradw_s2d``) — measured
    1.9-2x on the 1-channel layer's grad-w at batches 189/1024 on v5e, but a
    1.26x *loss* for the 2-view (Cin=2) workload at the 189-frame trial
    batch, hence the batch gate. Known limitation:
    ``jax.custom_vjp`` (here and in ``_tconv``) supports reverse-mode only,
    so ``jax.jvp``/``jacfwd`` through such a layer raises — training and
    every in-repo caller are reverse-mode; use ``jax.grad``/``vjp``.
    """
    dtype = compute_dtype or x.dtype
    odt = out_dtype or jnp.float32
    s = int(stride)
    n, h, ww, ci = x.shape
    k = w.shape[0]
    oh = (h + pad_y[0] + pad_y[1] - k) // s + 1
    ow = (ww + pad_x[0] + pad_x[1] - k) // s + 1
    # NB: `n` may be a symbolic dimension under jax.export shape polymorphism
    # (serving.py exports batch-polymorphic heads); comparing a symbolic dim
    # to an int raises InconclusiveDimensionOperation, so the batch gate only
    # fires on concrete batch sizes and symbolic batches take the XLA path.
    if s > 1 and ci * s * s <= 16 \
            and (ci == 1 or (isinstance(n, int) and n >= _S2DGW_MIN_BATCH)) \
            and h == oh * s and ww == ow * s and w.shape[1] == k:
        out = _conv_s2dgw(x, w, s, tuple(pad_y), tuple(pad_x),
                          compute_dtype, out_dtype)
    else:
        # compute (and differentiate) uniformly in the compute dtype, then
        # cast: the MXU accumulates in f32 internally for bf16 convs, and
        # keeping all conv operands one dtype keeps the VJP well-typed
        out = lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype),
            window_strides=(s, s),
            padding=(tuple(pad_y), tuple(pad_x)),
            dimension_numbers=_DIMSPEC,
        ).astype(odt)
    if b is not None:
        out = out + b.astype(odt)
    return out


def space_to_depth(x, block):
    """(N, H*block, W*block, C) -> (N, H, W, block*block*C).

    Inverse of :func:`depth_to_space` (same (ry, rx, c) channel order).
    """
    n, h, w, c = x.shape
    f = block
    x = x.reshape(n, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // f, w // f, f * f * c)


def _gradw_s2d(x, ct, k, s, p0y, p0x, dtype):
    """grad-w of a stride-``s`` conv via space-to-depth phase regrouping.

    XLA's autodiff lowers grad-w to an rhs-dilated conv contracting over
    batch with Cin sublane rows — for Cin=1 that is 1 of 8 sublanes (~3%
    MXU, 35% HBM measured). Moving the stride phases into channels
    (``s2d(x, s)`` -> ``s^2*Cin`` rows) turns the k-tap dilated window into
    a dense ``ceil(k/s)+``-tap one: 1.44x the MACs at 4x the sublane
    utilization for k=5, s=2 — measured 2x wall-time, 87% of the HBM
    roofline. Requires ``x`` spatial dims divisible by ``s`` with
    ``out*s == in`` ('same'-padded strided layers).

    Returns (k, k, Cin, Cout) in f32.
    """
    ci = x.shape[-1]
    x2 = space_to_depth(x, s)  # channel = (ry*s + rx)*ci + c
    ty = np.arange(k)
    my, ry = (ty - p0y) // s, (ty - p0y) % s
    mx, rx = (ty - p0x) // s, (ty - p0x) % s
    my0, my1 = int(my.min()), int(my.max())
    mx0, mx1 = int(mx.min()), int(mx.max())
    out = lax.conv_general_dilated(
        x2.transpose(3, 1, 2, 0).astype(dtype),   # (s^2*ci, Hb, Wb, B)
        ct.transpose(1, 2, 0, 3).astype(dtype),   # (Oy, Ox, B, co)
        window_strides=(1, 1), padding=((-my0, my1), (-mx0, mx1)),
        dimension_numbers=_DIMSPEC,
        preferred_element_type=jnp.float32)       # (s^2*ci, k'y, k'x, co)
    co = out.shape[-1]
    out = out.reshape(s, s, ci, out.shape[1], out.shape[2], co)
    # taps (ty, tx) live at block offset (my, mx) and phase (ry, rx)
    gw = out[ry[:, None], rx[None, :], :, (my - my0)[:, None],
             (mx - mx0)[None, :], :]
    return gw.astype(jnp.float32)


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _conv_s2dgw(x, w, stride, pad_y, pad_x, cdt, odt):
    """Strided conv whose backward uses the s2d grad-w regrouping."""
    dtype = cdt or x.dtype
    odtype = odt or jnp.float32
    return lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype),
        window_strides=(stride, stride),
        padding=(tuple(pad_y), tuple(pad_x)),
        dimension_numbers=_DIMSPEC,
    ).astype(odtype)


def _conv_s2dgw_fwd(x, w, stride, pad_y, pad_x, cdt, odt):
    return _conv_s2dgw(x, w, stride, pad_y, pad_x, cdt, odt), (x, w)


def _conv_s2dgw_bwd(stride, pad_y, pad_x, cdt, odt, res, ct):
    x, w = res
    s = stride
    k = w.shape[0]
    dtype = cdt or x.dtype
    # grad-x: the transposed conv of the cotangent (same lowering XLA's
    # autodiff emits; output padding restores the exact input extent)
    opy = x.shape[1] - ((ct.shape[1] - 1) * s + k - pad_y[0] - pad_y[1])
    opx = x.shape[2] - ((ct.shape[2] - 1) * s + k - pad_x[0] - pad_x[1])
    gx = _tconv_dilated(ct, w.transpose(0, 1, 3, 2), s, pad_y, pad_x,
                        (opy, opx), dtype, jnp.result_type(x))
    gw = _gradw_s2d(x, ct, k, s, pad_y[0], pad_x[0], dtype)
    return gx, gw.astype(jnp.result_type(w))


_conv_s2dgw.defvjp(_conv_s2dgw_fwd, _conv_s2dgw_bwd)


def _tconv_dilated(x, w, stride, pad_y, pad_x, out_pad, dtype, odt):
    """lhs-dilated lowering of the transposed conv (XLA-native form)."""
    kh, kw = w.shape[0], w.shape[1]
    # flip spatial dims: conv-transpose is correlation with the flipped kernel
    w_flip = w[::-1, ::-1, :, :]
    return lax.conv_general_dilated(
        x.astype(dtype), w_flip.astype(dtype),
        window_strides=(1, 1),
        padding=((kh - 1 - pad_y[0], kh - 1 - pad_y[1] + out_pad[0]),
                 (kw - 1 - pad_x[0], kw - 1 - pad_x[1] + out_pad[1])),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMSPEC,
    ).astype(odt)


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _tconv(x, w, stride, pad_y, pad_x, out_pad, cdt, odt):
    """Transposed-conv core with hand-written exact-transpose gradients.

    Backward: since the transposed conv IS the transpose of a strided conv,
    grad-x is a plain strided conv of the cotangent and grad-w a strided
    correlation — both MXU-friendly, unlike the doubly-dilated convs XLA's
    autodiff of lhs_dilation yields (measured 1.2-1.9x per tconv layer on
    the default AE arch at batch 1024).
    """
    dtype = cdt or x.dtype
    odtype = odt or jnp.float32
    return _tconv_dilated(x, w, stride, pad_y, pad_x, out_pad, dtype, odtype)


def _tconv_fwd(x, w, stride, pad_y, pad_x, out_pad, cdt, odt):
    return _tconv(x, w, stride, pad_y, pad_x, out_pad, cdt, odt), (x, w)


def _tconv_bwd(stride, pad_y, pad_x, out_pad, cdt, odt, res, ct):
    x, w = res
    s = stride
    dtype = cdt or x.dtype
    pads = ((pad_y[0], pad_y[1] - out_pad[0]),
            (pad_x[0], pad_x[1] - out_pad[1]))
    # out[o] = sum_t x[(o+p0-t)/s] w[t]  =>  gx[i] = sum_t ct[i*s - p0 + t] w[t]:
    # an UNflipped stride-s conv of the cotangent with w (channels swapped)
    gx = lax.conv_general_dilated(
        ct.astype(dtype), w.transpose(0, 1, 3, 2).astype(dtype),
        window_strides=(s, s), padding=pads,
        dimension_numbers=_DIMSPEC)
    # gw[t] = sum_{b,i} x[b,i] ct[b, i*s + t - p0]: slide the (rhs-dilated by
    # s) input over the cotangent; batch is the contraction (feature) dim
    gw = lax.conv_general_dilated(
        ct.transpose(3, 1, 2, 0).astype(dtype),    # (Cout, Oy, Ox, B)
        x.transpose(1, 2, 0, 3).astype(dtype),     # (Hy, Hx, B, Cin)
        window_strides=(1, 1), padding=pads, rhs_dilation=(s, s),
        dimension_numbers=_DIMSPEC)                # (Cout, kh, kw, Cin)
    return gx.astype(jnp.result_type(x)), gw.transpose(1, 2, 3, 0).astype(jnp.result_type(w))


_tconv.defvjp(_tconv_fwd, _tconv_bwd)


def conv_transpose2d(x, w, b, stride, pad_y, pad_x, out_pad=(0, 0),
                     compute_dtype=None, out_dtype=None, block=None):
    """Transposed conv matching torch ConvTranspose2d semantics.

    Implemented as an input-dilated convolution: dilate by ``stride``, pad
    each spatial dim with ``(k-1-p_before, k-1-p_after+output_padding)`` and
    correlate with the spatially-flipped kernel. Output size is
    ``(in-1)*s + k - p_before - p_after + out_pad`` per dim, which equals
    torch's ``(in-1)*s - 2p + k + op`` for symmetric pads and equals the
    reference's conv-then-crop for asymmetric pads (aes.py:407-418, 465-470).

    With ``block=F`` the forward runs as the subpixel phase decomposition
    (see :func:`_subpixel_fwd`) — identical math, MXU-efficient for tiny
    ``Cout`` — with autodiff gradients (which stay efficient through the
    non-dilated subpixel form). With ``block=None`` the forward is the
    lhs-dilated conv with hand-written exact-transpose gradients
    (see ``_tconv``).

    Parameters
    ----------
    x : (N, H, W, Cin)
    w : (kh, kw, Cin, Cout) — stored in forward orientation for this layer
    b : (Cout,) or None
    stride : int
    pad_y, pad_x : (before, after) "input padding" in the torch sense
    out_pad : (opy, opx) torch output_padding
    block : optional subpixel block factor (multiple of stride)
    """
    if block is not None:
        out = _subpixel_fwd(x, w, int(stride), tuple(pad_y), tuple(pad_x),
                            tuple(out_pad), int(block),
                            compute_dtype or x.dtype,
                            out_dtype or jnp.float32)
    else:
        out = _tconv(x, w, int(stride), tuple(pad_y), tuple(pad_x),
                     tuple(out_pad), compute_dtype, out_dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def depth_to_space(x, block):
    """(N, H, W, block*block*C) -> (N, H*block, W*block, C).

    Channel index is ordered (ry, rx, c): channel (ry*block + rx)*C + c maps
    to output pixel (h*block + ry, w*block + rx, c).
    """
    n, h, w, c = x.shape
    co = c // (block * block)
    x = x.reshape(n, h, w, block, block, co)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * block, w * block, co)


def _subpixel_dim(k, s, p0, block):
    """Per-dimension tap regrouping for the subpixel transposed conv.

    Output position o = y*block + r pulls input i = y*(block//s) + j with
    tap t = r + p0 - s*j; returns (P, jmin, t, valid) where t/valid are
    (P, block) arrays of the tap index and its in-range mask.
    """
    jmin = -((k - 1 - p0) // s)
    jmax = (block - 1 + p0) // s
    P = jmax - jmin + 1
    j = np.arange(P) + jmin
    r = np.arange(block)
    t = r[None, :] + p0 - s * j[:, None]
    valid = (t >= 0) & (t < k)
    return P, jmin, jmax, np.clip(t, 0, k - 1), valid


def _subpixel_fwd(x, w, stride, pad_y, pad_x, out_pad, block, dtype, odt):
    """Subpixel (phase-decomposed) forward of the transposed conv.

    Mathematically identical to the lhs-dilated form (same params, same
    output), but instead of dilating the input with zeros it computes the
    output directly in a block-of-``block``x``block``-pixels-as-channels
    layout and rearranges — ``block**2 * Cout`` effective output channels
    fill the MXU's 128 lanes that a tiny ``Cout`` leaves idle (the
    lhs-dilated lowering of the 1-channel final decoder layer measures ~2%
    MXU). Measured on that layer at batch 1024: ``block=8`` (64 channels)
    is the sweet spot — 3.1x forward vs dilated; ``block=16`` (128
    channels, full lanes) loses badly because the kernel grows as
    ``(block+k-1)/stride`` and the autodiff grad-x becomes a
    ``block/stride``-dilated conv. ``block`` must be a multiple of
    ``stride``.
    """
    kh, kw = w.shape[0], w.shape[1]
    ci, co = w.shape[2], w.shape[3]
    n, h, w_in, _ = x.shape
    s = stride
    F = int(block)
    assert F % s == 0, 'block must be a multiple of stride'
    fs = F // s
    oh = (h - 1) * s + kh - pad_y[0] - pad_y[1] + out_pad[0]
    ow = (w_in - 1) * s + kw - pad_x[0] - pad_x[1] + out_pad[1]
    yb, xb = -(-oh // F), -(-ow // F)

    Py, jmin_y, jmax_y, ty, vy = _subpixel_dim(kh, s, pad_y[0], F)
    Px, jmin_x, jmax_x, tx, vx = _subpixel_dim(kw, s, pad_x[0], F)
    # regrouped kernel: (Py, Px, ci, F*F*co), channels ordered (ry, rx, co)
    w2 = w[ty[:, None, :, None], tx[None, :, None, :], :, :]  # (Py,Px,F,F,ci,co)
    mask = (vy[:, None, :, None] & vx[None, :, None, :])[..., None, None]
    w2 = jnp.where(mask, w2, 0)
    w2 = w2.transpose(0, 1, 4, 2, 3, 5).reshape(Py, Px, ci, F * F * co)

    out = lax.conv_general_dilated(
        x.astype(dtype), w2.astype(dtype),
        window_strides=(fs, fs),
        padding=((-jmin_y, (yb - 1) * fs + jmax_y - (h - 1)),
                 (-jmin_x, (xb - 1) * fs + jmax_x - (w_in - 1))),
        dimension_numbers=_DIMSPEC,
    ).astype(odt)
    return depth_to_space(out, F)[:, :oh, :ow, :]


def conv_transpose2d_subpixel(x, w, b, stride, pad_y, pad_x, out_pad=(0, 0),
                              block=2, compute_dtype=None, out_dtype=None):
    """Transposed conv computed as a strided conv + depth-to-space.

    Same semantics as :func:`conv_transpose2d`; see :func:`_subpixel_fwd`
    for when this layout wins.
    """
    return conv_transpose2d(x, w, b, stride, pad_y, pad_x, out_pad=out_pad,
                            compute_dtype=compute_dtype, out_dtype=out_dtype,
                            block=int(block))


def max_pool2d_with_indices(x, ceil_mode=True):
    """2x2/stride-2 max pool returning values and torch-style flat indices.

    The reference only ever uses kernel=2, stride=2 pooling
    (ae_model_architecture_generator.py:97-98); ceil_mode=True corresponds
    to 'same' padding archs (aes.py:173-178).

    Returns
    -------
    (pooled, indices): pooled is (N, Ho, Wo, C) float; indices is
    (N, Ho, Wo, C) int32 of flat positions into the *input* H*W plane
    (torch MaxPool2d return_indices convention), used by
    :func:`max_unpool2d`.
    """
    n, h, w, c = x.shape
    ho = -(-(h - 2) // 2) + 1 if ceil_mode else (h - 2) // 2 + 1
    wo = -(-(w - 2) // 2) + 1 if ceil_mode else (w - 2) // 2 + 1
    hp, wp = ho * 2, wo * 2
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    # ceil mode pads with -inf to an even extent; floor mode crops the remainder
    xp = x[:, :min(h, hp), :min(w, wp), :]
    if hp > h or wp > w:
        xp = jnp.pad(xp, ((0, 0), (0, max(0, hp - h)), (0, max(0, wp - w)), (0, 0)),
                     constant_values=neg)
    # window layout: (N, Ho, 2, Wo, 2, C) -> (N, Ho, Wo, C, 4)
    xw = xp.reshape(n, ho, 2, wo, 2, c).transpose(0, 1, 3, 5, 2, 4).reshape(n, ho, wo, c, 4)
    amax = jnp.argmax(xw, axis=-1).astype(jnp.int32)  # in [0,4): (dy*2+dx)
    pooled = jnp.max(xw, axis=-1)
    dy, dx = amax // 2, amax % 2
    row = jax.lax.broadcasted_iota(jnp.int32, (n, ho, wo, c), 1) * 2 + dy
    col = jax.lax.broadcasted_iota(jnp.int32, (n, ho, wo, c), 2) * 2 + dx
    indices = row * w + col
    return pooled, indices


def max_unpool2d(x, indices, out_hw):
    """Scatter pooled values back to ``out_hw`` using flat indices.

    Matches torch MaxUnpool2d with the indices produced by
    :func:`max_pool2d_with_indices` (reference aes.py:281-294, 460-464).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    vals = x.reshape(n, h * w, c)
    idx = indices.reshape(n, h * w, c)
    out = jnp.zeros((n, oh * ow, c), dtype=x.dtype)
    n_idx = jax.lax.broadcasted_iota(jnp.int32, (n, h * w, c), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (n, h * w, c), 2)
    out = out.at[n_idx, idx, c_idx].set(vals, mode='drop')
    return out.reshape(n, oh, ow, c)


def batch_norm(x, gamma, beta, eps=1e-5, mean=None, var=None):
    """Batch normalization over (N, H, W) per channel.

    With ``mean``/``var`` omitted, batch statistics are used — torch
    BatchNorm2d train-mode behavior, and eval-mode behavior when
    ``track_running_stats=False`` (reference aes.py:92-95 exposes both the
    momentum and the tracking flag via hparams). Passing running statistics
    reproduces torch eval mode with tracking on.
    """
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)  # stats in f32 even on a bf16 activation chain
    if mean is None:
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
    else:
        mean = mean.astype(jnp.float32)
        var = var.astype(jnp.float32)
    return (gamma * (xf - mean) * jax.lax.rsqrt(var + eps) + beta).astype(x.dtype)


def batch_norm_update(x, stats, momentum=0.1):
    """New running statistics after observing batch ``x`` (torch semantics).

    Matches ``nn.BatchNorm2d(track_running_stats=True)`` (reference
    aes.py:92-95, 332-336): exponential moving average of the batch mean and
    the *unbiased* batch variance; ``momentum=None`` switches to torch's
    cumulative moving average via ``num_batches``. Returns a dict of new
    ``running_mean`` / ``running_var`` / ``num_batches`` leaves (f32,
    gradient-stopped) for the trainer to merge into the params pytree.
    """
    axes = tuple(range(x.ndim - 1))
    xf = jax.lax.stop_gradient(x).astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.var(xf, axis=axes)
    n = int(np.prod([x.shape[a] for a in axes]))
    var_unbiased = var * (n / max(n - 1, 1))
    count = stats['num_batches'] + 1.0
    m = (1.0 / count) if momentum is None else momentum
    return {
        'running_mean': (1.0 - m) * stats['running_mean'] + m * mean,
        'running_var': (1.0 - m) * stats['running_var'] + m * var_unbiased,
        'num_batches': count,
    }


def leaky_relu(x, negative_slope=0.05):
    """LeakyReLU with the reference's slope of 0.05 (aes.py:114)."""
    return jnp.where(x >= 0, x, negative_slope * x)


def linear(x, w, b=None):
    """Dense layer: x @ w + b with f32 accumulation.

    x: (..., din); w: (din, dout); b: (dout,)
    """
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out
