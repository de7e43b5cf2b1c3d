"""Microbench: computing the reconstruction loss in subpixel block layout.

The final decoder layer runs subpixel (block=8): its raw output is
(B, 16, 16, 64) and a depth-to-space rearrange produces the (B, 128, 128, 1)
image. Training then sigmoids + MSEs against the target image — so the
backward pass must relayout the 1-lane (B, 128, 128, 1) cotangent back into
block layout before the conv grads. A 1-lane tensor relayout is VPU-bound
misery on TPU (every lane-broadcast/gather touches 1/128 of a register).

But depth_to_space is a permutation, and sigmoid/MSE/frame-masks are
elementwise or per-frame: MSE(d2s(y), img) == MSE(y, s2d(img, 8)). Computing
the loss directly in block layout moves the relayout onto the *uint8 target*
(forward-only, no gradient) and the cotangent never leaves block layout.

This script measures, at the dec5 geometry (x (B,64,64,32) -> 128^2 image):
  A  shipped path: subpixel conv + d2s -> sigmoid -> MSE vs u8/255 target
  B  block-layout loss: subpixel conv (no d2s) -> sigmoid -> MSE vs
     s2d(u8 target)/255
  C  dilated tconv + hand VJP (block=None) + same loss, for reference
each fwd+grad-x+grad-w, delta-K timed with rolled weights/targets
(see tools/profile_ae.py for why single-call timings lie here).

Usage: python tools/bench_dec5_loss.py [batch]
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import tools.profile_ae as prof
from behavenet_tpu.ops import conv as ops
from behavenet_tpu.ops.conv import _subpixel_dim, _DIMSPEC

if __name__ == '__main__':
    BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 189
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    k, s, F = 5, 2, 8
    py = px = (1, 2)
    x = jnp.asarray(rng.randn(BATCH, 64, 64, 32).astype(np.float32), dt)
    w = jnp.asarray(rng.randn(k, k, 32, 1).astype(np.float32), dt)
    tgt = jnp.asarray(rng.randint(0, 256, (BATCH, 128, 128, 1)), jnp.uint8)

    Py, jmin_y, jmax_y, ty, vy = _subpixel_dim(k, s, py[0], F)
    Px, jmin_x, jmax_x, tx, vx = _subpixel_dim(k, s, px[0], F)
    fs = F // s

    def regroup(w_):
        w2 = w_[ty[:, None, :, None], tx[None, :, None, :], :, :]
        mask = (vy[:, None, :, None] & vx[None, :, None, :])[..., None, None]
        w2 = jnp.where(mask, w2, 0)
        return w2.transpose(0, 1, 4, 2, 3, 5).reshape(Py, Px, 32, F * F * 1)

    def block_conv(x_, w_):
        """Raw subpixel forward: (B, 16, 16, 64), no depth-to-space."""
        return lax.conv_general_dilated(
            x_.astype(dt), regroup(w_).astype(dt),
            window_strides=(fs, fs),
            padding=((-jmin_y, 15 * fs + jmax_y - 63),
                     (-jmin_x, 15 * fs + jmax_x - 63)),
            dimension_numbers=_DIMSPEC).astype(dt)

    def loss_A(x_, w_, t_):
        out = ops.conv_transpose2d(x_, w_, None, s, py, px, block=F,
                                   compute_dtype=dt, out_dtype=dt)
        p = jax.nn.sigmoid(out.astype(jnp.float32))
        return jnp.mean((p - t_.astype(jnp.float32) / 255.0) ** 2)

    def loss_B(x_, w_, t_):
        out = block_conv(x_, w_)
        p = jax.nn.sigmoid(out.astype(jnp.float32))
        tb = ops.space_to_depth(t_, F).astype(jnp.float32) / 255.0
        return jnp.mean((p - tb) ** 2)

    def loss_C(x_, w_, t_):
        out = ops.conv_transpose2d(x_, w_, None, s, py, px, block=None,
                                   compute_dtype=dt, out_dtype=dt)
        p = jax.nn.sigmoid(out.astype(jnp.float32))
        return jnp.mean((p - t_.astype(jnp.float32) / 255.0) ** 2)

    # sanity: identical losses and grads across layouts
    la = loss_A(x, w, tgt)
    lb = loss_B(x, w, tgt)
    lc = loss_C(x, w, tgt)
    ga = jax.grad(loss_A, argnums=(0, 1))(x, w, tgt)
    gb = jax.grad(loss_B, argnums=(0, 1))(x, w, tgt)
    print('loss A=%.6f B=%.6f C=%.6f  |gxA-gxB|=%.2e |gwA-gwB|=%.2e'
          % (float(la), float(lb), float(lc),
             float(jnp.abs(ga[0].astype(jnp.float32)
                           - gb[0].astype(jnp.float32)).max()),
             float(jnp.abs(ga[1].astype(jnp.float32)
                           - gb[1].astype(jnp.float32)).max())))

    def chain_of(loss):
        @partial(jax.jit, static_argnums=(1,))
        def chain(xx, kk):
            def f(c, i):
                wi = jnp.roll(w, i, axis=2)
                ti = jnp.roll(tgt, i, axis=0)
                g = jax.grad(loss, argnums=(0, 1))(xx, wi, ti)
                return c + sum(jnp.mean(gi).astype(jnp.float32) for gi in g), None
            return lax.scan(f, jnp.float32(0.0), jnp.arange(kk))[0]
        return lambda x_, w_, kk: chain(x_, kk)

    K = 15
    for name, loss in (('A d2s+image-layout loss', loss_A),
                       ('B block-layout loss', loss_B),
                       ('C dilated tconv ref', loss_C)):
        ch = chain_of(loss)
        t1 = prof.timed(ch, x, w, K)
        t3 = prof.timed(ch, x, w, 3 * K)
        per = max((t3 - t1) / (2 * K), 1e-9)
        print('%-26s %8.3f ms' % (name, per * 1e3))
