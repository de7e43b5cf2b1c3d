"""Per-layer roofline profile of the default conv-AE on the real TPU.

Times each encoder conv / decoder transposed conv of the published default
architecture individually (forward, and forward+backward), compares against
the MXU compute roofline and the HBM bandwidth roofline, and reports where
the train step's time goes. This produced the round-2 numbers in
docs/tpu_design.md (mid layers 74-93% MXU; dec5/enc1 small-channel
pathologies).

Methodology (axon tunnel: ~27 ms constant per-call overhead, and
block_until_ready does not sync):
- each measurement is ONE jitted program running the op K times inside a
  lax.scan, consuming a per-iteration *rolled* weight tensor so nothing is
  loop-invariant. Do NOT chain via `x + s` with a linear loss: XLA
  distributes convs over `add(x, broadcast(s))` / exploits linearity in w
  and hoists the whole conv out of the loop (measured >300% "MXU").
- the backward chain uses a squared loss and sums BOTH grads into the
  carry, so fwd + grad-x + grad-w all execute (a discarded grad is DCE'd).
- per-iteration time = (t(3K) - t(K)) / (2K), cancelling dispatch/tunnel
  overhead. Sanity anchor: a 4096^3 bf16 matmul measures ~184 TF/s (93%
  of v5e peak) under this scheme.

Usage: python tools/profile_ae.py [batch]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# v5e bf16 peak ~197 TFLOP/s, HBM ~819 GB/s
PEAK_FLOPS = 197e12
PEAK_BW = 819e9

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
K = 15


def timed(chain, x, w, k):
    _ = float(chain(x, w, k))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chain(x, w, k))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def per_iter(op, x, w, grad=False, wrt_x=True):
    """Per-iteration seconds for op(x, w_i) (optionally + its grads)."""
    argnums = (0, 1) if wrt_x else (1,)

    def loss(x_, w_):
        o = op(x_, w_).astype(jnp.float32)
        return jnp.mean(o * o)

    @partial(jax.jit, static_argnums=(2,))
    def chain(x_, w_, k):
        def f(s, i):
            wi = jnp.roll(w_, i, axis=0 if w_.shape[2] == 1 else 2)
            if grad:
                g = jax.grad(loss, argnums=argnums)(x_, wi)
                return s + sum(jnp.mean(gi).astype(jnp.float32) for gi in g), None
            return s + jnp.mean(op(x_, wi)).astype(jnp.float32), None
        return jax.lax.scan(f, jnp.float32(0.0), jnp.arange(k))[0]

    t1 = timed(chain, x, w, K)
    t3 = timed(chain, x, w, 3 * K)
    return max((t3 - t1) / (2 * K), 1e-9)


def report(name, per, macs, bytes_moved):
    fl = 2 * macs / per
    bw = bytes_moved / per
    print('%-26s %8.3f ms  %7.1f TF/s (%5.1f%% MXU)  %6.0f GB/s (%5.1f%% HBM)'
          % (name, per * 1e3, fl / 1e12, 100 * fl / PEAK_FLOPS,
             bw / 1e9, 100 * bw / PEAK_BW))


def main():
    from behavenet_tpu.ops import conv as ops

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    pads = ((1, 2), (1, 2))  # the default arch's 'same' pads for k=5
    totf = totb = 0.0

    # (name, H, W, Cin, Cout, k, s, transposed, needs grad-x)
    layers = [
        ('enc1 1->32 128^2 s2', 128, 128, 1, 32, 5, 2, False, False),
        ('enc2 32->64 64^2 s2', 64, 64, 32, 64, 5, 2, False, True),
        ('enc3 64->128 32^2 s2', 32, 32, 64, 128, 5, 2, False, True),
        ('enc4 128->256 16^2 s2', 16, 16, 128, 256, 5, 2, False, True),
        ('enc5 256->512 8^2 s5', 8, 8, 256, 512, 5, 5, False, True),
        ('dec1 512->256 2^2 s5', 2, 2, 512, 256, 5, 5, True, True),
        ('dec2 256->128 8^2 s2', 8, 8, 256, 128, 5, 2, True, True),
        ('dec3 128->64 16^2 s2', 16, 16, 128, 64, 5, 2, True, True),
        ('dec4 64->32 32^2 s2', 32, 32, 64, 32, 5, 2, True, True),
        ('dec5 32->1 64^2 s2', 64, 64, 32, 1, 5, 2, True, True),
        ('dec5 subpix8', 64, 64, 32, 1, 5, 2, 8, True),
    ]
    print('batch=%d, %s, K=%d (delta-K timing, rolled weights)'
          % (BATCH, dt.__name__, K))
    for name, h, w_, ci, co, k, s, tr, wrt_x in layers:
        x = jnp.asarray(rng.randn(BATCH, h, w_, ci).astype(np.float32), dt)
        wt = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.05, dt)
        if tr:
            block = tr if tr is not True else None
            op = lambda a, b, blk=block: ops.conv_transpose2d(
                a, b, None, s, pads[0], pads[1], block=blk,
                compute_dtype=dt, out_dtype=dt)
            oh = (h - 1) * s + k - pads[0][0] - pads[0][1]
            ow = (w_ - 1) * s + k - pads[1][0] - pads[1][1]
            macs1 = BATCH * oh * ow * co * (k * k) // (s * s) * ci
        else:
            op = lambda a, b: ops.conv2d(a, b, None, s, pads[0], pads[1],
                                         compute_dtype=dt, out_dtype=dt)
            oh, ow = -(-h // s), -(-w_ // s)
            macs1 = BATCH * oh * ow * co * k * k * ci
        byts = 2 * BATCH * (h * w_ * ci + oh * ow * co)
        pf = per_iter(op, x, wt)
        totf += pf
        report(name + ' fwd', pf, macs1, byts)
        mult = 3 if wrt_x else 2
        pb = per_iter(op, x, wt, grad=True, wrt_x=wrt_x)
        totb += pb
        report('  +grads', pb, mult * macs1, mult * byts)

    print('---')
    print('sum fwd: %.2f ms; sum fwd+grads: %.2f ms'
          % (totf * 1e3, totb * 1e3))
    print('(bench.py train step at this batch for comparison; the dec5 '
          'subpix8 row duplicates dec5 and is excluded from nothing — '
          'subtract whichever variant is not in use)')


if __name__ == '__main__':
    main()
