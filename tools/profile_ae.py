"""Per-layer roofline profile of the default conv-AE on the real TPU.

Times each encoder conv / decoder transposed conv of the published default
architecture individually (forward, and forward+backward), compares against
the MXU compute roofline and the HBM bandwidth roofline, and reports where
the train step's time goes. Used to decide round-2 throughput work
(space-to-depth first conv, channel padding, transposed-conv rewrites).

Methodology (axon tunnel: per-call overhead is tens of ms, and
block_until_ready does not sync):
- each measurement is ONE jitted program that runs the op K times inside a
  lax.scan, with the chain fed additively into the *input* (x + s) so XLA
  cannot hoist the conv via linearity in w;
- per-iteration time = (t(3K) - t(K)) / (2K), which cancels constant
  dispatch/tunnel overhead and anything loop-invariant.

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
K = 20


@partial(jax.jit, static_argnums=(0, 3))
def chain_fwd(op, x, w, k):
    def body(s, _):
        out = op(x + s, w)
        return jnp.mean(out).astype(jnp.float32) * 1e-20, None
    s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
    return s


@partial(jax.jit, static_argnums=(0, 3))
def chain_bwd(op, x, w, k):
    def loss(w_, s):
        return jnp.mean(op(x + s, w_).astype(jnp.float32))
    def body(s, _):
        g = jax.grad(loss)(w, s)
        return jnp.mean(g).astype(jnp.float32) * 1e-20, None
    s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
    return s


def timed(fn, *args):
    """Median-of-3 wall time of one call (host fetch = sync)."""
    out = fn(*args)
    _ = float(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def per_iter(chain, op, x, w):
    t1 = timed(chain, op, x, w, K)
    t3 = timed(chain, op, x, w, 3 * K)
    return max((t3 - t1) / (2 * K), 1e-9)


def report(name, per, macs, bytes_moved):
    fl = 2 * macs / per
    bw = bytes_moved / per
    print('%-28s %8.3f ms  %7.1f TF/s (%4.1f%% MXU)  %6.0f GB/s (%4.1f%% HBM)'
          % (name, per * 1e3, fl / 1e12, 100 * fl / PEAK_FLOPS,
             bw / 1e9, 100 * bw / PEAK_BW))


def main():
    from behavenet_tpu.ops import conv as ops

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    total_f = total_b = 0.0

    # (name, H, W, Cin, Cout, k, s) for the default arch on 128x128x1
    enc = [('enc1 1->32 128^2 s2', 128, 128, 1, 32, 5, 2),
           ('enc2 32->64 64^2 s2', 64, 64, 32, 64, 5, 2),
           ('enc3 64->128 32^2 s2', 32, 32, 64, 128, 5, 2),
           ('enc4 128->256 16^2 s2', 16, 16, 128, 256, 5, 2),
           ('enc5 256->512 8^2 s5', 8, 8, 256, 512, 5, 5)]
    dec = [('dec1 512->256 2^2 s5', 2, 2, 512, 256, 5, 5),
           ('dec2 256->128 8^2 s2', 8, 8, 256, 128, 5, 2),
           ('dec3 128->64 16^2 s2', 16, 16, 128, 64, 5, 2),
           ('dec4 64->32 32^2 s2', 32, 32, 64, 32, 5, 2),
           ('dec5 32->1 64^2 s2', 64, 64, 32, 1, 5, 2)]

    print('batch=%d, compute dtype=%s, K=%d (delta-K timing)' % (BATCH, dt.__name__, K))
    print('== encoder convs ==')
    for name, h, w_, ci, co, k, s in enc:
        x = jnp.asarray(rng.randn(BATCH, h, w_, ci), dt)
        wt = jnp.asarray(rng.randn(k, k, ci, co) * 0.05, dt)
        oh, ow = -(-h // s), -(-w_ // s)
        op = lambda x_, w__: ops.conv2d(x_, w__, None, s, (2, 2), (2, 2),
                                        compute_dtype=dt, out_dtype=dt)
        macs = BATCH * oh * ow * co * k * k * ci
        byts = 2 * BATCH * (h * w_ * ci + oh * ow * co)
        pf = per_iter(chain_fwd, op, x, wt)
        total_f += pf
        report(name, pf, macs, byts)
        pb = per_iter(chain_bwd, op, x, wt)
        total_b += pb
        report(' bwd(w)+fwd', pb, 3 * macs, 3 * byts)

    print('== decoder transposed convs ==')
    for name, h, w_, ci, co, k, s in dec:
        x = jnp.asarray(rng.randn(BATCH, h, w_, ci), dt)
        wt = jnp.asarray(rng.randn(k, k, ci, co) * 0.05, dt)
        oh, ow = h * s, w_ * s
        op = lambda x_, w__: ops.conv_transpose2d(
            x_, w__, None, s, (1, 2), (1, 2), compute_dtype=dt, out_dtype=dt)
        # efficient MAC count: on average k^2/s^2 taps per output pixel
        macs = BATCH * oh * ow * co * (k * k) // (s * s) * ci
        byts = 2 * BATCH * (h * w_ * ci + oh * ow * co)
        pf = per_iter(chain_fwd, op, x, wt)
        total_f += pf
        report(name, pf, macs, byts)
        pb = per_iter(chain_bwd, op, x, wt)
        total_b += pb
        report(' bwd(w)+fwd', pb, 3 * macs, 3 * byts)

    print('---')
    print('sum fwd-only: %.2f ms; sum fwd+bwd: %.2f ms'
          % (total_f * 1e3, total_b * 1e3))
    print('(full train step at this batch from bench.py for comparison)')


if __name__ == '__main__':
    main()
