"""Compare the decoder tconv lowering: hand-VJP lhs-dilated vs subpixel block=s.

With block == stride, the subpixel (phase-decomposed) transposed conv runs
as a *stride-1* conv with F*F*Cout effective output channels — 4x the lanes
of the dilated form, and its autodiff grads are clean (non-dilated) convs.
Candidate win for the small-Cout mid-decoder layers (dec3/dec4) flagged by
tools/profile_ae.py.

Usage: python tools/bench_subpixel_dec.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import importlib
prof = importlib.import_module('tools.profile_ae') if __name__ != '__main__' else None

if __name__ == '__main__':
    sys.argv = [sys.argv[0]] + sys.argv[1:]
    BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 189
    sys.argv = [sys.argv[0], str(BATCH)]
    import tools.profile_ae as prof

    from behavenet_tpu.ops import conv as ops

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    pads = ((1, 2), (1, 2))
    layers = [
        ('dec2 256->128 8^2 s2', 8, 8, 256, 128, 5, 2),
        ('dec3 128->64 16^2 s2', 16, 16, 128, 64, 5, 2),
        ('dec4 64->32 32^2 s2', 32, 32, 64, 32, 5, 2),
    ]
    print('batch=%d' % BATCH)
    for name, h, w_, ci, co, k, s in layers:
        x = jnp.asarray(rng.randn(BATCH, h, w_, ci).astype(np.float32), dt)
        wt = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.05, dt)
        oh = (h - 1) * s + k - pads[0][0] - pads[0][1]
        ow = (w_ - 1) * s + k - pads[1][0] - pads[1][1]
        macs1 = BATCH * oh * ow * co * (k * k) // (s * s) * ci
        byts = 2 * BATCH * (h * w_ * ci + oh * ow * co)
        for variant, blk in (('dilated+vjp', None), ('subpix F=s', s),
                             ('subpix F=2s', 2 * s)):
            op = lambda a, b, blk=blk: ops.conv_transpose2d(
                a, b, None, s, pads[0], pads[1], block=blk,
                compute_dtype=dt, out_dtype=dt)
            pf = prof.per_iter(op, x, wt)
            prof.report('%s %s fwd' % (name.split()[0], variant), pf, macs1, byts)
            pb = prof.per_iter(op, x, wt, grad=True, wrt_x=True)
            prof.report('  +grads', pb, 3 * macs1, 3 * byts)
