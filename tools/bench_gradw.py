"""Microbench: grad-w lowering for strided convs (batch-contraction form).

XLA's autodiff emits grad-w as an rhs-dilated conv contracting over batch
with Cin sublane rows — for small Cin (enc1: 1, enc2: 32) that wastes most
of the MXU's 8-sublane tiles. The space-to-depth regrouping moves the
stride-2 phase structure into channels: x -> s2d(x, 2) gives 4*Cin rows
and turns the 5-tap dilated window into a dense 3-tap window (1.44x the
FLOPs at 4x the sublane utilization). This script measures both, plus the
f32-accumulating variants, to decide whether a custom conv2d VJP is worth
wiring.

Usage: python tools/bench_gradw.py [batch] [case-substring]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == '__main__':
    BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 189
    ONLY = sys.argv[2] if len(sys.argv) > 2 else ''
    sys.argv = [sys.argv[0], str(BATCH)]
    import tools.profile_ae as prof

    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    DIMSPEC = ('NHWC', 'HWIO', 'NHWC')

    # (name, H, W, Cin, Cout): stride-2 k5 'same' conv, grad-w given cotangent
    cases = [
        ('enc1 1->32 128^2', 128, 128, 1, 32),
        ('enc1 2->32 128^2', 128, 128, 2, 32),  # 2-view Musall first conv
        ('enc2 32->64 64^2', 64, 64, 32, 64),
        ('enc3 64->128 32^2', 32, 32, 64, 128),
    ]
    k, s = 5, 2
    p0, p1 = 1, 2

    # the shipped regrouping: measuring anything else would be a different
    # lowering than the _conv_s2dgw VJP actually uses
    from behavenet_tpu.ops.conv import space_to_depth as s2d

    print('batch=%d' % BATCH)
    for name, h, w_, ci, co in cases:
        if ONLY and ONLY not in name:
            continue
        oh = ow = h // s
        x = jnp.asarray(rng.randn(BATCH, h, w_, ci).astype(np.float32), dt)
        ct = jnp.asarray(rng.randn(BATCH, oh, ow, co).astype(np.float32), dt)
        macs1 = BATCH * oh * ow * co * k * k * ci
        byts = 2 * BATCH * (h * w_ * ci + oh * ow * co)

        # XLA-autodiff form: rhs-dilated conv, batch as contraction
        def gw_dilated(xx, cc):
            return lax.conv_general_dilated(
                xx.transpose(3, 1, 2, 0), cc.transpose(1, 2, 0, 3),
                window_strides=(1, 1), padding=((p0, p1), (p0, p1)),
                rhs_dilation=(s, s), dimension_numbers=DIMSPEC,
                preferred_element_type=jnp.float32)

        # space-to-depth form: dense 3-tap window over 4*Cin channel rows
        def gw_s2d(xx, cc):
            x2 = s2d(xx, s)  # (B, oh, ow, 4ci)
            return lax.conv_general_dilated(
                x2.transpose(3, 1, 2, 0), cc.transpose(1, 2, 0, 3),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=DIMSPEC,
                preferred_element_type=jnp.float32)

        t_dil = prof.per_iter(lambda a, b: gw_dilated(a, b), x, ct)
        prof.report('%s gw dilated' % name.split()[0], t_dil, macs1, byts)
        t_s2d = prof.per_iter(lambda a, b: gw_s2d(a, b), x, ct)
        # 9/25 taps * 4 phases = 1.44x the MACs
        prof.report('%s gw s2d' % name.split()[0], t_s2d, macs1 * 36 // 25, byts)
