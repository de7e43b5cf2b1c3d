"""Throughput experiment: space-to-depth first conv + channel padding.

VERDICT r1 item 9: the default-arch conv AE plateaus at ~46% MXU; the
suspected cost is the small-channel early conv layers. This measures three
variants at identical per-frame work:

- baseline: published arch on (128, 128, 1) — first conv 1->32, k5 s2
- s2d:      space-to-depth(2) input (64, 64, 4) — first conv 4->32, k3 s1
            (same receptive field / output shape family; exact weight
            equivalence is possible but irrelevant for a throughput probe)
- s2d4:     space-to-depth(4) input (32, 32, 16) — first TWO convs folded
            into one 16->64 k3 s1 layer

Run on the real TPU: `python tools/bench_s2d.py`. Prints frames/s per
variant to stderr and a one-line verdict to stdout.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))


def space_to_depth(x, b):
    """(N, H, W, C) -> (N, H/b, W/b, C*b*b) block rearrange (host side)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // b, b, w // b, b, c)
    x = np.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // b, w // b, b * b * c)


def build(variant):
    import jax.numpy as jnp
    from behavenet_tpu.models import AE
    from behavenet_tpu.models.arch import get_handcrafted_dims

    if variant == 'baseline':
        img = (1, 128, 128)
        enc = {'ch': [32, 64, 128, 256, 512], 'k': [5] * 5, 's': [2, 2, 2, 2, 5]}
    elif variant == 's2d':
        img = (4, 64, 64)
        enc = {'ch': [32, 64, 128, 256, 512], 'k': [3, 5, 5, 5, 5], 's': [1, 2, 2, 2, 5]}
    elif variant == 's2d4':
        img = (16, 32, 32)
        enc = {'ch': [64, 128, 256, 512], 'k': [3, 5, 5, 5], 's': [1, 2, 2, 5]}
    else:
        raise ValueError(variant)

    arch = {
        'ae_network_type': 'strides_only', 'ae_padding_type': 'same',
        'ae_batch_norm': 0, 'symmetric_arch': 1,
        'ae_encoding_n_channels': enc['ch'],
        'ae_encoding_kernel_size': enc['k'],
        'ae_encoding_stride_size': enc['s'],
        'ae_encoding_layer_type': ['conv'] * len(enc['ch']),
        'ae_decoding_last_FF_layer': 0,
        'ae_input_dim': list(img), 'n_ae_latents': 12,
    }
    arch = get_handcrafted_dims(arch, symmetric=True)
    hp = dict(
        arch, model_class='ae', model_type='conv', n_ae_latents=12,
        n_input_channels=img[0], y_pixels=img[1], x_pixels=img[2],
        learning_rate=1e-4, l2_reg=0.0, rng_seed_model=0,
        compute_dtype=jnp.bfloat16, bf16_pipeline=True)
    return AE(hp), hp, img


def measure(variant, batch=1024, n_steps=50, n_repeats=3):
    import jax
    import jax.numpy as jnp
    from behavenet_tpu.fitting.training import make_train_functions

    model, hp, img = build(variant)
    tx, train_step, _ = make_train_functions(model, hp)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)

    x = np.random.RandomState(0).randint(0, 255, size=(batch, 128, 128, 1)).astype('uint8')
    if variant != 'baseline':
        b = 2 if variant == 's2d' else 4
        x = space_to_depth(x, b)
    xb = {'images': jnp.asarray(x)}

    t0 = time.perf_counter()
    params, opt_state, m = train_step(params, opt_state, rng, xb, {}, 0, None)
    _ = float(m['loss'])
    print('%s: compile %.0fs' % (variant, time.perf_counter() - t0), file=sys.stderr)

    best = 0.0
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            params, opt_state, m = train_step(params, opt_state, rng, xb, {}, 0, None)
        _ = float(m['loss'])
        dt = time.perf_counter() - t0
        best = max(best, n_steps * batch / dt)
        print('%s: %.0f frames/s (%.2f ms/step)'
              % (variant, n_steps * batch / dt, dt / n_steps * 1e3), file=sys.stderr)
    return best


def main():
    results = {}
    for variant in ('baseline', 's2d', 's2d4'):
        try:
            results[variant] = measure(variant)
        except Exception as e:
            print('%s failed: %s' % (variant, e), file=sys.stderr)
    base = results.get('baseline', float('nan'))
    for v, fps in results.items():
        print('%s: %.0f frames/s (%.2fx baseline)' % (v, fps, fps / base))


if __name__ == '__main__':
    main()
