"""Benchmark: conv-AE training throughput (frames/sec/chip) on 128x128 frames.

Run on the real TPU chip; prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/30000}

Baseline target: >= 30,000 frames/sec/chip for the published default conv AE
architecture on 128x128 grayscale (BASELINE.md). The reference takes
">12 hours" per model on the example dataset on one GPU (examples/01_ae.ipynb).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from behavenet_tpu.fitting.training import make_train_functions
    from behavenet_tpu.models import AE
    from behavenet_tpu.models.arch import load_handcrafted_arch

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 189  # reference trial length
    n_latents = 12
    img = (1, 128, 128)

    arch = load_handcrafted_arch(list(img), n_latents, None, check_memory=False)
    hparams = dict(
        arch, model_class='ae', model_type='conv', n_ae_latents=n_latents,
        n_input_channels=img[0], y_pixels=img[1], x_pixels=img[2],
        learning_rate=1e-4, l2_reg=0.0, rng_seed_model=0,
        compute_dtype=jnp.bfloat16)
    model = AE(hparams)

    tx, train_step, eval_step = make_train_functions(model, hparams)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)

    rng = jax.random.PRNGKey(1)
    x = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, size=(batch,) + img[1:] + (img[0],)),
        dtype=jnp.uint8)
    batch_dict = {'images': x}

    # warmup / compile
    for _ in range(3):
        params, opt_state, metrics = train_step(
            params, opt_state, rng, batch_dict, {}, 0, None)
    jax.block_until_ready(metrics['loss'])

    # timed steps
    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, metrics = train_step(
            params, opt_state, rng, batch_dict, {}, 0, None)
    jax.block_until_ready(metrics['loss'])
    t1 = time.perf_counter()

    frames_per_sec = n_steps * batch / (t1 - t0)
    print(json.dumps({
        'metric': 'AE train frames/sec/chip (128x128)',
        'value': round(frames_per_sec, 1),
        'unit': 'frames/sec',
        'vs_baseline': round(frames_per_sec / 30000.0, 3),
    }))


if __name__ == '__main__':
    main()
