"""Measure the vmapped-grid multiplier: k flagship AEs in one program.

Motivation (docs/tpu_design.md): at the reference's 189-frame trial batch
the train step is latency-bound — wall time is flat in batch below ~256
rows, so the core has idle tiles. `fitting/vmap_grid.py` fills them with
*other grid trials*. This measures wall time per step for k = 1, 2, 4, 8
vmapped trials (different learning rates) of the default 128x128 AE at
batch 189, and reports per-trial throughput — the effective grid-search
speedup over the reference's strictly sequential trial loop.

Timing per the repo rule: deep queue of steps, host fetch of the final
loss inside the timed region.

Usage: python tools/bench_vmap_grid.py  (TPU; details to stderr)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(k, batch=189, n_steps=50, n_repeats=3, mode='scan'):
    import jax
    import jax.numpy as jnp

    from behavenet_tpu.models import AE
    from behavenet_tpu.fitting.vmap_grid import (
        init_trials, make_vmap_grid_functions, stack_loss_kwargs)
    from bench import _ae_hparams

    hp = _ae_hparams()
    trials = [{'learning_rate': 1e-4 * (1 + i)} for i in range(k)]
    params_k, models = init_trials(lambda h: AE(h), hp, trials)
    init_opt, vstep, _ = make_vmap_grid_functions(models[0], hp, trials, mode=mode)
    opt_k = init_opt(params_k)
    lk = stack_loss_kwargs(models, trials, 0)
    rngs = jax.random.split(jax.random.PRNGKey(1), k)
    b = {'images': jnp.asarray(
        np.random.RandomState(0).randint(
            0, 255, size=(batch, hp['y_pixels'], hp['x_pixels'], 1)),
        dtype=jnp.uint8)}

    t0 = time.perf_counter()
    params_k, opt_k, m = vstep(params_k, opt_k, rngs, b, lk)
    _ = float(np.asarray(m['loss'])[0])
    print('mode=%s k=%d compile+first step: %.0fs'
          % (mode, k, time.perf_counter() - t0), file=sys.stderr)

    best = 0.0
    for rep in range(n_repeats):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            params_k, opt_k, m = vstep(params_k, opt_k, rngs, b, lk)
        losses = np.asarray(m['loss'])  # host fetch = true sync
        dt = time.perf_counter() - t0
        fps = n_steps * batch * k / dt
        print('mode=%s k=%d rep=%d: %.2f ms/step, %.0f trial-frames/s '
              '(losses %s)' % (mode, k, rep, dt / n_steps * 1e3, fps,
                               np.round(losses, 5)), file=sys.stderr)
        assert np.isfinite(losses).all()
        best = max(best, fps)
    return best


def main():
    results = {}
    for mode in ('scan', 'vmap'):
        base = None
        for k in (1, 2, 4, 8):
            try:
                fps = measure(k, mode=mode)
                if k == 1:
                    base = fps
                results['%s/k=%d' % (mode, k)] = {
                    'trial_frames_per_sec': round(fps, 1),
                    'multiplier_vs_sequential':
                        round(fps / base, 2) if base else None}
            except Exception as e:
                print('mode=%s k=%d failed: %s' % (mode, k, e), file=sys.stderr)
                results['%s/k=%d' % (mode, k)] = None
    print(results)


if __name__ == '__main__':
    main()
