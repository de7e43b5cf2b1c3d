"""A/B: raw 189-frame train step vs the bucketed 192-frame step fit() runs.

Real training never executes a 189-row program: ``fit()`` pads every trial
batch to ``shape_bucket`` (default 32) multiples with a ``frame_mask``, so
the reference's 189-frame Musall trial batch actually runs as a masked
192-frame step. 189 = 27*7 rows tiles the 8-row TPU sublane dimension
poorly; 192 = 24 sublanes exactly. This measures whether the aligned
(masked) shape wins even after paying for 3 dead frames, at several
shapes. Timing per the repo rule: deep queue of steps, host fetch of the
final loss inside the timed region.

Usage: python tools/bench_pad192.py  (on the TPU; details to stderr)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch, pad_to=None, n_steps=50, n_repeats=3):
    import jax
    import jax.numpy as jnp

    from behavenet_tpu.fitting.training import make_train_functions
    from behavenet_tpu.models import AE

    from bench import _ae_hparams

    hp = _ae_hparams()
    model = AE(hp)
    tx, train_step, _ = make_train_functions(model, hp)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)

    n = pad_to or batch
    x = np.random.RandomState(0).randint(
        0, 255, size=(n, hp['y_pixels'], hp['x_pixels'], 1)).astype('uint8')
    b = {'images': jnp.asarray(x)}
    if pad_to:
        mask = np.zeros((n,), dtype='float32')
        mask[:batch] = 1.0
        b['frame_mask'] = jnp.asarray(mask)

    t0 = time.perf_counter()
    params, opt_state, m = train_step(params, opt_state, rng, b, {}, 0, None)
    _ = float(m['loss'])
    print('rows=%d (valid=%d) compile+first: %.0fs'
          % (n, batch, time.perf_counter() - t0), file=sys.stderr)

    best = 0.0
    for rep in range(n_repeats):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            params, opt_state, m = train_step(params, opt_state, rng, b, {}, 0, None)
        final_loss = float(m['loss'])
        dt = time.perf_counter() - t0
        fps = n_steps * batch / dt  # only the valid frames count
        print('rows=%d (valid=%d) rep=%d: %.0f frames/s (%.2f ms/step, loss %.5f)'
              % (n, batch, rep, fps, dt / n_steps * 1e3, final_loss),
              file=sys.stderr)
        assert np.isfinite(final_loss)
        best = max(best, fps)
    return best


def main():
    results = {}
    for batch, pad_to in ((189, None), (189, 192), (192, None), (189, 256),
                          (256, None)):
        key = '%d->%s' % (batch, pad_to or 'raw')
        try:
            results[key] = round(measure(batch, pad_to), 1)
        except Exception as e:
            print('%s failed: %s' % (key, e), file=sys.stderr)
            results[key] = None
    print(results)


if __name__ == '__main__':
    main()
