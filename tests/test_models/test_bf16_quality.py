"""bf16 training-quality gate (VERDICT r4 item 2; BASELINE.md recon-MSE row).

bench.py's headline throughput runs the bf16 activation pipeline
(``compute_dtype=bfloat16`` + ``bf16_pipeline``) while the shipped default
is f32. BASELINE.md's acceptance is "recon-MSE within 1%" (the reference
trains in f32, examples/01_ae.ipynb); this suite fits the SAME AE through
the real ``make_train_functions`` step in both dtypes on identical data
and gates the CONVERGED reconstruction MSE — not just a forward-pass
closeness check — so the number bench.py publishes is backed by a
training-quality guarantee.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavenet_tpu.fitting.training import make_train_functions
from behavenet_tpu.models import AE
from behavenet_tpu.models.arch import load_handcrafted_arch


def _hparams(compute_dtype=None, bf16_pipeline=False):
    a = load_handcrafted_arch([1, 32, 24], 6, None, check_memory=False)
    return dict(a, model_class='ae', model_type='conv', n_ae_latents=6,
                n_input_channels=1, y_pixels=32, x_pixels=24,
                learning_rate=1e-3, l2_reg=0.0, rng_seed_model=0,
                compute_dtype=compute_dtype, bf16_pipeline=bf16_pipeline)


def _blob_batch(rs, batch, h=32, w=24):
    """Structured uint8 frames (moving Gaussian blob) as the training data."""
    yy, xx = np.mgrid[:h, :w]
    pos = rs.rand(batch, 2) * [h - 4, w - 4] + 2
    ims = np.exp(-((yy[None] - pos[:, 0, None, None]) ** 2
                   + (xx[None] - pos[:, 1, None, None]) ** 2) / 12.0)
    return (ims[..., None] * 255).astype(np.uint8)


def _fit(hp, n_steps, batch=32, tail=40):
    """Full fit through the real train step; returns converged eval MSE."""
    model = AE(hp)
    tx, train_step, eval_step = make_train_functions(model, hp)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    rs = np.random.RandomState(0)
    val = {'images': jnp.asarray(_blob_batch(np.random.RandomState(99), 64))}
    rng = jax.random.PRNGKey(1)
    mses = []
    for i in range(n_steps):
        b = {'images': jnp.asarray(_blob_batch(rs, batch))}
        params, opt_state, m = train_step(params, opt_state, rng, b, {}, 0, None)
        if i >= n_steps - tail:
            # the AE loss IS the recon MSE (reference aes.py:706: losses.mse)
            mses.append(float(eval_step(params, rng, val, {}, 0, None)['loss']))
    return float(np.mean(mses))


@pytest.mark.slow
def test_bf16_pipeline_converged_mse_within_1pct():
    """Converged recon-MSE of the bf16-pipeline fit within 1% of the f32 fit.

    This is the BASELINE.md criterion evaluated under the exact
    configuration bench.py's headline stages run (compute_dtype=bfloat16 +
    bf16_pipeline), via a full training run rather than a single forward
    pass (the round-4 evidence gap).
    """
    n_steps = 250
    mse_f32 = _fit(_hparams(), n_steps)
    mse_bf16 = _fit(_hparams(compute_dtype=jnp.bfloat16, bf16_pipeline=True),
                    n_steps)
    rel = abs(mse_bf16 - mse_f32) / mse_f32
    print('converged recon-MSE: f32 %.6g, bf16 %.6g, rel gap %.3f%%'
          % (mse_f32, mse_bf16, rel * 100))
    assert np.isfinite(mse_bf16) and mse_bf16 > 0
    assert rel < 0.01, (mse_f32, mse_bf16, rel)
