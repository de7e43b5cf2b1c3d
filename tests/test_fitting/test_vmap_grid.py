"""Vmapped grid training: k trials in one program match k independent fits.

The trial axis is a vmap axis, so XLA lowers the convs as grouped convs —
numerics may reassociate, hence 1e-5-ish tolerances (same standard as the
dp/tp equivalence tests).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavenet_tpu.models import AE, PSVAE, VAE
from behavenet_tpu.models.arch import load_handcrafted_arch
from behavenet_tpu.fitting.training import make_train_functions
from behavenet_tpu.fitting.vmap_grid import (
    init_trials, make_vmap_grid_functions, stack_loss_kwargs)


def _base(model_class='ae', **extra):
    a = load_handcrafted_arch([1, 32, 24], 6, None, check_memory=False)
    return dict(a, model_class=model_class, model_type='conv', n_ae_latents=6,
                n_input_channels=1, y_pixels=32, x_pixels=24,
                learning_rate=1e-3, l2_reg=1e-4, rng_seed_model=0,
                max_n_epochs=5, **extra)


def _run_vmapped(model_cls, base, trials, batches, rngs, n_steps,
                 loss_kwarg_map=None):
    params_k, models = init_trials(lambda hp: model_cls(hp), base, trials)
    init_opt, vstep, veval = make_vmap_grid_functions(models[0], base, trials)
    opt_k = init_opt(params_k)
    lk = stack_loss_kwargs(models, trials, 0)
    losses = []
    for b in batches[:n_steps]:
        params_k, opt_k, m = vstep(params_k, opt_k, rngs, b, lk)
        losses.append(np.asarray(m['loss']))
    ev = veval(params_k, rngs, batches[0], lk)
    return np.array(losses), params_k, np.asarray(ev['loss'])


def _run_independent(model_cls, base, trial, rng, batches, n_steps,
                     loss_kwarg_map=None):
    hp = dict(base)
    for k, v in trial.items():
        hp[(loss_kwarg_map or {}).get(k, k)] = v
    model = model_cls(hp)
    tx, step, eval_step = make_train_functions(model, hp)
    p = model.init(jax.random.PRNGKey(int(hp.get('rng_seed_model', 0))))
    o = tx.init(p)
    lk = model.loss_kwargs(0) if hasattr(model, 'loss_kwargs') else {}
    losses = []
    for b in batches[:n_steps]:
        p, o, m = step(p, o, rng, dict(b), lk, 0, None)
        losses.append(float(m['loss']))
    ev = eval_step(p, rng, dict(batches[0]), lk, 0, None)
    return np.array(losses), p, float(ev['loss'])


class TestVmapGridAE:

    def test_matches_independent_fits(self):
        base = _base()
        trials = [{'learning_rate': 1e-3},
                  {'learning_rate': 3e-4, 'l2_reg': 0.0},
                  {'learning_rate': 1e-4, 'rng_seed_model': 7}]
        rs = np.random.RandomState(0)
        batches = [{'images': jnp.asarray(rs.rand(8, 32, 24, 1),
                                          dtype=jnp.float32)} for _ in range(3)]
        rngs = jax.random.split(jax.random.PRNGKey(0), len(trials))
        lv, params_k, ev_v = _run_vmapped(AE, base, trials, batches, rngs, 3)
        for ti, t in enumerate(trials):
            ls, p, ev = _run_independent(AE, base, t, rngs[ti], batches, 3)
            assert np.allclose(ls, lv[:, ti], rtol=1e-5, atol=1e-7), (ti, ls, lv[:, ti])
            assert np.isclose(ev, ev_v[ti], rtol=1e-5)
            slice_k = jax.tree_util.tree_map(lambda x: np.asarray(x)[ti], params_k)
            for (ka, a), (_, b) in zip(
                    sorted(jax.tree_util.tree_leaves_with_path(p),
                           key=lambda x: str(x[0])),
                    sorted(jax.tree_util.tree_leaves_with_path(slice_k),
                           key=lambda x: str(x[0]))):
                assert np.allclose(np.asarray(a), b, atol=1e-5), (ti, ka)

    def test_uint8_batch_normalized_once(self):
        base = _base()
        trials = [{'learning_rate': 1e-3}, {'learning_rate': 1e-4}]
        params_k, models = init_trials(lambda hp: AE(hp), base, trials)
        init_opt, vstep, _ = make_vmap_grid_functions(models[0], base, trials)
        opt_k = init_opt(params_k)
        rs = np.random.RandomState(0)
        b = {'images': jnp.asarray(
            rs.randint(0, 255, size=(8, 32, 24, 1)), dtype=jnp.uint8)}
        rngs = jax.random.split(jax.random.PRNGKey(0), 2)
        lk = stack_loss_kwargs(models, trials, 0)
        _, _, m = vstep(params_k, opt_k, rngs, b, lk)
        assert np.all(np.isfinite(np.asarray(m['loss'])))
        assert np.asarray(m['loss']).shape == (2,)

    def test_vmap_mode_matches_scan_mode(self):
        base = dict(_base(), l2_reg=0.0)
        trials = [{'learning_rate': 1e-3}, {'learning_rate': 3e-4}]
        rs = np.random.RandomState(0)
        batch = {'images': jnp.asarray(rs.rand(8, 32, 24, 1), dtype=jnp.float32)}
        rngs = jax.random.split(jax.random.PRNGKey(0), 2)
        out = {}
        for mode in ('scan', 'vmap'):
            params_k, models = init_trials(lambda hp: AE(hp), base, trials)
            init_opt, vstep, _ = make_vmap_grid_functions(
                models[0], base, trials, mode=mode)
            opt_k = init_opt(params_k)
            lk = stack_loss_kwargs(models, trials, 0)
            params_k, opt_k, m = vstep(params_k, opt_k, rngs, batch, lk)
            out[mode] = np.asarray(m['loss'])
        np.testing.assert_allclose(out['scan'], out['vmap'], rtol=1e-5)

    def test_mismatched_structures_raise(self):
        base = _base()
        # different architectures cannot share one program
        trials = [{}, {'n_ae_latents': 8}]
        with pytest.raises(ValueError, match='different param structures'):
            init_trials(lambda hp: AE(hp), base, trials)


class TestVmapGridPSVAE:

    def test_alpha_beta_search(self):
        # the documented PS-VAE hparam search: one program, many alphas
        base = _base('ps-vae', n_labels=4,
                     **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0})
        trials = [{'alpha': 1.0}, {'alpha': 50.0},
                  {'alpha': 50.0, 'learning_rate': 3e-4}]
        rs = np.random.RandomState(0)
        batches = [{'images': jnp.asarray(rs.rand(8, 32, 24, 1), dtype=jnp.float32),
                    'labels': jnp.asarray(rs.randn(8, 4), dtype=jnp.float32)}
                   for _ in range(3)]
        rngs = jax.random.split(jax.random.PRNGKey(0), len(trials))
        lv, _, _ = _run_vmapped(PSVAE, base, trials, batches, rngs, 3)
        for ti, t in enumerate(trials):
            ls, _, _ = _run_independent(
                PSVAE, base, t, rngs[ti], batches, 3,
                loss_kwarg_map={'alpha': 'ps_vae.alpha'})
            assert np.allclose(ls, lv[:, ti], rtol=1e-4), (ti, ls, lv[:, ti])

    def test_beta_schedule_per_trial(self):
        # trials with different anneal schedules stack per-epoch kwargs
        base = _base('vae', n_labels=4,
                     **{'vae.beta': 4.0, 'vae.beta_anneal_epochs': 4})
        trials = [{}, {'vae.beta': 8.0}]
        params_k, models = init_trials(lambda hp: VAE(hp), base, trials)
        kw0 = stack_loss_kwargs(models, trials, 0)
        # epoch 3 = end of the 4-epoch linspace = each trial's full beta
        # (afterwards the reference's schedule quirkily drops to 1.0 —
        # vaes.py:96-98 "sloppy addition" — which the rebuild keeps)
        kw3 = stack_loss_kwargs(models, trials, 3)
        assert kw0['beta'].shape == (2,)
        np.testing.assert_allclose(np.asarray(kw3['beta']), [4.0, 8.0])
        np.testing.assert_allclose(np.asarray(kw0['beta']), [0.0, 0.0])
