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


class TestVmapGridMSPSVAE:
    """Multisession seg_lens batches in one vmapped program (VERDICT r3 item 3)."""

    def _base(self):
        from behavenet_tpu.models.arch import load_handcrafted_arch
        a = load_handcrafted_arch([1, 32, 24], 10, None, check_memory=False)
        return dict(a, model_class='msps-vae', model_type='conv', n_ae_latents=10,
                    n_input_channels=1, y_pixels=32, x_pixels=24, rng_seed_model=0,
                    n_labels=4, n_background=3, n_sessions_per_batch=2,
                    learning_rate=1e-3, l2_reg=0.0, max_n_epochs=5,
                    **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0, 'ps_vae.delta': 1.0})

    def _batches(self, n, seg_lens=(8, 8)):
        rs = np.random.RandomState(0)
        out = []
        for _ in range(n):
            T = sum(seg_lens)
            out.append({'images': jnp.asarray(rs.rand(T, 32, 24, 1), dtype=jnp.float32),
                        'labels': jnp.asarray(rs.randn(T, 4), dtype=jnp.float32)})
        return out

    def test_alpha_delta_search_matches_independent_fits(self):
        """The documented MSPS-VAE search: alpha/delta vary per trial, the
        triplet loss runs on shared seg_lens batches (reference
        docs/source/adv_user_guide.psvae_hparam_search.rst:10-27)."""
        from behavenet_tpu.models import MSPSVAE

        base = self._base()
        trials = [{'ps_vae.alpha': 1.0},
                  {'ps_vae.alpha': 50.0, 'ps_vae.delta': 10.0},
                  {'ps_vae.delta': 0.0, 'learning_rate': 3e-4}]
        seg = (8, 8)
        batches = self._batches(3, seg)
        rngs = jax.random.split(jax.random.PRNGKey(0), len(trials))

        params_k, models = init_trials(lambda hp: MSPSVAE(hp), base, trials)
        init_opt, vstep, veval = make_vmap_grid_functions(models[0], base, trials)
        opt_k = init_opt(params_k)
        lk = stack_loss_kwargs(models, trials, 0)
        np.testing.assert_allclose(np.asarray(lk['alpha']), [1.0, 50.0, 1.0])
        np.testing.assert_allclose(np.asarray(lk['delta']), [1.0, 10.0, 0.0])
        lv, tv = [], []
        for b in batches:
            params_k, opt_k, m = vstep(params_k, opt_k, rngs, b, lk, seg_lens=seg)
            lv.append(np.asarray(m['loss']))
            tv.append(np.asarray(m['loss_triplet']))
        lv, tv = np.array(lv), np.array(tv)
        ev = np.asarray(veval(params_k, rngs, batches[0], lk, seg_lens=seg)['loss'])

        # delta=0 trial has no triplet gradient but still reports the raw term
        assert np.all(tv > 0)

        for ti, t in enumerate(trials):
            hp = dict(base, **t)
            model = MSPSVAE(hp)
            tx, step, eval_step = make_train_functions(model, hp)
            p = model.init(jax.random.PRNGKey(0))
            o = tx.init(p)
            lk1 = model.loss_kwargs(0)
            ls = []
            for b in batches:
                p, o, m = step(p, o, rngs[ti], dict(b), lk1, 0, seg)
                ls.append(float(m['loss']))
            ev1 = float(eval_step(p, rngs[ti], dict(batches[0]), lk1, 0, seg)['loss'])
            assert np.allclose(np.array(ls), lv[:, ti], rtol=1e-4), (ti, ls, lv[:, ti])
            assert np.isclose(ev1, ev[ti], rtol=1e-4)
            # param tolerance is looser than the AE test's: Adam divides by
            # sqrt(v), so for near-dead weights a 1e-7 reassociation delta in
            # the gradient can move the update by ~lr-scale (same mechanism
            # as the documented tp dead-param caveat, test_parallel/test_tp.py)
            slice_k = jax.tree_util.tree_map(lambda x: np.asarray(x)[ti], params_k)
            for (ka, a), (_, b_) in zip(
                    sorted(jax.tree_util.tree_leaves_with_path(p),
                           key=lambda x: str(x[0])),
                    sorted(jax.tree_util.tree_leaves_with_path(slice_k),
                           key=lambda x: str(x[0]))):
                assert np.allclose(np.asarray(a), b_, atol=1e-4), (ti, ka)

    def test_seg_lens_bucket_recompile_consistency(self):
        """Different seg_lens tuples select different compiled programs."""
        from behavenet_tpu.models import MSPSVAE

        base = self._base()
        trials = [{}, {'ps_vae.alpha': 10.0}]
        params_k, models = init_trials(lambda hp: MSPSVAE(hp), base, trials)
        init_opt, vstep, _ = make_vmap_grid_functions(models[0], base, trials)
        opt_k = init_opt(params_k)
        lk = stack_loss_kwargs(models, trials, 0)
        rngs = jax.random.split(jax.random.PRNGKey(0), 2)
        for seg in ((8, 8), (8, 16)):
            b = self._batches(1, seg)[0]
            params_k, opt_k, m = vstep(params_k, opt_k, rngs, b, lk, seg_lens=seg)
            assert np.all(np.isfinite(np.asarray(m['loss'])))


class TestGroupVmappable:
    """Eligibility partitioning for the grid-in-one-program path."""

    def _trials(self, **varying):
        base = {'model_class': 'ae', 'learning_rate': 1e-3,
                'rng_seed_model': 0, 'rng_seed_train': 0, 'max_n_epochs': 2}
        n = max(len(v) for v in varying.values())
        return [dict(base, **{k: v[i] for k, v in varying.items()})
                for i in range(n)]

    def test_seed_model_variation_groups(self):
        from behavenet_tpu.fitting.vmap_grid import group_vmappable
        trials = self._trials(rng_seed_model=[0, 1, 2])
        groups, singles = group_vmappable(trials, max_k=8)
        assert len(groups) == 1 and len(groups[0]) == 3 and not singles

    def test_seed_train_variation_falls_back_sequential(self):
        """rng_seed_train drives the per-epoch batch ORDER in a sequential
        fit; grouped trials share one data stream, so a grid varying it
        cannot be grouped without silently changing per-trial results."""
        from behavenet_tpu.fitting.vmap_grid import group_vmappable
        trials = self._trials(rng_seed_train=[0, 1, 2])
        groups, singles = group_vmappable(trials, max_k=8)
        assert not groups and len(singles) == 3

    def test_max_k_chunks_preserve_order(self):
        from behavenet_tpu.fitting.vmap_grid import group_vmappable
        trials = self._trials(learning_rate=[1e-3, 3e-4, 1e-4, 3e-5, 1e-5])
        groups, singles = group_vmappable(trials, max_k=2)
        assert [len(g) for g in groups] == [2, 2] and len(singles) == 1
        flat = [t['learning_rate'] for g in groups for t in g]
        assert flat == [1e-3, 3e-4, 1e-4, 3e-5]
