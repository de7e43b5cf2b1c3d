"""Multi-chip grid fan-out: trial axis sharded over a mesh (VERDICT r4 item 1).

The reference maps grid-search trials across local GPUs one process per
device (reference fitting/ae_grid_search.py:173-187 via test-tube's
``optimize_parallel_gpu``). Here the grid-in-one-program step
(fitting/vmap_grid.py) shards its trial axis over the first axis of a
device mesh via shard_map — each device runs its local trials' exact
single-device step body, so the results must match the unsharded step and
k independent sequential fits param-for-param. Further mesh axes stay
automatic: a ('grid', 'dp') mesh additionally shards the shared batch's
frame axis (GSPMD gradient all-reduce inside every trial lane).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from behavenet_tpu.models import AE, PSVAE
from behavenet_tpu.models.arch import load_handcrafted_arch
from behavenet_tpu.fitting.training import make_train_functions
from behavenet_tpu.fitting.vmap_grid import (
    default_grid_mesh, init_trials, make_vmap_grid_functions,
    stack_loss_kwargs)


def _base(model_class='ae', **extra):
    a = load_handcrafted_arch([1, 32, 24], 6, None, check_memory=False)
    return dict(a, model_class=model_class, model_type='conv', n_ae_latents=6,
                n_input_channels=1, y_pixels=32, x_pixels=24,
                learning_rate=1e-3, l2_reg=1e-4, rng_seed_model=0,
                max_n_epochs=5, **extra)


def _grid_mesh(n, extra_axis=None):
    devs = jax.devices()
    if len(devs) < n * (2 if extra_axis else 1):
        pytest.skip('needs %d devices' % (n * (2 if extra_axis else 1)))
    if extra_axis:
        return Mesh(np.asarray(devs[:2 * n]).reshape(n, 2),
                    ('grid', extra_axis))
    return Mesh(np.asarray(devs[:n]), ('grid',))


def _run_grid(model_cls, base, trials, batches, rngs, mesh, batch_put=None):
    params_k, models = init_trials(lambda hp: model_cls(hp), base, trials)
    init_opt, vstep, veval = make_vmap_grid_functions(
        models[0], base, trials, mesh=mesh)
    opt_k = init_opt(params_k)
    lk = stack_loss_kwargs(models, trials, 0)
    losses = []
    for b in batches:
        if batch_put is not None:
            b = batch_put(b)
        params_k, opt_k, m = vstep(params_k, opt_k, rngs, b, lk)
        losses.append(np.asarray(m['loss']))
    ev = veval(params_k, rngs, batches[0] if batch_put is None
               else batch_put(batches[0]), lk)
    return np.array(losses), params_k, np.asarray(ev['loss'])


def _assert_params_close(p_ref, params_k, ti, atol):
    slice_k = jax.tree_util.tree_map(lambda x: np.asarray(x)[ti], params_k)
    for (ka, a), (_, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(p_ref),
                   key=lambda x: str(x[0])),
            sorted(jax.tree_util.tree_leaves_with_path(slice_k),
                   key=lambda x: str(x[0]))):
        assert np.allclose(np.asarray(a), b, atol=atol), (ti, ka)


class TestGridMeshAE:

    def _batches(self, n, b=8):
        rs = np.random.RandomState(0)
        return [{'images': jnp.asarray(rs.rand(b, 32, 24, 1),
                                       dtype=jnp.float32)} for _ in range(n)]

    def test_sharded_matches_independent_fits(self):
        """8 trials over a 4-device grid mesh (2 per device) == 8 sequential
        fits, param for param."""
        mesh = _grid_mesh(4)
        base = _base()
        trials = [{'learning_rate': lr, 'rng_seed_model': s}
                  for lr in (1e-3, 3e-4) for s in (0, 1, 2, 7)]
        batches = self._batches(3)
        rngs = jax.random.split(jax.random.PRNGKey(0), len(trials))
        lv, params_k, ev_v = _run_grid(AE, base, trials, batches, rngs, mesh)
        assert lv.shape == (3, len(trials))
        for ti, t in enumerate(trials):
            hp = dict(base, **t)
            model = AE(hp)
            tx, step, eval_step = make_train_functions(model, hp)
            p = model.init(jax.random.PRNGKey(int(hp['rng_seed_model'])))
            o = tx.init(p)
            ls = []
            for b in batches:
                p, o, m = step(p, o, rngs[ti], dict(b), {}, 0, None)
                ls.append(float(m['loss']))
            ev = float(eval_step(p, rngs[ti], dict(batches[0]), {}, 0, None)['loss'])
            assert np.allclose(ls, lv[:, ti], rtol=1e-5, atol=1e-7), (ti, ls, lv[:, ti])
            assert np.isclose(ev, ev_v[ti], rtol=1e-5)
            _assert_params_close(p, params_k, ti, atol=1e-5)

    def test_sharded_matches_unsharded_step(self):
        """The mesh path is the same per-trial program as the single-device
        grid step (no collectives) — trajectories match tightly."""
        mesh = _grid_mesh(4)
        base = _base()
        trials = [{'learning_rate': lr} for lr in (1e-3, 7e-4, 3e-4, 1e-4)]
        batches = self._batches(2)
        rngs = jax.random.split(jax.random.PRNGKey(0), len(trials))
        lv_m, pk_m, _ = _run_grid(AE, base, trials, batches, rngs, mesh)
        lv_1, pk_1, _ = _run_grid(AE, base, trials, batches, rngs, None)
        np.testing.assert_allclose(lv_m, lv_1, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(pk_m),
                        jax.tree_util.tree_leaves(pk_1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_trial_count_padding(self):
        """k=3 trials on a 2-device grid mesh: the pad lane (a repeat of the
        last trial) is sliced off; results still match sequential fits."""
        mesh = _grid_mesh(2)
        base = _base()
        trials = [{'learning_rate': 1e-3},
                  {'learning_rate': 3e-4, 'l2_reg': 0.0},
                  {'learning_rate': 1e-4, 'rng_seed_model': 7}]
        batches = self._batches(2)
        rngs = jax.random.split(jax.random.PRNGKey(0), len(trials))
        lv, params_k, _ = _run_grid(AE, base, trials, batches, rngs, mesh)
        assert lv.shape == (2, 3)
        lv_ref, pk_ref, _ = _run_grid(AE, base, trials, batches, rngs, None)
        np.testing.assert_allclose(lv, lv_ref, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(params_k),
                        jax.tree_util.tree_leaves(pk_ref)):
            assert np.asarray(a).shape == np.asarray(b).shape  # unpadded
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_grid_times_dp_batch_sharding(self):
        """('grid', 'dp') mesh: trials over grid AND the shared batch's
        frame axis over dp (auto/GSPMD inside each trial lane) matches the
        unsharded grid step (VERDICT r4 item 8)."""
        mesh = _grid_mesh(2, extra_axis='dp')
        base = dict(_base(), l2_reg=0.0)
        trials = [{'learning_rate': 1e-3}, {'learning_rate': 3e-4}]
        batches = self._batches(2, b=8)  # 8 frames / 2 dp shards
        rngs = jax.random.split(jax.random.PRNGKey(0), len(trials))
        dp_shard = NamedSharding(mesh, P('dp'))

        def put(b):
            return {k: jax.device_put(v, dp_shard) for k, v in b.items()}
        lv_dp, pk_dp, ev_dp = _run_grid(AE, base, trials, batches, rngs, mesh,
                                        batch_put=put)
        lv_1, pk_1, ev_1 = _run_grid(AE, base, trials, batches, rngs, None)
        np.testing.assert_allclose(lv_dp, lv_1, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(ev_dp, ev_1, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(pk_dp),
                        jax.tree_util.tree_leaves(pk_1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestGridMeshPSVAE:

    def test_alpha_search_sharded(self):
        """Variational model (rng inside the loss) across the grid mesh:
        per-trial keys ride the sharded trial axis, so stochastic losses
        stay per-trial independent and match the unsharded step."""
        mesh = _grid_mesh(2)
        base = _base('ps-vae', n_labels=4,
                     **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0})
        trials = [{'alpha': 1.0}, {'alpha': 50.0}]
        rs = np.random.RandomState(0)
        batches = [{'images': jnp.asarray(rs.rand(8, 32, 24, 1), dtype=jnp.float32),
                    'labels': jnp.asarray(rs.randn(8, 4), dtype=jnp.float32)}
                   for _ in range(2)]
        rngs = jax.random.split(jax.random.PRNGKey(0), len(trials))
        lv_m, pk_m, _ = _run_grid(PSVAE, base, trials, batches, rngs, mesh)
        lv_1, pk_1, _ = _run_grid(PSVAE, base, trials, batches, rngs, None)
        np.testing.assert_allclose(lv_m, lv_1, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(pk_m),
                        jax.tree_util.tree_leaves(pk_1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestDefaultGridMesh:

    def test_auto_mesh_over_local_devices(self):
        n = len(jax.devices())
        if n < 2:
            pytest.skip('needs >1 device')
        mesh = default_grid_mesh(8)
        assert mesh is not None and mesh.axis_names == ('grid',)
        assert mesh.shape['grid'] == min(n, 8)

    def test_capped_by_trials_and_hparam(self):
        n = len(jax.devices())
        if n < 2:
            pytest.skip('needs >1 device')
        assert default_grid_mesh(1) is None
        mesh = default_grid_mesh(8, {'grid_devices': 2})
        assert mesh is not None and mesh.shape['grid'] == 2
        assert default_grid_mesh(8, {'grid_devices': 1}) is None
        assert default_grid_mesh(8, {'grid_devices': 0}) is None
