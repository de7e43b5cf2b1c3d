"""Length-bucketed (padded+masked) losses must equal exact-shape losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavenet_tpu.fitting.training import _bucket_batch
from behavenet_tpu.models import AE, BetaTCVAE, Decoder, VAE
from behavenet_tpu.models import arch as arch_mod


def make_hp(model_class, **kw):
    a = arch_mod.load_handcrafted_arch([1, 32, 24], 6, None, check_memory=False)
    hp = dict(a, model_class=model_class, model_type='conv', n_ae_latents=6,
              n_input_channels=1, y_pixels=32, x_pixels=24, rng_seed_model=0,
              max_n_epochs=5)
    hp.update(kw)
    return hp


def _assert_metrics_close(m_exact, m_bucketed, atol=1e-4):
    for key in m_exact:
        assert np.allclose(float(m_exact[key]), float(m_bucketed[key]), atol=atol), \
            '%s: %f vs %f' % (key, float(m_exact[key]), float(m_bucketed[key]))


class TestBucketEquivalence:

    def _batch(self, T=37, with_labels=False):
        rs = np.random.RandomState(0)
        batch = {'images': rs.rand(T, 32, 24, 1).astype(np.float32)}
        if with_labels:
            batch['labels'] = rs.randn(T, 4).astype(np.float32)
        return batch

    def test_bucket_pads_to_multiple(self):
        b = _bucket_batch(self._batch(T=37), 32)
        assert b['images'].shape[0] == 64
        assert b['frame_mask'].sum() == 37

    def test_exact_multiple_no_pad(self):
        b = _bucket_batch(self._batch(T=64), 32)
        assert b['images'].shape[0] == 64
        assert b['frame_mask'].sum() == 64

    def test_ae_loss_equal(self):
        model = AE(make_hp('ae'))
        params = model.init(jax.random.PRNGKey(0))
        batch = self._batch()
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, m_exact = model.loss_fn(params, jb, jax.random.PRNGKey(1))
        bb = _bucket_batch(batch, 32)
        jbb = {k: jnp.asarray(v) for k, v in bb.items()}
        _, m_buck = model.loss_fn(params, jbb, jax.random.PRNGKey(1))
        _assert_metrics_close(m_exact, m_buck)

    def test_vae_loss_equal(self):
        """Deterministic (use_mean) part must match; compare with fixed sample."""
        model = VAE(make_hp('vae', **{'vae.beta': 2.0}))
        params = model.init(jax.random.PRNGKey(0))
        batch = self._batch()
        # zero the logvar weights/bias so sampling is deterministic-ish? no:
        # instead evaluate KL/LL terms via use_mean path by zeroing logvar head
        params['encoder']['logvar']['w'] = params['encoder']['logvar']['w'] * 0 - 20.0 * 0
        params['encoder']['logvar']['b'] = params['encoder']['logvar']['b'] * 0 - 20.0
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, m_exact = model.loss_fn(params, jb, jax.random.PRNGKey(1), beta=2.0)
        bb = _bucket_batch(batch, 32)
        jbb = {k: jnp.asarray(v) for k, v in bb.items()}
        _, m_buck = model.loss_fn(params, jbb, jax.random.PRNGKey(1), beta=2.0)
        # std=exp(-20)~0 so the reparam noise is negligible on both paths
        _assert_metrics_close(m_exact, m_buck, atol=1e-3)

    def test_beta_tcvae_decomposed_kl_equal(self):
        model = BetaTCVAE(make_hp('beta-tcvae', **{'beta_tcvae.beta': 3.0}))
        params = model.init(jax.random.PRNGKey(0))
        params['encoder']['logvar']['w'] = params['encoder']['logvar']['w'] * 0
        params['encoder']['logvar']['b'] = params['encoder']['logvar']['b'] * 0 - 20.0
        batch = self._batch()
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, m_exact = model.loss_fn(params, jb, jax.random.PRNGKey(1), beta=3.0, kl=1.0)
        bb = _bucket_batch(batch, 32)
        jbb = {k: jnp.asarray(v) for k, v in bb.items()}
        _, m_buck = model.loss_fn(params, jbb, jax.random.PRNGKey(1), beta=3.0, kl=1.0)
        _assert_metrics_close(m_exact, m_buck, atol=1e-3)

    def test_decoder_loss_equal(self):
        hp = {'model_class': 'neural-ae', 'model_type': 'mlp', 'input_size': 10,
              'output_size': 4, 'n_hid_layers': 1, 'n_hid_units': 8, 'n_lags': 2,
              'n_max_lags': 4, 'noise_dist': 'gaussian', 'activation': 'relu'}
        model = Decoder(hp)
        params = model.init(jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        T = 41
        batch = {'predictors': rs.randn(T, 10).astype(np.float32),
                 'targets': rs.randn(T, 4).astype(np.float32)}
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, m_exact = model.loss_fn(params, jb, jax.random.PRNGKey(1))
        bb = _bucket_batch(batch, 32)
        jbb = {k: jnp.asarray(v) for k, v in bb.items()}
        _, m_buck = model.loss_fn(params, jbb, jax.random.PRNGKey(1))
        # note: conv over padded region sees zeros, but those rows are outside
        # the valid window [max_lags, n_valid - max_lags) only if
        # n_valid - max_lags <= T; rows near the pad boundary differ in conv
        # context -> compare loss on the valid interior
        assert np.allclose(float(m_exact['loss']), float(m_buck['loss']), atol=1e-4)
        assert np.allclose(float(m_exact['r2']), float(m_buck['r2']), atol=1e-4)


    def test_gaussian_full_decoder_loss_equal(self):
        """gaussian-full (data-dependent precision) under bucketing matches exact."""
        hp = {'model_class': 'neural-ae', 'model_type': 'mlp-mv', 'input_size': 10,
              'output_size': 3, 'n_hid_layers': 1, 'n_hid_units': 8, 'n_lags': 2,
              'n_max_lags': 4, 'noise_dist': 'gaussian-full', 'activation': 'relu'}
        model = Decoder(hp)
        params = model.init(jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        T = 41
        batch = {'predictors': rs.randn(T, 10).astype(np.float32),
                 'targets': rs.randn(T, 3).astype(np.float32)}
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, m_exact = model.loss_fn(params, jb, jax.random.PRNGKey(1))
        bb = _bucket_batch(batch, 32)
        jbb = {k: jnp.asarray(v) for k, v in bb.items()}
        _, m_buck = model.loss_fn(params, jbb, jax.random.PRNGKey(1))
        assert np.isfinite(float(m_buck['loss']))
        assert np.allclose(float(m_exact['loss']), float(m_buck['loss']), atol=1e-4)
        assert np.allclose(float(m_exact['r2']), float(m_buck['r2']), atol=1e-4)

    def test_msps_vae_segment_bucketing_matches_exact(self):
        """Per-segment bucketed multi-session batches reproduce exact losses."""
        from behavenet_tpu.models import MSPSVAE
        from behavenet_tpu.models import arch as arch_mod
        from behavenet_tpu.fitting.training import _collate

        a = arch_mod.load_handcrafted_arch([1, 32, 24], 10, None, check_memory=False)
        hp = dict(a, model_class='msps-vae', model_type='conv', n_ae_latents=10,
                  n_input_channels=1, y_pixels=32, x_pixels=24, rng_seed_model=0,
                  n_labels=4, n_background=3, n_sessions_per_batch=2,
                  max_n_epochs=5, shape_bucket=32,
                  **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0, 'ps_vae.delta': 0.0})
        model = MSPSVAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        # pin the sampling noise to ~zero: padded shapes draw different eps
        params['encoder']['logvar']['w'] = params['encoder']['logvar']['w'] * 0
        params['encoder']['logvar']['b'] = params['encoder']['logvar']['b'] * 0 - 20.0

        rs = np.random.RandomState(0)
        data = [{'images': rs.rand(27, 32, 24, 1).astype(np.float32),
                 'labels': rs.randn(27, 4).astype(np.float32), 'batch_idx': 0},
                {'images': rs.rand(41, 32, 24, 1).astype(np.float32),
                 'labels': rs.randn(41, 4).astype(np.float32), 'batch_idx': 0}]

        # exact-shape (bucketing off)
        hp_exact = dict(hp, shape_bucket=0)
        b_e, _, lens_e, _ = _collate(list(data), [0, 1], 'msps-vae', hp_exact)
        assert lens_e == (27, 41) and 'frame_mask' not in b_e
        _, m_exact = model.loss_fn(
            params, {k: jnp.asarray(v) for k, v in b_e.items()},
            jax.random.PRNGKey(1), seg_lens=lens_e, **model.loss_kwargs(0))

        # bucketed: both segments pad to multiples of 32
        b_b, _, lens_b, _ = _collate(list(data), [0, 1], 'msps-vae', hp)
        assert lens_b == (32, 64)
        assert b_b['images'].shape[0] == 96
        assert b_b['frame_mask'].sum() == 27 + 41
        _, m_buck = model.loss_fn(
            params, {k: jnp.asarray(v) for k, v in b_b.items()},
            jax.random.PRNGKey(1), seg_lens=lens_b, **model.loss_kwargs(0))

        for key in m_exact:
            if key == 'loss_triplet':
                continue  # a different (valid-rows-only) random estimate
            assert np.allclose(float(m_exact[key]), float(m_buck[key]), atol=2e-3), \
                '%s: %f vs %f' % (key, float(m_exact[key]), float(m_buck[key]))
        assert np.isfinite(float(m_buck['loss_triplet']))

    def test_gaussian_full_dp_sharded_matches_single(self):
        """Bucketed gaussian-full batches shard over the mesh (not replicated)."""
        from jax.sharding import Mesh
        from behavenet_tpu.fitting.training import make_train_functions
        from behavenet_tpu.parallel.mesh import make_dp_train_functions

        hp = {'model_class': 'neural-ae', 'model_type': 'mlp-mv', 'input_size': 10,
              'output_size': 3, 'n_hid_layers': 1, 'n_hid_units': 8, 'n_lags': 2,
              'n_max_lags': 4, 'noise_dist': 'gaussian-full', 'activation': 'relu',
              'learning_rate': 1e-3, 'l2_reg': 0.0}
        model = Decoder(hp)
        rs = np.random.RandomState(0)
        batch = {'predictors': rs.randn(41, 10).astype(np.float32),
                 'targets': rs.randn(41, 3).astype(np.float32)}
        bb = _bucket_batch(batch, 64)  # 64 divides the 8-device mesh
        jb = {k: jnp.asarray(v) for k, v in bb.items()}

        def run(step_fns):
            tx, train_step, _ = step_fns
            params = model.init(jax.random.PRNGKey(0))
            opt_state = tx.init(params)
            losses_run = []
            for _ in range(3):
                params, opt_state, m = train_step(
                    params, opt_state, jax.random.PRNGKey(1), dict(jb), {}, 0, None)
                losses_run.append(float(m['loss']))
            return losses_run

        losses_s = run(make_train_functions(model, hp))
        mesh = Mesh(np.array(jax.devices()), ('dp',))
        losses_d = run(make_dp_train_functions(model, hp, mesh))
        assert np.allclose(losses_s, losses_d, rtol=1e-4), (losses_s, losses_d)


class TestMultiStep:

    def test_multi_step_equals_sequential_steps(self):
        """k-step scan dispatch must reproduce k sequential train steps."""
        from behavenet_tpu.fitting.training import make_multi_step, make_train_functions
        hp = make_hp('ae')
        hp['learning_rate'] = 1e-3
        model = AE(hp)
        tx, train_step, _ = make_train_functions(model, hp)
        multi = make_multi_step(model, hp, tx)

        params = model.init(jax.random.PRNGKey(0))
        opt_state = tx.init(params)
        rs = np.random.RandomState(0)
        K = 3
        xs = jnp.asarray(rs.rand(K, 8, 32, 24, 1), dtype=jnp.float32)
        rngs = jax.random.split(jax.random.PRNGKey(1), K)

        # sequential (deep copies: the jitted steps donate their inputs)
        def copy_tree(t):
            return jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), t)
        p_seq, o_seq = copy_tree(params), copy_tree(opt_state)
        losses_seq = []
        for i in range(K):
            p_seq, o_seq, m = train_step(
                p_seq, o_seq, rngs[i], {'images': xs[i]}, {}, 0, None)
            losses_seq.append(float(m['loss']))

        # one dispatch
        p_multi, o_multi, metrics = multi(
            params, opt_state, rngs, {'images': xs}, {}, 0)
        losses_multi = [float(v) for v in np.asarray(metrics['loss'])]

        assert np.allclose(losses_seq, losses_multi, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p_seq),
                        jax.tree_util.tree_leaves(p_multi)):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestDPTraining:
    """Data-parallel train steps must match single-device exactly."""

    def test_dp_steps_match_single_device(self):
        from jax.sharding import Mesh
        from behavenet_tpu.fitting.training import make_train_functions
        from behavenet_tpu.parallel.mesh import make_dp_train_functions

        hp = make_hp('ae', learning_rate=1e-3, l2_reg=0.0)
        model = AE(hp)
        rs = np.random.RandomState(0)
        batch = {'images': rs.rand(64, 32, 24, 1).astype(np.float32)}
        bb = _bucket_batch(batch, 32)
        jb = {k: jnp.asarray(v) for k, v in bb.items()}
        rng = jax.random.PRNGKey(1)

        def run(step_fns):
            tx, train_step, _ = step_fns
            params = model.init(jax.random.PRNGKey(0))
            opt_state = tx.init(params)
            losses = []
            for _ in range(3):
                params, opt_state, m = train_step(
                    params, opt_state, rng, dict(jb), {}, 0, None)
                losses.append(float(m['loss']))
            return losses, params

        losses_s, params_s = run(make_train_functions(model, hp))
        mesh = Mesh(np.array(jax.devices()), ('dp',))
        losses_d, params_d = run(make_dp_train_functions(model, hp, mesh))
        assert np.allclose(losses_s, losses_d, rtol=1e-5), (losses_s, losses_d)
        for (ka, a), (kb, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(params_s),
                       key=lambda t: str(t[0])),
                sorted(jax.tree_util.tree_leaves_with_path(params_d),
                       key=lambda t: str(t[0]))):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5), ka

    def test_dp_replicates_nondivisible_batch(self):
        from jax.sharding import Mesh
        from behavenet_tpu.parallel.mesh import make_dp_train_functions

        hp = make_hp('ae', learning_rate=1e-3, l2_reg=0.0)
        model = AE(hp)
        rs = np.random.RandomState(0)
        # 37 frames: not divisible by 8 devices -> replicated, still works
        jb = {'images': jnp.asarray(rs.rand(37, 32, 24, 1).astype(np.float32))}
        mesh = Mesh(np.array(jax.devices()), ('dp',))
        tx, train_step, _ = make_dp_train_functions(model, hp, mesh)
        params = model.init(jax.random.PRNGKey(0))
        opt_state = tx.init(params)
        params, opt_state, m = train_step(
            params, opt_state, jax.random.PRNGKey(1), jb, {}, 0, None)
        assert np.isfinite(float(m['loss']))
