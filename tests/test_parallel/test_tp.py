"""Tensor-parallel (channel-sharded) training: exactness vs single device.

Run on the 8-virtual-device CPU mesh (tests/conftest.py). The tp step is
the same global XLA program as the single-chip step, so results must match
to f32 reduction-order noise. One caveat the tests encode: a conv bias
immediately followed by BatchNorm is a dead parameter (BN subtracts the
batch mean, so its true gradient is exactly zero and the computed gradient
is ~1e-9 cancellation noise, which Adam's normalizer amplifies to lr-scale
parameter drift on ANY reduction-order change — the torch reference has the
identical property). Strict parameter equivalence is therefore asserted on
a BN-free arch; the BN arch asserts loss-trajectory equivalence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavenet_tpu.models import AE
from behavenet_tpu.models.arch import get_handcrafted_dims
from behavenet_tpu.fitting.training import make_train_functions
from behavenet_tpu.parallel.tp import (
    make_mesh_2d, make_tp_train_functions, tp_param_shardings, tp_shard)


def _make_model(batch_norm=0, channels=(8, 16, 32), pool=False):
    n = len(channels)
    if pool:
        # conv(k5,s1) + maxpool(k2,s2) pairs per channel stage
        arch = {
            'ae_network_type': 'max_pooling',
            'ae_padding_type': 'same',
            'ae_batch_norm': batch_norm, 'symmetric_arch': 1,
            'ae_encoding_n_channels': [c for c in channels for _ in range(2)],
            'ae_encoding_kernel_size': [5, 2] * n,
            'ae_encoding_stride_size': [1, 2] * n,
            'ae_encoding_layer_type': ['conv', 'maxpool'] * n,
            'ae_decoding_last_FF_layer': 0,
            'ae_input_dim': [1, 32, 32], 'n_ae_latents': 6,
        }
    else:
        arch = {
            'ae_network_type': 'strides_only',
            'ae_padding_type': 'same',
            'ae_batch_norm': batch_norm, 'symmetric_arch': 1,
            'ae_encoding_n_channels': list(channels),
            'ae_encoding_kernel_size': [5] * n,
            'ae_encoding_stride_size': [2] * n,
            'ae_encoding_layer_type': ['conv'] * n,
            'ae_decoding_last_FF_layer': 0,
            'ae_input_dim': [1, 32, 32], 'n_ae_latents': 6,
        }
    arch = get_handcrafted_dims(arch, symmetric=True)
    hp = dict(arch, model_class='ae', model_type='conv', n_ae_latents=6,
              n_input_channels=1, y_pixels=32, x_pixels=32,
              learning_rate=1e-3, l2_reg=1e-4, rng_seed_model=0)
    return AE(hp), hp


def _run_steps(model, step_fns, n_steps=3, batch_size=16):
    tx, train_step, _ = step_fns
    params = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    rs = np.random.RandomState(0)
    losses = []
    for i in range(n_steps):
        batch = {'images': jnp.asarray(
            rs.rand(batch_size, 32, 32, 1), dtype=jnp.float32)}
        params, opt_state, m = train_step(
            params, opt_state, jax.random.PRNGKey(i), batch, {}, 0, None)
        losses.append(float(m['loss']))
    return losses, params


class TestTPEquivalence:

    def test_params_match_single_device_no_bn(self):
        # this IS the shipped default configuration: ae_batch_norm defaults
        # to 0 (models/arch.py:289, matching the reference generator's
        # default, reference ae_model_architecture_generator.py:114,712) and
        # the optimizer defaults to amsgrad — so the published arch under
        # the published optimizer has STRICT param equivalence coverage;
        # only the opt-in BN variant needs the SGD diagnostics hook below.
        model, hp = _make_model(batch_norm=0)
        losses_s, params_s = _run_steps(model, make_train_functions(model, hp))
        mesh = make_mesh_2d(2, 4)
        losses_t, params_t = _run_steps(
            model, make_tp_train_functions(model, hp, mesh))
        assert np.allclose(losses_s, losses_t, rtol=1e-5), (losses_s, losses_t)
        for (ka, a), (_, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(params_s),
                       key=lambda t: str(t[0])),
                sorted(jax.tree_util.tree_leaves_with_path(params_t),
                       key=lambda t: str(t[0]))):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5), ka

    def test_losses_match_with_batchnorm(self):
        # BN batch stats are GLOBAL means under the dp shard (GSPMD global
        # semantics — unlike torch DataParallel's per-replica stats), so the
        # loss trajectory must track the single-device run
        model, hp = _make_model(batch_norm=1)
        losses_s, _ = _run_steps(model, make_train_functions(model, hp), n_steps=4)
        mesh = make_mesh_2d(2, 4)
        losses_t, params_t = _run_steps(
            model, make_tp_train_functions(model, hp, mesh), n_steps=4)
        assert np.allclose(losses_s, losses_t, rtol=1e-4), (losses_s, losses_t)
        # running stats rode along sharded
        rm = params_t['encoder']['bn_0']['running_mean']
        assert np.isfinite(np.asarray(rm)).all()

    def test_params_match_with_batchnorm_sgd(self):
        # strict param equivalence ON a BatchNorm arch: under SGD the
        # dead-param (pre-BN conv bias) gradient noise is not amplified by a
        # moment normalizer, so every parameter — including running stats —
        # must match the single-device run to reduction-order tolerance.
        # (Closes the r3 gap where BN archs had loss-trajectory-only tp
        # coverage; the Adam caveat above is about the optimizer, not the
        # sharding.)
        model, hp = _make_model(batch_norm=1)
        hp = dict(hp, optimizer='sgd')
        losses_s, params_s = _run_steps(model, make_train_functions(model, hp),
                                        n_steps=4)
        mesh = make_mesh_2d(2, 4)
        losses_t, params_t = _run_steps(
            model, make_tp_train_functions(model, hp, mesh), n_steps=4)
        assert np.allclose(losses_s, losses_t, rtol=1e-5), (losses_s, losses_t)
        for (ka, a), (_, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(params_s),
                       key=lambda t: str(t[0])),
                sorted(jax.tree_util.tree_leaves_with_path(params_t),
                       key=lambda t: str(t[0]))):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5), ka

    def test_tp_only_mesh(self):
        # pure model parallelism: full batch everywhere, channels split
        model, hp = _make_model(batch_norm=0)
        losses_s, params_s = _run_steps(model, make_train_functions(model, hp))
        mesh = make_mesh_2d(1, 8, axis_names=('dp', 'tp'))
        losses_t, params_t = _run_steps(
            model, make_tp_train_functions(model, hp, mesh))
        assert np.allclose(losses_s, losses_t, rtol=1e-5)
        for (ka, a), (_, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(params_s),
                       key=lambda t: str(t[0])),
                sorted(jax.tree_util.tree_leaves_with_path(params_t),
                       key=lambda t: str(t[0]))):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5), ka

    def test_psvae_tp(self):
        # the sharding rules key on the shared conv layer names, so the
        # whole VAE family trains tensor-parallel; PS-VAE adds label heads
        # + KL terms + rng sampling on top of the conv stack
        from behavenet_tpu.models import PSVAE
        from behavenet_tpu.models.arch import load_handcrafted_arch

        a = load_handcrafted_arch([1, 32, 24], 6, None, check_memory=False)
        hp = dict(a, model_class='ps-vae', model_type='conv', n_ae_latents=6,
                  n_labels=4, learning_rate=1e-3, l2_reg=0.0,
                  rng_seed_model=0, max_n_epochs=10,
                  **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0})
        model = PSVAE(hp)
        lk = model.loss_kwargs(0)
        rs = np.random.RandomState(0)
        batches = [{'images': jnp.asarray(rs.rand(8, 32, 24, 1), dtype=jnp.float32),
                    'labels': jnp.asarray(rs.randn(8, 4), dtype=jnp.float32)}
                   for _ in range(2)]

        def run(step_fns):
            tx, train_step, _ = step_fns
            params = model.init(jax.random.PRNGKey(0))
            opt_state = tx.init(params)
            losses = []
            for i, b in enumerate(batches):
                params, opt_state, m = train_step(
                    params, opt_state, jax.random.PRNGKey(i), dict(b), lk, 0, None)
                losses.append(float(m['loss']))
            return losses

        losses_s = run(make_train_functions(model, hp))
        mesh = make_mesh_2d(2, 4)
        losses_t = run(make_tp_train_functions(model, hp, mesh))
        assert np.allclose(losses_s, losses_t, rtol=1e-4), (losses_s, losses_t)

    def test_maxpool_arch(self):
        model, hp = _make_model(batch_norm=0, channels=(8, 16), pool=True)
        losses_s, params_s = _run_steps(model, make_train_functions(model, hp))
        mesh = make_mesh_2d(2, 4)
        losses_t, _ = _run_steps(model, make_tp_train_functions(model, hp, mesh))
        assert np.allclose(losses_s, losses_t, rtol=1e-5)


class TestTPShardings:

    def test_channel_shardings_assigned(self):
        model, hp = _make_model(batch_norm=1)
        params = model.init(jax.random.PRNGKey(0))
        mesh = make_mesh_2d(2, 4)
        sh = tp_param_shardings(params, mesh)
        # conv kernels: trailing (cout) axis over tp
        spec = sh['encoder']['conv_1']['w'].spec
        assert spec == jax.sharding.PartitionSpec(None, None, None, 'tp')
        assert sh['encoder']['conv_1']['b'].spec == jax.sharding.PartitionSpec('tp')
        # bn vectors over tp, scalar count replicated
        assert sh['encoder']['bn_1']['running_mean'].spec == \
            jax.sharding.PartitionSpec('tp')
        assert sh['encoder']['bn_1']['num_batches'].spec == \
            jax.sharding.PartitionSpec()
        # dense heads replicated
        assert sh['encoder']['fc']['w'].spec == jax.sharding.PartitionSpec()

    def test_nondivisible_channels_replicate(self):
        model, hp = _make_model(batch_norm=0, channels=(6, 10, 12))
        params = model.init(jax.random.PRNGKey(0))
        mesh = make_mesh_2d(2, 4)
        sh = tp_param_shardings(params, mesh)
        assert sh['encoder']['conv_0']['w'].spec == jax.sharding.PartitionSpec()
        # 12 % 4 == 0 -> sharded even when neighbors replicate
        assert sh['encoder']['conv_2']['w'].spec == \
            jax.sharding.PartitionSpec(None, None, None, 'tp')
        # and the mixed placement still trains
        mesh = make_mesh_2d(2, 4)
        losses, _ = _run_steps(
            model, make_tp_train_functions(model, hp, mesh), n_steps=2)
        assert np.isfinite(losses).all()

    def test_params_stay_sharded_across_steps(self):
        # the train step's donated outputs must keep the tp placement, so
        # the per-step tp_shard re-commit is a no-op (no resharding copies)
        model, hp = _make_model(batch_norm=0)
        mesh = make_mesh_2d(2, 4)
        tx, train_step, _ = make_tp_train_functions(model, hp, mesh)
        params = model.init(jax.random.PRNGKey(0))
        opt_state = tx.init(params)
        batch = {'images': jnp.asarray(
            np.random.RandomState(0).rand(16, 32, 32, 1), dtype=jnp.float32)}
        params, opt_state, _ = train_step(
            params, opt_state, jax.random.PRNGKey(0), batch, {}, 0, None)
        spec = params['encoder']['conv_1']['w'].sharding.spec
        assert spec == jax.sharding.PartitionSpec(None, None, None, 'tp'), spec

    def test_nondivisible_batch_replicates(self):
        model, hp = _make_model(batch_norm=0)
        mesh = make_mesh_2d(2, 4)
        tx, train_step, _ = make_tp_train_functions(model, hp, mesh)
        params = model.init(jax.random.PRNGKey(0))
        opt_state = tx.init(params)
        # 15 frames: not divisible by dp=2 -> replicated, still works
        batch = {'images': jnp.asarray(
            np.random.RandomState(0).rand(15, 32, 32, 1), dtype=jnp.float32)}
        params, opt_state, m = train_step(
            params, opt_state, jax.random.PRNGKey(0), batch, {}, 0, None)
        assert np.isfinite(float(m['loss']))
