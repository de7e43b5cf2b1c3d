"""AE family: forward shapes, gradient flow, arch handling, model variants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from behavenet_tpu.models import arch
from behavenet_tpu.models.aes import AE, ConditionalAE, AEMSP
from behavenet_tpu.models.vaes import VAE, BetaTCVAE, PSVAE, MSPSVAE, ConditionalVAE


def make_hparams(model_class='ae', n_latents=6, n_labels=4, img=(1, 32, 24), **kwargs):
    a = arch.load_handcrafted_arch(
        list(img), n_latents, None, check_memory=False)
    hp = {
        'model_class': model_class,
        'model_type': 'conv',
        'n_ae_latents': n_latents,
        'n_input_channels': img[0],
        'y_pixels': img[1],
        'x_pixels': img[2],
        'rng_seed_model': 0,
        'max_n_epochs': 10,
    }
    hp.update(a)
    if model_class in ('cond-ae', 'cond-vae', 'cond-ae-msp', 'ps-vae', 'msps-vae'):
        hp['n_labels'] = n_labels
    hp.update(kwargs)
    return hp


class TestAE:

    def test_forward_shapes(self):
        hp = make_hparams()
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.zeros((7, 32, 24, 1))
        y, z = model.forward(params, x)
        assert y.shape == (7, 32, 24, 1)
        assert z.shape == (7, 6)

    def test_output_in_unit_interval(self):
        hp = make_hparams()
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.array(np.random.RandomState(0).rand(5, 32, 24, 1), dtype=jnp.float32)
        y, _ = model.forward(params, x)
        assert (np.asarray(y) >= 0).all() and (np.asarray(y) <= 1).all()

    def test_loss_and_grads(self):
        hp = make_hparams()
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        batch = {'images': jnp.array(np.random.RandomState(0).rand(5, 32, 24, 1),
                                     dtype=jnp.float32)}
        (loss, metrics), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
            params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(grads))
        assert gnorm > 0

    def test_subpixel_decoder_matches_dilated(self):
        """The automatic subpixel block for tiny-Cout decoder layers is an
        exact rearrangement: same params -> same reconstruction + grads."""
        hp_on = make_hparams()          # subpixel_decoder defaults to True
        hp_off = make_hparams(subpixel_decoder=False)
        m_on, m_off = AE(hp_on), AE(hp_off)
        # the default arch's final decoder layer has Cout=1 -> block engaged
        assert any(s.get('block') for s in m_on.decoding.layers
                   if s['type'] == 'convtranspose')
        assert not any(s.get('block') for s in m_off.decoding.layers
                       if s['type'] == 'convtranspose')
        params = m_on.init(jax.random.PRNGKey(0))
        batch = {'images': jnp.array(np.random.RandomState(0).rand(5, 32, 24, 1),
                                     dtype=jnp.float32)}
        (l0, _), g0 = jax.value_and_grad(m_off.loss_fn, has_aux=True)(
            params, batch, jax.random.PRNGKey(1))
        (l1, _), g1 = jax.value_and_grad(m_on.loss_fn, has_aux=True)(
            params, batch, jax.random.PRNGKey(1))
        assert np.allclose(float(l0), float(l1), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_bf16_pipeline_matches_f32(self):
        """bf16 activation chain: close to f32 forward; f32 outputs + grads."""
        x = jnp.array(np.random.RandomState(0).rand(5, 32, 24, 1), dtype=jnp.float32)
        outs = {}
        for name, extra in (('f32', {}),
                            ('pipe', {'compute_dtype': jnp.bfloat16,
                                      'bf16_pipeline': True})):
            hp = make_hparams(**extra)
            model = AE(hp)
            params = model.init(jax.random.PRNGKey(0))
            y, z = model.forward(params, x)
            assert y.dtype == jnp.float32 and z.dtype == jnp.float32
            outs[name] = np.asarray(y)
        assert np.abs(outs['f32'] - outs['pipe']).max() < 1e-2
        hp = make_hparams(compute_dtype=jnp.bfloat16, bf16_pipeline=True)
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        grads = jax.grad(lambda p: model.loss_fn(p, {'images': x}, None)[0])(params)
        for g in jax.tree_util.tree_leaves(grads):
            assert g.dtype == jnp.float32
            assert np.isfinite(np.asarray(g)).all()

    def test_linear_ae_tied_weights(self):
        hp = make_hparams()
        hp['model_type'] = 'linear'
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        # decoder has only a bias; reconstruction uses transposed encoder weights
        assert set(params['decoder'].keys()) == {'b'}
        x = jnp.array(np.random.RandomState(0).rand(5, 32, 24, 1), dtype=jnp.float32)
        y, z = model.forward(params, x)
        assert y.shape == x.shape
        expected = np.asarray(z) @ np.asarray(params['encoder']['w']).T + \
            np.asarray(params['decoder']['b'])
        assert np.allclose(np.asarray(y).reshape(5, -1), expected, atol=1e-3)

    def test_valid_padding_arch(self):
        hp = make_hparams()
        # rebuild with valid padding (3 layers so dims stay positive on 32x24)
        base_arch = {
            'ae_network_type': 'strides_only',
            'ae_padding_type': 'valid',
            'ae_batch_norm': 0,
            'symmetric_arch': 1,
            'ae_encoding_n_channels': [16, 32, 64],
            'ae_encoding_kernel_size': [5, 5, 3],
            'ae_encoding_stride_size': [2, 2, 2],
            'ae_encoding_layer_type': ['conv', 'conv', 'conv'],
            'ae_decoding_last_FF_layer': 0,
            'ae_input_dim': [1, 32, 24],
            'n_ae_latents': 6,
        }
        base_arch = arch.get_handcrafted_dims(base_arch, symmetric=True)
        hp.update(base_arch)
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.zeros((3, 32, 24, 1))
        y, z = model.forward(params, x)
        assert y.shape == (3, 32, 24, 1)

    def test_maxpool_arch(self):
        hp = make_hparams()
        mp_arch = {
            'ae_network_type': 'max_pooling',
            'ae_padding_type': 'same',
            'ae_batch_norm': 0,
            'symmetric_arch': 1,
            'ae_encoding_n_channels': [16, 16, 32, 32],
            'ae_encoding_kernel_size': [5, 2, 5, 2],
            'ae_encoding_stride_size': [1, 2, 1, 2],
            'ae_encoding_layer_type': ['conv', 'maxpool', 'conv', 'maxpool'],
            'ae_decoding_last_FF_layer': 0,
            'ae_input_dim': [1, 32, 24],
            'n_ae_latents': 6,
        }
        mp_arch = arch.get_handcrafted_dims(mp_arch, symmetric=True)
        hp.update(mp_arch)
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.array(np.random.RandomState(0).rand(3, 32, 24, 1), dtype=jnp.float32)
        y, z = model.forward(params, x)
        assert y.shape == (3, 32, 24, 1)
        assert z.shape == (3, 6)

    def test_sess_io_layers(self):
        hp = make_hparams(fit_sess_io_layers=True, n_datasets=3)
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        assert params['encoder']['conv_0']['w'].shape[0] == 3
        x = jnp.zeros((2, 32, 24, 1))
        y0, _ = model.forward(params, x, dataset=0)
        y2, _ = model.forward(params, x, dataset=2)
        assert y0.shape == y2.shape == (2, 32, 24, 1)


class TestConditionalAE:

    def test_forward(self):
        hp = make_hparams('cond-ae', conditional_encoder=False)
        model = ConditionalAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.zeros((4, 32, 24, 1))
        labels = jnp.zeros((4, 4))
        y, z = model.forward(params, x, labels=labels)
        assert y.shape == (4, 32, 24, 1)
        assert z.shape == (4, 6)


class TestAEMSP:

    def test_forward_and_loss(self):
        hp = make_hparams('cond-ae-msp', **{'msp.alpha': 1.0})
        model = AEMSP(hp)
        params = model.init(jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        batch = {
            'images': jnp.array(rs.rand(5, 32, 24, 1), dtype=jnp.float32),
            'labels': jnp.array(rs.randn(5, 4), dtype=jnp.float32),
        }
        loss, metrics = model.loss_fn(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert set(metrics) == {'loss', 'loss_mse', 'loss_msp', 'labels_r2'}

    def test_orthogonal_matrix(self):
        hp = make_hparams('cond-ae-msp', **{'msp.alpha': 1.0})
        model = AEMSP(hp)
        params = model.init(jax.random.PRNGKey(0))
        params = AEMSP.create_orthogonal_matrix(params)
        U = np.asarray(params['U'])
        assert U.shape == (6, 6)
        # rows n_labels: are orthogonal to projection rows
        M = np.asarray(params['projection']['w']).T
        assert np.allclose(M @ U[4:].T, 0, atol=1e-5)

    def test_latents_fewer_than_labels_raises(self):
        hp = make_hparams('cond-ae-msp', n_latents=2, **{'msp.alpha': 1.0})
        with pytest.raises(ValueError):
            AEMSP(hp)


class TestVAEs:

    def test_vae_forward_and_loss(self):
        hp = make_hparams('vae', **{'vae.beta': 4.0})
        model = VAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        batch = {'images': jnp.array(np.random.RandomState(0).rand(5, 32, 24, 1),
                                     dtype=jnp.float32)}
        loss, metrics = model.loss_fn(
            params, batch, jax.random.PRNGKey(1), **model.loss_kwargs(0))
        assert np.isfinite(float(loss))
        assert 'loss_kl' in metrics

    def test_vae_beta_schedule(self):
        hp = make_hparams('vae', **{'vae.beta': 4.0, 'vae.beta_anneal_epochs': 5})
        model = VAE(hp)
        assert model.beta_vals[0] == 0
        assert np.isclose(model.beta_vals[4], 4.0)

    def test_reparam_uses_exp_logvar(self):
        """Reference quirk: std = exp(logvar), not exp(logvar/2) (vaes.py:33)."""
        from behavenet_tpu.models.vaes import reparameterize
        key = jax.random.PRNGKey(0)
        mu = jnp.zeros((2000, 1))
        logvar = jnp.full((2000, 1), 1.0)
        z = reparameterize(key, mu, logvar)
        assert abs(float(jnp.std(z)) - np.exp(1.0)) < 0.2

    def test_beta_tcvae_loss(self):
        hp = make_hparams('beta-tcvae', **{'beta_tcvae.beta': 5.0})
        model = BetaTCVAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        batch = {'images': jnp.array(np.random.RandomState(0).rand(6, 32, 24, 1),
                                     dtype=jnp.float32)}
        loss, metrics = model.loss_fn(
            params, batch, jax.random.PRNGKey(1), **model.loss_kwargs(0))
        assert np.isfinite(float(loss))
        assert {'loss_mi', 'loss_tc', 'loss_dwkl'} <= set(metrics)

    def test_cond_vae(self):
        hp = make_hparams('cond-vae', conditional_encoder=False, **{'vae.beta': 1.0})
        model = ConditionalVAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        batch = {
            'images': jnp.array(rs.rand(5, 32, 24, 1), dtype=jnp.float32),
            'labels': jnp.array(rs.randn(5, 4), dtype=jnp.float32),
        }
        loss, _ = model.loss_fn(params, batch, jax.random.PRNGKey(1),
                                **model.loss_kwargs(0))
        assert np.isfinite(float(loss))

    def test_cond_vae_conditional_encoder(self):
        """cond-vae + conditional_encoder trains here; the reference crashes
        on this advertised combination (its encoder widens the input
        channels for cond-ae only, reference aes.py:130-137 vs the concat
        at vaes.py:266)."""
        hp = make_hparams('cond-vae', conditional_encoder=True, **{'vae.beta': 1.0})
        model = ConditionalVAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        # first conv widened by n_labels/2 one-hot map channels
        assert params['encoder']['conv_0']['w'].shape[2] == 1 + hp['n_labels'] // 2
        rs = np.random.RandomState(0)
        oh = np.zeros((5, 32, 24, hp['n_labels'] // 2), np.float32)
        oh[:, 3, 4, :] = 1.0
        batch = {
            'images': jnp.array(rs.rand(5, 32, 24, 1), dtype=jnp.float32),
            'labels': jnp.array(rs.randn(5, 4), dtype=jnp.float32),
            'labels_sc': jnp.asarray(oh),
        }
        loss, _ = model.loss_fn(params, batch, jax.random.PRNGKey(1),
                                **model.loss_kwargs(0))
        assert np.isfinite(float(loss))


class TestPSVAE:

    def test_heads_orthogonal(self):
        hp = make_hparams('ps-vae', **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0})
        model = PSVAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        A = np.asarray(params['encoder']['A'])  # (n_latents, n_labels)
        B = np.asarray(params['encoder']['B'])
        assert np.allclose(A.T @ B, 0, atol=1e-5)
        assert np.allclose(A.T @ A, np.eye(4), atol=1e-5)

    def test_loss(self):
        hp = make_hparams('ps-vae', **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0})
        model = PSVAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        batch = {
            'images': jnp.array(rs.rand(6, 32, 24, 1), dtype=jnp.float32),
            'labels': jnp.array(rs.randn(6, 4), dtype=jnp.float32),
        }
        loss, metrics = model.loss_fn(params, batch, jax.random.PRNGKey(1),
                                      **model.loss_kwargs(0))
        assert np.isfinite(float(loss))
        assert 'label_r2' in metrics

    def test_frozen_heads_get_no_grads(self):
        hp = make_hparams('ps-vae', **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0})
        model = PSVAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        batch = {
            'images': jnp.array(rs.rand(6, 32, 24, 1), dtype=jnp.float32),
            'labels': jnp.array(rs.randn(6, 4), dtype=jnp.float32),
        }
        grads = jax.grad(lambda p: model.loss_fn(p, batch, jax.random.PRNGKey(1),
                                                 **model.loss_kwargs(0))[0])(params)
        assert float(jnp.abs(grads['encoder']['A']).max()) == 0
        assert float(jnp.abs(grads['encoder']['B']).max()) == 0
        assert float(jnp.abs(grads['encoder']['D']['d']).max()) > 0

    def test_inverse_transform_roundtrip(self):
        hp = make_hparams('ps-vae', **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0})
        model = PSVAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        z = np.random.RandomState(0).randn(5, 6).astype(np.float32)
        tr = model.get_transformed_latents(params, z)
        rt = model.get_inverse_transformed_latents(params, tr)
        assert np.allclose(np.asarray(rt), z, atol=1e-4)


class TestMSPSVAE:

    def test_loss_multi_session(self):
        hp = make_hparams(
            'msps-vae', n_latents=10,
            **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0, 'ps_vae.delta': 1.0,
               'n_background': 3, 'n_sessions_per_batch': 2})
        model = MSPSVAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        rs = np.random.RandomState(0)
        seg = 12
        batch = {
            'images': jnp.array(rs.rand(2 * seg, 32, 24, 1), dtype=jnp.float32),
            'labels': jnp.array(rs.randn(2 * seg, 4), dtype=jnp.float32),
        }
        loss, metrics = model.loss_fn(params, batch, jax.random.PRNGKey(1),
                                      seg_lens=(seg, seg), **model.loss_kwargs(0))
        assert np.isfinite(float(loss))
        assert 'loss_triplet' in metrics

    def test_requires_multi_session(self):
        hp = make_hparams(
            'msps-vae', n_latents=10,
            **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0, 'ps_vae.delta': 1.0,
               'n_sessions_per_batch': 1})
        with pytest.raises(ValueError):
            MSPSVAE(hp)

    def test_get_predicted_labels(self):
        # regression: PSVAE's version unpacked a 4-tuple and crashed on the
        # msps encoder's 5-tuple (plot_label_reconstructions path)
        hp = make_hparams(
            'msps-vae', n_latents=10,
            **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0, 'ps_vae.delta': 1.0,
               'n_background': 3, 'n_sessions_per_batch': 2})
        model = MSPSVAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.array(np.random.RandomState(0).rand(5, 32, 24, 1), dtype=jnp.float32)
        y_hat = model.get_predicted_labels(params, x)
        assert y_hat.shape == (5, 4)
        # mean path equals D applied to the supervised head
        z_s, _, _, _, _ = model.encode(params, x)
        from behavenet_tpu.models import base
        np.testing.assert_allclose(
            np.asarray(y_hat),
            np.asarray(base.diag_linear(params['encoder']['D'], z_s)), atol=1e-6)
        # sampling path runs and differs from the mean path
        y_s = model.get_predicted_labels(params, x, use_mean=False,
                                         rng=jax.random.PRNGKey(1))
        assert y_s.shape == (5, 4)
        assert not np.allclose(np.asarray(y_s), np.asarray(y_hat))


class TestBatchNorm:

    def test_batch_norm_arch(self):
        hp = make_hparams(ae_batch_norm=True)
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        assert 'bn_0' in params['encoder']
        assert 'bn_0' in params['decoder']
        # last decoder layer has no bn (reference aes.py:326-330)
        n_dec = len(hp['ae_decoding_n_channels'])
        assert 'bn_%d' % (n_dec - 1) not in params['decoder']
        x = jnp.array(np.random.RandomState(0).rand(6, 32, 24, 1), dtype=jnp.float32)
        y, z = model.forward(params, x)
        assert y.shape == (6, 32, 24, 1)
        loss, _ = model.loss_fn(params, {'images': x}, jax.random.PRNGKey(1))
        grads = jax.grad(lambda p: model.loss_fn(p, {'images': x},
                                                 jax.random.PRNGKey(1))[0])(params)
        gnorm = float(jnp.abs(grads['encoder']['bn_0']['gamma']).max())
        assert np.isfinite(float(loss)) and gnorm > 0

    def test_batch_norm_normalizes(self):
        from behavenet_tpu.ops.conv import batch_norm
        x = jnp.array(np.random.RandomState(0).randn(10, 8, 8, 4) * 5 + 3,
                      dtype=jnp.float32)
        out = batch_norm(x, jnp.ones(4), jnp.zeros(4))
        out = np.asarray(out)
        assert np.allclose(out.mean(axis=(0, 1, 2)), 0, atol=1e-4)
        assert np.allclose(out.std(axis=(0, 1, 2)), 1, atol=1e-2)
