"""AOT serving exports: round-trip parity, shape polymorphism, store load."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from behavenet_tpu import serving
from behavenet_tpu.models import AE, Decoder, PSVAE, VAE, arch
from behavenet_tpu.models import base as models_base


def _ae_hparams(model_class='ae', img=(1, 32, 24), n_latents=6, **kw):
    a = arch.load_handcrafted_arch(list(img), n_latents, None,
                                   check_memory=False)
    return dict(a, model_class=model_class, model_type='conv',
                n_ae_latents=n_latents, n_input_channels=img[0],
                y_pixels=img[1], x_pixels=img[2], learning_rate=1e-4,
                l2_reg=0.0, rng_seed_model=0, **kw)


@pytest.fixture(scope='module')
def images():
    return np.random.RandomState(0).randint(
        0, 255, (5, 32, 24, 1)).astype('uint8')


class TestAEFamily:

    def test_ae_roundtrip(self, tmp_path, images):
        model = AE(_ae_hparams())
        params = model.init(jax.random.PRNGKey(0))
        man = serving.export_model(model, params, str(tmp_path))
        assert sorted(man['artifacts']) == ['encode', 'reconstruct']
        assert man['skipped'] == {}

        b = serving.load_bundle(str(tmp_path))
        assert b.names() == ['encode', 'reconstruct']
        ref_recon, ref_z = model.forward(
            params, jnp.asarray(images, jnp.float32) / 255.0)
        np.testing.assert_allclose(np.asarray(b.encode(images)),
                                   np.asarray(ref_z), atol=1e-5)
        np.testing.assert_allclose(np.asarray(b.reconstruct(images)),
                                   np.asarray(ref_recon), atol=1e-5)

    def test_batch_polymorphism(self, tmp_path, images):
        model = AE(_ae_hparams())
        params = model.init(jax.random.PRNGKey(0))
        serving.export_model(model, params, str(tmp_path), names=['encode'])
        b = serving.load_bundle(str(tmp_path))
        # one artifact, three batch sizes — incl. 1
        for n in (1, 3, 5):
            assert np.asarray(b.encode(images[:n])).shape == (n, 6)

    def test_two_view_export_not_skipped(self, tmp_path):
        # Regression: conv2d's s2d grad-w batch gate compared the (symbolic)
        # batch dim to an int at trace time; under jax.export shape
        # polymorphism that raised InconclusiveDimensionOperation for every
        # multi-channel first conv (Cin*s^2 <= 16), and export_model silently
        # skipped every conv head of 2-view (Musall) models.
        imgs = np.random.RandomState(1).randint(
            0, 255, (5, 32, 24, 2)).astype('uint8')
        model = AE(_ae_hparams(img=(2, 32, 24)))
        params = model.init(jax.random.PRNGKey(0))
        man = serving.export_model(model, params, str(tmp_path))
        assert man['skipped'] == {}
        assert sorted(man['artifacts']) == ['encode', 'reconstruct']
        b = serving.load_bundle(str(tmp_path))
        ref_recon, ref_z = model.forward(
            params, jnp.asarray(imgs, jnp.float32) / 255.0)
        np.testing.assert_allclose(np.asarray(b.encode(imgs)),
                                   np.asarray(ref_z), atol=1e-5)
        np.testing.assert_allclose(np.asarray(b.reconstruct(imgs)),
                                   np.asarray(ref_recon), atol=1e-5)

    def test_vae_encodes_posterior_mean(self, tmp_path, images):
        hp = _ae_hparams(model_class='vae', **{'vae.beta': 1.0})
        model = VAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        man = serving.export_model(model, params, str(tmp_path))
        assert 'encode' in man['artifacts']
        b = serving.load_bundle(str(tmp_path))
        ref = model.forward(params, jnp.asarray(images, jnp.float32) / 255.0,
                            rng=jax.random.PRNGKey(0), use_mean=True)[1]
        np.testing.assert_allclose(np.asarray(b.encode(images)),
                                   np.asarray(ref), atol=1e-5)

    def test_psvae_encode_latent_head(self, tmp_path, images):
        hp = _ae_hparams(model_class='ps-vae', n_labels=2,
                         **{'ps_vae.alpha': 1.0, 'ps_vae.beta': 1.0})
        model = PSVAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        man = serving.export_model(model, params, str(tmp_path))
        assert 'encode' in man['artifacts']
        b = serving.load_bundle(str(tmp_path))
        ref = model.forward(params, jnp.asarray(images, jnp.float32) / 255.0,
                            rng=jax.random.PRNGKey(0), use_mean=True)[2]
        np.testing.assert_allclose(np.asarray(b.encode(images)),
                                   np.asarray(ref), atol=1e-5)


class TestConditional:

    def test_cond_ae_two_input_heads(self, tmp_path, images):
        from behavenet_tpu.models import ConditionalAE
        hp = _ae_hparams(model_class='cond-ae', n_labels=3,
                         conditional_encoder=False)
        model = ConditionalAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        man = serving.export_model(model, params, str(tmp_path))
        assert sorted(man['artifacts']) == ['encode', 'reconstruct']
        b = serving.load_bundle(str(tmp_path))
        y = np.random.RandomState(1).randn(5, 3).astype('float32')
        ref = model.forward(params, jnp.asarray(images, jnp.float32) / 255.0,
                            labels=jnp.asarray(y))[0]
        np.testing.assert_allclose(np.asarray(b.reconstruct(images, y)),
                                   np.asarray(ref), atol=1e-5)

    def test_cond_ae_conditional_encoder_three_input_heads(self, tmp_path, images):
        """conditional_encoder exports carry the one-hot 2D label maps as a
        third input (n_labels must be even: (x, y) coordinate pairs)."""
        from behavenet_tpu.models import ConditionalAE
        hp = _ae_hparams(model_class='cond-ae', n_labels=2,
                         conditional_encoder=True)
        model = ConditionalAE(hp)
        params = model.init(jax.random.PRNGKey(0))
        man = serving.export_model(model, params, str(tmp_path))
        assert sorted(man['artifacts']) == ['encode', 'reconstruct']
        b = serving.load_bundle(str(tmp_path))
        rs = np.random.RandomState(1)
        y = rs.randn(5, 2).astype('float32')
        y2d = np.zeros((5,) + images.shape[1:3] + (1,), 'float32')
        y2d[:, 2, 3, 0] = 1.0
        ref = model.forward(params, jnp.asarray(images, jnp.float32) / 255.0,
                            labels=jnp.asarray(y), labels_2d=jnp.asarray(y2d))[0]
        np.testing.assert_allclose(np.asarray(b.reconstruct(images, y, y2d)),
                                   np.asarray(ref), atol=1e-5)


class TestDecoder:

    def _decoder(self):
        hp = dict(model_class='neural-ae', model_type='mlp', input_size=12,
                  output_size=4, n_hid_layers=1, n_hid_units=16, n_lags=2,
                  n_max_lags=2, activation='relu', noise_dist='gaussian',
                  learning_rate=1e-3, rng_seed_model=0, l2_reg=0.0)
        dec = Decoder(hp)
        return dec, dec.init(jax.random.PRNGKey(0))

    def test_predict_roundtrip(self, tmp_path):
        dec, params = self._decoder()
        man = serving.export_model(dec, params, str(tmp_path))
        assert 'predict' in man['artifacts']
        b = serving.load_bundle(str(tmp_path))
        x = np.random.RandomState(1).randn(30, 12).astype('float32')
        ref = dec.forward(params, x)
        ref = ref[0] if isinstance(ref, tuple) else ref
        np.testing.assert_allclose(np.asarray(b.predict(x)),
                                   np.asarray(ref), atol=1e-5)


class TestARHMM:

    def test_states_and_gamma(self, tmp_path):
        from behavenet_tpu.models.arhmm import ARHMM
        rs = np.random.RandomState(0)
        datas = [np.cumsum(rs.randn(90, 3).astype('float32') * .1, 0)
                 for _ in range(2)]
        hmm = ARHMM(3, 3, lags=1, observations='ar',
                    transitions='stationary')
        hmm.initialize(datas)
        hmm.fit(datas, num_iters=2)
        man = serving.export_model(hmm, None, str(tmp_path))
        assert sorted(man['artifacts']) == ['gamma', 'states']
        # scans over time require T >= 2; recorded for the server
        assert man['artifacts']['states']['min_leading_dim'] == 2
        b = serving.load_bundle(str(tmp_path))
        np.testing.assert_array_equal(
            np.asarray(b.states(datas[0])), hmm.most_likely_states(datas[0]))
        np.testing.assert_allclose(
            np.asarray(b.gamma(datas[0])), hmm.expected_states(datas[0]),
            atol=1e-4)
        # length-polymorphic: one artifact serves any trial length
        assert np.asarray(b.states(datas[1][:47])).shape == (47,)


class TestExportVersion:

    def test_from_store_version_dir(self, tmp_path, images):
        hp = _ae_hparams()
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        vdir = tmp_path / 'version_0'
        vdir.mkdir()
        with open(vdir / 'meta_tags.pkl', 'wb') as f:
            pickle.dump(hp, f)
        models_base.save_params(params, str(vdir / 'best_val_model.pt'))
        out = str(tmp_path / 'srv')
        man = serving.export_version(str(vdir), out)
        assert 'encode' in man['artifacts']
        b = serving.load_bundle(out)
        ref = model.forward(params,
                            jnp.asarray(images, jnp.float32) / 255.0)[1]
        np.testing.assert_allclose(np.asarray(b.encode(images)),
                                   np.asarray(ref), atol=1e-5)

    def test_cli(self, tmp_path, images, capsys):
        # behavenet-export-serving console script (serving.cli) end to end
        hp = _ae_hparams()
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        vdir = tmp_path / 'version_0'
        vdir.mkdir()
        with open(vdir / 'meta_tags.pkl', 'wb') as f:
            pickle.dump(hp, f)
        models_base.save_params(params, str(vdir / 'best_val_model.pt'))
        out = str(tmp_path / 'srv')
        rc = serving.cli([str(vdir), '-o', out, '--names', 'encode'])
        assert rc == 0
        assert 'exported encode' in capsys.readouterr().out
        b = serving.load_bundle(out)
        assert b.names() == ['encode']
        assert np.asarray(b.encode(images)).shape == (images.shape[0],
                                                      hp['n_ae_latents'])

    def test_manifest_written(self, tmp_path):
        model = AE(_ae_hparams())
        params = model.init(jax.random.PRNGKey(0))
        serving.export_model(model, params, str(tmp_path), names=['encode'])
        assert os.path.exists(str(tmp_path / 'manifest.json'))
        b = serving.load_bundle(str(tmp_path))
        with pytest.raises(AttributeError):
            b.reconstruct  # not exported