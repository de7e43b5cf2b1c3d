"""Torch checkpoint import: forward parity against an equivalent torch model."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from behavenet_tpu.models import AE
from behavenet_tpu.models import arch as arch_mod
from behavenet_tpu.ops import optim
from behavenet_tpu.utils.torch_import import (params_to_torch_state_dict,
                                              torch_state_dict_to_params)


def build_hparams(img=(1, 32, 24), n_latents=5, **extra):
    a = arch_mod.load_handcrafted_arch(list(img), n_latents, None, check_memory=False)
    hp = dict(a, model_type='conv', n_ae_latents=n_latents,
              n_input_channels=img[0], y_pixels=img[1], x_pixels=img[2],
              rng_seed_model=0)
    hp['model_class'] = 'ae'
    hp.update(extra)
    return hp


class TorchRefAE(nn.Module):
    """Minimal torch conv AE with the reference's state-dict naming.

    Built from the same arch dict (same-padding stride conv stack with
    LeakyReLU(0.05), FF to latents, mirrored conv-transpose decoder with
    sigmoid, optional BatchNorm2d per conv layer as in reference
    aes.py:91-97, 332-338) so a state dict from this model looks like a
    reference checkpoint for import testing.
    """

    def __init__(self, hp):
        super().__init__()
        self.hp = hp
        self.bn = bool(hp.get('ae_batch_norm', 0))
        bn_kw = dict(momentum=hp.get('ae_batch_norm_momentum', 0.1),
                     track_running_stats=hp.get('track_running_stats', True))

        # encoder
        enc = nn.ModuleDict()
        c_in = hp['ae_input_dim'][0]
        self.enc_pads = []
        for i in range(len(hp['ae_encoding_n_channels'])):
            k = hp['ae_encoding_kernel_size'][i]
            s = hp['ae_encoding_stride_size'][i]
            y0, y1 = hp['ae_encoding_y_padding'][i]
            x0, x1 = hp['ae_encoding_x_padding'][i]
            self.enc_pads.append((x0, x1, y0, y1))
            enc['conv%i' % i] = nn.Conv2d(c_in, hp['ae_encoding_n_channels'][i], k, s, 0)
            if self.bn:
                enc['batchnorm%i' % i] = nn.BatchNorm2d(
                    hp['ae_encoding_n_channels'][i], **bn_kw)
            c_in = hp['ae_encoding_n_channels'][i]
        self.enc = enc
        fc_in = hp['ae_encoding_n_channels'][-1] * hp['ae_encoding_y_dim'][-1] * \
            hp['ae_encoding_x_dim'][-1]
        self.FF_enc = nn.Linear(fc_in, hp['n_ae_latents'])

        # decoder
        first = int(np.prod(hp['ae_decoding_starting_dim']))
        self.FF_dec = nn.Linear(hp['n_ae_latents'], first)
        dec = nn.ModuleDict()
        c_in = hp['ae_decoding_starting_dim'][0]
        self.dec_pads = []
        n_dec = len(hp['ae_decoding_n_channels'])
        for i in range(n_dec):
            k = hp['ae_decoding_kernel_size'][i]
            s = hp['ae_decoding_stride_size'][i]
            y0, y1 = hp['ae_decoding_y_padding'][i]
            x0, x1 = hp['ae_decoding_x_padding'][i]
            self.dec_pads.append((x0, x1, y0, y1))
            dec['convtranspose%i' % i] = nn.ConvTranspose2d(
                c_in, hp['ae_decoding_n_channels'][i], k, s, padding=0)
            if self.bn and i < n_dec - 1:  # no BN on the last (sigmoid) layer
                dec['batchnorm%i' % i] = nn.BatchNorm2d(
                    hp['ae_decoding_n_channels'][i], **bn_kw)
            c_in = hp['ae_decoding_n_channels'][i]
        self.dec = dec

    def encode_features(self, x):
        """Conv stack -> flattened features (the reference's ``x1``)."""
        for i in range(len(self.hp['ae_encoding_n_channels'])):
            x0, x1, y0, y1 = self.enc_pads[i]
            x = F.pad(x, (x0, x1, y0, y1))
            x = self.enc['conv%i' % i](x)
            if self.bn:
                x = self.enc['batchnorm%i' % i](x)
            x = F.leaky_relu(x, 0.05)
        return x.reshape(x.shape[0], -1)

    def decode(self, z):
        """Latents -> reconstructed images through the tconv stack."""
        y = self.FF_dec(z)
        c, h, w = self.hp['ae_decoding_starting_dim']
        y = y.reshape(-1, c, h, w)
        n = len(self.hp['ae_decoding_n_channels'])
        for i in range(n):
            x0, x1, y0, y1 = self.dec_pads[i]
            y = self.dec['convtranspose%i' % i](y)
            y = F.pad(y, (-x0, -x1, -y0, -y1))
            if i == n - 1:
                y = torch.sigmoid(y)
            else:
                if self.bn:
                    y = self.dec['batchnorm%i' % i](y)
                y = F.leaky_relu(y, 0.05)
        return y

    def forward(self, x):
        z = self.FF_enc(self.encode_features(x))
        return self.decode(z), z

    def reference_state_dict(self):
        """State dict with the reference's key naming (aes.py module names)."""
        sd = {}
        for i in range(len(self.hp['ae_encoding_n_channels'])):
            sd['encoding.encoder.conv%i.weight' % i] = self.enc['conv%i' % i].weight
            sd['encoding.encoder.conv%i.bias' % i] = self.enc['conv%i' % i].bias
            if self.bn:
                bn = self.enc['batchnorm%i' % i]
                sd['encoding.encoder.batchnorm%i.weight' % i] = bn.weight
                sd['encoding.encoder.batchnorm%i.bias' % i] = bn.bias
                if bn.track_running_stats:
                    sd['encoding.encoder.batchnorm%i.running_mean' % i] = bn.running_mean
                    sd['encoding.encoder.batchnorm%i.running_var' % i] = bn.running_var
                    sd['encoding.encoder.batchnorm%i.num_batches_tracked' % i] = \
                        bn.num_batches_tracked
        sd['encoding.FF.weight'] = self.FF_enc.weight
        sd['encoding.FF.bias'] = self.FF_enc.bias
        sd['decoding.FF.weight'] = self.FF_dec.weight
        sd['decoding.FF.bias'] = self.FF_dec.bias
        for i in range(len(self.hp['ae_decoding_n_channels'])):
            sd['decoding.decoder.convtranspose%i.weight' % i] = \
                self.dec['convtranspose%i' % i].weight
            sd['decoding.decoder.convtranspose%i.bias' % i] = \
                self.dec['convtranspose%i' % i].bias
            if self.bn and ('batchnorm%i' % i) in self.dec:
                bn = self.dec['batchnorm%i' % i]
                sd['decoding.decoder.batchnorm%i.weight' % i] = bn.weight
                sd['decoding.decoder.batchnorm%i.bias' % i] = bn.bias
                if bn.track_running_stats:
                    sd['decoding.decoder.batchnorm%i.running_mean' % i] = bn.running_mean
                    sd['decoding.decoder.batchnorm%i.running_var' % i] = bn.running_var
                    sd['decoding.decoder.batchnorm%i.num_batches_tracked' % i] = \
                        bn.num_batches_tracked
        return sd


class TestTorchImport:

    def test_conv_ae_forward_parity(self):
        """Imported torch weights must reproduce the torch forward pass."""
        hp = build_hparams()
        torch.manual_seed(0)
        ref = TorchRefAE(hp).eval()

        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)

        rs = np.random.RandomState(0)
        x = rs.rand(4, 32, 24, 1).astype(np.float32)  # NHWC
        y_jax, z_jax = model.forward(params, jnp.asarray(x))

        with torch.no_grad():
            xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
            y_t, z_t = ref(xt)

        assert np.allclose(np.asarray(z_jax), z_t.numpy(), atol=1e-4), \
            'latent mismatch: %f' % np.abs(np.asarray(z_jax) - z_t.numpy()).max()
        y_t_nhwc = np.transpose(y_t.numpy(), (0, 2, 3, 1))
        assert np.allclose(np.asarray(y_jax), y_t_nhwc, atol=1e-4), \
            'recon mismatch: %f' % np.abs(np.asarray(y_jax) - y_t_nhwc).max()

    def test_multichannel_nonsquare(self):
        hp = build_hparams(img=(2, 48, 32), n_latents=7)
        torch.manual_seed(1)
        ref = TorchRefAE(hp).eval()
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)
        rs = np.random.RandomState(1)
        x = rs.rand(3, 48, 32, 2).astype(np.float32)
        y_jax, z_jax = model.forward(params, jnp.asarray(x))
        with torch.no_grad():
            y_t, z_t = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        assert np.allclose(np.asarray(z_jax), z_t.numpy(), atol=1e-4)
        assert np.allclose(
            np.asarray(y_jax), np.transpose(y_t.numpy(), (0, 2, 3, 1)), atol=1e-4)


class TestTrainingParity:

    def test_short_training_trajectory_matches_torch(self):
        """Same init + same batches + Adam(amsgrad): losses match for 5 steps."""
        hp = build_hparams()
        torch.manual_seed(0)
        ref = TorchRefAE(hp)

        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)

        lr = 1e-3
        import optax
        tx = optim.amsgrad(lr)
        opt_state = tx.init(params)
        opt_t = torch.optim.Adam(ref.parameters(), lr=lr, amsgrad=True)

        rs = np.random.RandomState(0)
        losses_jax, losses_torch = [], []
        for step in range(5):
            x = rs.rand(8, 32, 24, 1).astype(np.float32)
            batch = {'images': jnp.asarray(x)}

            def lf(p):
                return model.loss_fn(p, batch, jax.random.PRNGKey(0))[0]
            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            losses_jax.append(float(loss))

            opt_t.zero_grad()
            xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
            y_t, _ = ref(xt)
            loss_t = torch.mean((y_t - xt) ** 2)
            loss_t.backward()
            opt_t.step()
            losses_torch.append(float(loss_t))

        assert np.allclose(losses_jax, losses_torch, rtol=1e-3, atol=1e-5), \
            'jax %s vs torch %s' % (losses_jax, losses_torch)


class TestBatchNormParity:
    """BatchNorm running statistics: torch train/eval semantics end to end
    (reference aes.py:92-95 defaults momentum=0.1, track_running_stats=True)."""

    def _lockstep(self, momentum):
        """5 SGD steps in lockstep with torch (SGD so the update rule is
        bit-identical on both sides: with Adam the per-parameter
        normalization chaotically amplifies f32 rounding noise through the
        batch-norm layers, ~1e-2 relative loss drift by step 5 even though
        forward/grads agree to 1e-8)."""
        import optax
        from behavenet_tpu.fitting.training import merge_state
        hp = build_hparams(ae_batch_norm=1, ae_batch_norm_momentum=momentum,
                           learning_rate=1e-2, l2_reg=0)
        torch.manual_seed(0)
        ref = TorchRefAE(hp)

        model = AE(hp)
        assert model.has_state
        params = model.init(jax.random.PRNGKey(0))
        params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)
        tx = optax.sgd(1e-2)
        opt_state = tx.init(params)

        opt_t = torch.optim.SGD(ref.parameters(), lr=1e-2)
        ref.train()
        rs = np.random.RandomState(0)
        for step in range(5):
            x = rs.rand(8, 32, 24, 1).astype(np.float32)

            def lf(p):
                return model.loss_fn(p, {'images': jnp.asarray(x)},
                                     jax.random.PRNGKey(0), train=True)
            (loss_j, metrics), grads = jax.value_and_grad(lf, has_aux=True)(params)
            state = metrics.pop('_state')
            updates, opt_state = tx.update(grads, opt_state, params)
            params = merge_state(optax.apply_updates(params, updates), state)

            opt_t.zero_grad()
            xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
            y_t, _ = ref(xt)
            loss_t = torch.mean((y_t - xt) ** 2)
            loss_t.backward()
            opt_t.step()
            np.testing.assert_allclose(
                float(loss_j), float(loss_t.detach()), rtol=1e-4, atol=1e-6)
        return hp, ref, model, params

    def test_running_stats_and_eval_parity(self):
        """5 lockstep train steps: running stats track torch; eval outputs match."""
        hp, ref, model, params = self._lockstep(momentum=0.1)

        # running stats of the first encoder BN layer must match torch's
        bn_t = ref.enc['batchnorm0']
        bn_j = params['encoder']['bn_0']
        np.testing.assert_allclose(np.asarray(bn_j['running_mean']),
                                   bn_t.running_mean.numpy(), rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bn_j['running_var']),
                                   bn_t.running_var.numpy(), rtol=1e-3, atol=1e-5)
        assert float(bn_j['num_batches']) == float(bn_t.num_batches_tracked)

        # eval mode uses running stats on both sides
        ref.eval()
        rs = np.random.RandomState(7)
        x = rs.rand(4, 32, 24, 1).astype(np.float32)
        y_jax, _ = model.forward(params, jnp.asarray(x))
        with torch.no_grad():
            y_t, _ = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        np.testing.assert_allclose(
            np.asarray(y_jax), np.transpose(y_t.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=1e-4)

    def test_cumulative_momentum(self):
        """momentum=None (the shipped configs' null) -> torch cumulative average."""
        hp, ref, model, params = self._lockstep(momentum=None)
        bn_t = ref.enc['batchnorm0']
        bn_j = params['encoder']['bn_0']
        np.testing.assert_allclose(np.asarray(bn_j['running_mean']),
                                   bn_t.running_mean.numpy(), rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bn_j['running_var']),
                                   bn_t.running_var.numpy(), rtol=1e-3, atol=1e-5)

    def test_train_step_merges_state(self):
        """The real jitted train_step updates running stats and keeps
        '_state' out of the logged metrics."""
        from behavenet_tpu.fitting.training import make_train_functions
        hp = build_hparams(ae_batch_norm=1, ae_batch_norm_momentum=0.1,
                           learning_rate=1e-3, l2_reg=1e-4)
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(0))
        tx, train_step, eval_step = make_train_functions(model, hp)
        opt_state = tx.init(params)
        rs = np.random.RandomState(0)
        x = rs.rand(8, 32, 24, 1).astype(np.float32)
        axes = (0, 1, 2)
        # expected first-step stats from the first conv's output
        from behavenet_tpu.ops import conv as ops
        spec = model.encoding.layers[0]
        h = ops.conv2d(jnp.asarray(x), params['encoder']['conv_0']['w'],
                       params['encoder']['conv_0']['b'], spec['stride'],
                       spec['pad_y'], spec['pad_x'])
        n = int(np.prod([h.shape[a] for a in axes]))
        exp_mean = 0.1 * np.mean(np.asarray(h), axis=axes)
        exp_var = 0.9 * 1.0 + 0.1 * np.var(np.asarray(h), axis=axes) * n / (n - 1)
        params, opt_state, metrics = train_step(
            params, opt_state, jax.random.PRNGKey(1),
            {'images': jnp.asarray(x)}, {}, 0, None)
        assert '_state' not in metrics
        bn = params['encoder']['bn_0']
        np.testing.assert_allclose(np.asarray(bn['running_mean']), exp_mean,
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(bn['running_var']), exp_var,
                                   rtol=1e-5, atol=1e-7)
        assert float(bn['num_batches']) == 1.0
        # weight decay must not have touched the running stats (l2_reg>0)
        metrics = eval_step(params, jax.random.PRNGKey(2),
                            {'images': jnp.asarray(x)}, {}, 0, None)
        assert '_state' not in metrics

    def test_no_tracking_uses_batch_stats(self):
        """track_running_stats=False keeps round-2 behavior (batch stats always)."""
        hp = build_hparams(ae_batch_norm=1, track_running_stats=False)
        torch.manual_seed(0)
        ref = TorchRefAE(hp).eval()
        model = AE(hp)
        assert not model.has_state
        params = model.init(jax.random.PRNGKey(0))
        params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)
        assert 'running_mean' not in params['encoder']['bn_0']
        rs = np.random.RandomState(3)
        x = rs.rand(4, 32, 24, 1).astype(np.float32)
        y_jax, _ = model.forward(params, jnp.asarray(x))
        with torch.no_grad():
            y_t, _ = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        np.testing.assert_allclose(
            np.asarray(y_jax), np.transpose(y_t.numpy(), (0, 2, 3, 1)),
            rtol=1e-3, atol=1e-4)


def _load_reference_named(ref, sd):
    """Load a reference-named state dict into a TorchRefAE instance."""
    renamed = {}
    for k, v in sd.items():
        k2 = (k.replace('encoding.encoder.', 'enc.')
               .replace('decoding.decoder.', 'dec.')
               .replace('encoding.FF.', 'FF_enc.')
               .replace('decoding.FF.', 'FF_dec.'))
        renamed[k2] = torch.as_tensor(np.asarray(v))
    ref.load_state_dict(renamed)


class TestTorchExport:
    """params -> reference state dict: the inverse of the import mapping."""

    @pytest.mark.parametrize('bn', [0, 1])
    def test_roundtrip_export_import(self, bn):
        """export(params) imported into a differently-seeded init == params."""
        hp = build_hparams(ae_batch_norm=bn)
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(7))
        sd = params_to_torch_state_dict(model, params)
        other = model.init(jax.random.PRNGKey(8))  # every mapped leaf differs
        back = torch_state_dict_to_params(sd, model, other)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
        assert len(flat_a) == len(flat_b)
        for path, leaf in flat_a:
            np.testing.assert_allclose(
                np.asarray(leaf, dtype=np.float32),
                np.asarray(flat_b[path], dtype=np.float32),
                rtol=1e-6, atol=1e-6, err_msg=str(path))

    def test_exported_weights_drive_torch_forward(self):
        """A torch model loaded from the export reproduces the jax forward."""
        hp = build_hparams()
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(3))
        torch.manual_seed(0)
        ref = TorchRefAE(hp).eval()
        _load_reference_named(ref, params_to_torch_state_dict(model, params))

        rs = np.random.RandomState(5)
        x = rs.rand(4, 32, 24, 1).astype(np.float32)
        y_jax, z_jax = model.forward(params, jnp.asarray(x))
        with torch.no_grad():
            y_t, z_t = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        np.testing.assert_allclose(np.asarray(z_jax), z_t.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(y_jax), np.transpose(y_t.numpy(), (0, 2, 3, 1)),
            rtol=1e-4, atol=1e-5)

    def test_save_checkpoint_file(self, tmp_path):
        """save_torch_ae_checkpoint writes a torch.load-able state dict."""
        from behavenet_tpu.utils.torch_import import (load_torch_ae_checkpoint,
                                                      save_torch_ae_checkpoint)
        hp = build_hparams(ae_batch_norm=1)
        model = AE(hp)
        params = model.init(jax.random.PRNGKey(1))
        fp = str(tmp_path / 'best_val_model.pt')
        save_torch_ae_checkpoint(fp, model, params)
        sd = torch.load(fp, map_location='cpu')
        assert sd['encoding.encoder.batchnorm0.num_batches_tracked'].dtype == torch.int64
        other = model.init(jax.random.PRNGKey(2))
        back = load_torch_ae_checkpoint(fp, model, other)
        np.testing.assert_allclose(
            np.asarray(back['encoder']['conv_0']['w']),
            np.asarray(params['encoder']['conv_0']['w']), rtol=1e-6)


class TestTorchExportHeads:
    """Round-trip of the non-AE heads (VAE logvar, PS-VAE A/B/D, AEMSP U)."""

    def _roundtrip(self, model, params):
        sd = params_to_torch_state_dict(model, params)
        other = jax.tree_util.tree_map(lambda x: x + 1.0,
                                       model.init(jax.random.PRNGKey(11)))
        back = torch_state_dict_to_params(sd, model, other)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
        assert len(flat_a) == len(flat_b)
        for path, leaf in flat_a:
            np.testing.assert_allclose(
                np.asarray(leaf, dtype=np.float32),
                np.asarray(flat_b[path], dtype=np.float32),
                rtol=1e-6, atol=1e-6, err_msg=str(path))

    def test_vae(self):
        from behavenet_tpu.models import VAE
        hp = build_hparams(model_class='vae')
        hp['vae.beta'] = 1.0
        model = VAE(hp)
        self._roundtrip(model, model.init(jax.random.PRNGKey(4)))

    def test_psvae(self):
        from behavenet_tpu.models import PSVAE
        hp = build_hparams(model_class='ps-vae', n_labels=2, n_background=0)
        hp['ps_vae.beta'] = 1.0
        hp['ps_vae.alpha'] = 1.0
        model = PSVAE(hp)
        self._roundtrip(model, model.init(jax.random.PRNGKey(5)))

    def test_aemsp(self):
        from behavenet_tpu.models import AEMSP
        hp = build_hparams(model_class='cond-ae-msp', n_labels=2)
        model = AEMSP(hp)
        self._roundtrip(model, model.init(jax.random.PRNGKey(6)))
