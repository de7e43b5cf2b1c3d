"""Torch checkpoint import: forward parity against an equivalent torch model."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from behavenet_tpu.models import AE
from behavenet_tpu.models import arch as arch_mod
from behavenet_tpu.utils.torch_import import torch_state_dict_to_params


def build_hparams(img=(1, 32, 24), n_latents=5):
    a = arch_mod.load_handcrafted_arch(list(img), n_latents, None, check_memory=False)
    return dict(a, model_class='ae', model_type='conv', n_ae_latents=n_latents,
                n_input_channels=img[0], y_pixels=img[1], x_pixels=img[2],
                rng_seed_model=0)


class TorchRefAE(nn.Module):
    """Minimal torch conv AE with the reference's state-dict naming.

    Built from the same arch dict (same-padding stride conv stack with
    LeakyReLU(0.05), FF to latents, mirrored conv-transpose decoder with
    sigmoid) so a state dict from this model looks like a reference
    checkpoint for import testing.
    """

    def __init__(self, hp):
        super().__init__()
        self.hp = hp

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
        for i in range(len(hp['ae_decoding_n_channels'])):
            k = hp['ae_decoding_kernel_size'][i]
            s = hp['ae_decoding_stride_size'][i]
            y0, y1 = hp['ae_decoding_y_padding'][i]
            x0, x1 = hp['ae_decoding_x_padding'][i]
            self.dec_pads.append((x0, x1, y0, y1))
            dec['convtranspose%i' % i] = nn.ConvTranspose2d(
                c_in, hp['ae_decoding_n_channels'][i], k, s, padding=0)
            c_in = hp['ae_decoding_n_channels'][i]
        self.dec = dec

    def forward(self, x):
        for i in range(len(self.hp['ae_encoding_n_channels'])):
            x0, x1, y0, y1 = self.enc_pads[i]
            x = F.pad(x, (x0, x1, y0, y1))
            x = self.enc['conv%i' % i](x)
            x = F.leaky_relu(x, 0.05)
        z = self.FF_enc(x.reshape(x.shape[0], -1))
        y = self.FF_dec(z)
        c, h, w = self.hp['ae_decoding_starting_dim']
        y = y.reshape(-1, c, h, w)
        n = len(self.hp['ae_decoding_n_channels'])
        for i in range(n):
            x0, x1, y0, y1 = self.dec_pads[i]
            y = self.dec['convtranspose%i' % i](y)
            y = F.pad(y, (-x0, -x1, -y0, -y1))
            y = torch.sigmoid(y) if i == n - 1 else F.leaky_relu(y, 0.05)
        return y, z

    def reference_state_dict(self):
        """State dict with the reference's key naming (aes.py module names)."""
        sd = {}
        for i in range(len(self.hp['ae_encoding_n_channels'])):
            sd['encoding.encoder.conv%i.weight' % i] = self.enc['conv%i' % i].weight
            sd['encoding.encoder.conv%i.bias' % i] = self.enc['conv%i' % i].bias
        sd['encoding.FF.weight'] = self.FF_enc.weight
        sd['encoding.FF.bias'] = self.FF_enc.bias
        sd['decoding.FF.weight'] = self.FF_dec.weight
        sd['decoding.FF.bias'] = self.FF_dec.bias
        for i in range(len(self.hp['ae_decoding_n_channels'])):
            sd['decoding.decoder.convtranspose%i.weight' % i] = \
                self.dec['convtranspose%i' % i].weight
            sd['decoding.decoder.convtranspose%i.bias' % i] = \
                self.dec['convtranspose%i' % i].bias
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
        tx = optax.amsgrad(lr)
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
