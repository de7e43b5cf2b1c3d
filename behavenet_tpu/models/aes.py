"""Autoencoder family (AE / ConditionalAE / AEMSP) as pure-functional JAX models.

Behavioral contract follows the reference torch implementation
(behavenet/models/aes.py): same architecture dict semantics (per-layer
kernel/stride/padding lists from behavenet_tpu.models.arch), LeakyReLU(0.05),
sigmoid output, tied-weight linear AE, conditional decoding with concatenated
labels, and matrix-subspace-projection (Li et al 2019) for AEMSP.

TPU-native design notes:
- NHWC layout; convs run through jax.lax with f32 accumulation and an
  optional bf16 compute dtype (MXU-friendly).
- no in-loss gradient chunking (reference aes.py:722-773): full-trial batches
  fit in HBM, and the chunk-weighted MSE accumulation is mathematically
  identical to the full-batch MSE, so train steps are a single fused XLA
  program.
- per-session io layers (fit_sess_io_layers, reference aes.py:69-79,298-313)
  are stacked along a leading dataset axis and indexed statically.
"""

import jax
import jax.numpy as jnp
import numpy as np

from behavenet_tpu.models import base
from behavenet_tpu.ops import conv as ops
from behavenet_tpu.ops import losses

__all__ = ['ConvEncoder', 'ConvDecoder', 'LinearEncoder', 'LinearDecoder',
           'AE', 'ConditionalAE', 'AEMSP', 'load_pretrained_ae', 'r2_score_vw']


def r2_score_vw(y_true, y_pred, weights=None):
    """Variance-weighted multioutput R^2 (sklearn 'variance_weighted').

    ``weights`` (B,) or (B, L) restricts the score to valid rows/entries
    (label masks and/or padded-frame masks).
    """
    if weights is None:
        ss_res = jnp.sum((y_true - y_pred) ** 2, axis=0)
        ss_tot = jnp.sum((y_true - jnp.mean(y_true, axis=0)) ** 2, axis=0)
        return 1.0 - jnp.sum(ss_res) / jnp.maximum(jnp.sum(ss_tot), 1e-12)
    if weights.ndim == 1:
        weights = weights[:, None]
    w = jnp.broadcast_to(weights, y_true.shape)
    mu = jnp.sum(y_true * w, axis=0) / jnp.maximum(jnp.sum(w, axis=0), 1e-12)
    ss_res = jnp.sum(((y_true - y_pred) ** 2) * w)
    ss_tot = jnp.sum(((y_true - mu) ** 2) * w)
    return 1.0 - ss_res / jnp.maximum(ss_tot, 1e-12)


def _init_bn(spec):
    """BN params: trainable affine + (if tracking) non-trainable running stats."""
    p = {'gamma': jnp.ones((spec['ch'],)), 'beta': jnp.zeros((spec['ch'],))}
    if spec.get('track', False):
        p['running_mean'] = jnp.zeros((spec['ch'],))
        p['running_var'] = jnp.ones((spec['ch'],))
        # float (not int) so the params pytree stays differentiable
        p['num_batches'] = jnp.zeros(())
    return p


def _apply_bn(x, params, spec, train, stats_out):
    """One BN layer with torch train/eval + running-stat semantics.

    Train mode (or ``track_running_stats=False``): batch statistics; if
    tracking, the updated running stats are recorded into ``stats_out`` for
    the trainer to merge post-step. Eval mode with tracking: running stats.
    """
    p = params[spec['name']]
    track = spec.get('track', False) and 'running_mean' in p
    if train or not track:
        if train and track and stats_out is not None:
            stats_out[spec['name']] = ops.batch_norm_update(
                x, p, momentum=spec.get('momentum', 0.1))
        return ops.batch_norm(x, p['gamma'], p['beta'])
    return ops.batch_norm(x, p['gamma'], p['beta'],
                          mean=p['running_mean'], var=p['running_var'])


class ConvEncoder:
    """Conv encoder built from an architecture dict (reference aes.py:17-218)."""

    def __init__(self, hparams):
        self.hparams = hparams
        self.variational = bool(hparams.get('variational', False))
        self.n_latents = hparams['n_ae_latents']
        self.sess_io = bool(hparams.get('fit_sess_io_layers', False))
        self.n_datasets = int(hparams.get('n_datasets', 1))
        self.compute_dtype = hparams.get('compute_dtype', None)
        # keep inter-layer activations in the compute dtype (halves HBM
        # traffic on bandwidth-bound layers); latent head still f32
        self.act_dtype = self.compute_dtype \
            if hparams.get('bf16_pipeline', False) else None

        # extra input channels for conditional encoder (labels_2d appended).
        # The reference gates this on cond-ae only (aes.py:130-137), so its
        # ConditionalVAE advertises `conditional_encoder` (vaes.py:226,266)
        # but crashes on a channel mismatch when it's set; here cond-vae is
        # included so the advertised combination actually works.
        if hparams.get('model_class') in ('cond-ae', 'cond-vae') \
                and hparams.get('conditional_encoder', False):
            n_labels = int(hparams['n_labels'] / 2)
        else:
            n_labels = 0

        layer_types = hparams['ae_encoding_layer_type']
        n = len(hparams['ae_encoding_n_channels'])
        self.layers = []
        for i in range(n):
            if layer_types[i] != 'conv':
                continue
            c_in = (hparams['ae_input_dim'][0] + n_labels) if i == 0 \
                else hparams['ae_encoding_n_channels'][i - 1]
            spec = {
                'type': 'conv',
                'name': 'conv_%d' % i,
                'in': int(c_in),
                'out': int(hparams['ae_encoding_n_channels'][i]),
                'k': int(hparams['ae_encoding_kernel_size'][i]),
                'stride': int(hparams['ae_encoding_stride_size'][i]),
                'pad_y': tuple(hparams['ae_encoding_y_padding'][i]),
                'pad_x': tuple(hparams['ae_encoding_x_padding'][i]),
                'sess_io': self.sess_io and i == 0,
            }
            self.layers.append(spec)
            if hparams.get('ae_batch_norm'):
                # torch BatchNorm2d semantics incl. running statistics
                # (reference aes.py:92-95: momentum + track_running_stats
                # hparams with defaults 0.1 / True)
                self.layers.append({
                    'type': 'bn', 'name': 'bn_%d' % i,
                    'ch': int(hparams['ae_encoding_n_channels'][i]),
                    'momentum': hparams.get('ae_batch_norm_momentum', 0.1),
                    'track': bool(hparams.get('track_running_stats', True))})
            if i < n - 1 and layer_types[i + 1] == 'maxpool':
                self.layers.append({
                    'type': 'maxpool',
                    'name': 'maxpool_%d' % i,
                    'ceil': hparams['ae_padding_type'] != 'valid',
                })
            self.layers.append({'type': 'relu'})

        self.fc_in = int(hparams['ae_encoding_n_channels'][-1]
                         * hparams['ae_encoding_y_dim'][-1]
                         * hparams['ae_encoding_x_dim'][-1])
        self.out_hw = (int(hparams['ae_encoding_y_dim'][-1]),
                       int(hparams['ae_encoding_x_dim'][-1]))

    def init(self, key):
        params = {}
        keys = jax.random.split(key, len(self.layers) + 2)
        for spec, k in zip(self.layers, keys):
            if spec['type'] == 'bn':
                params[spec['name']] = _init_bn(spec)
                continue
            if spec['type'] != 'conv':
                continue
            if spec['sess_io']:
                subkeys = jax.random.split(k, self.n_datasets)
                stacked = [base.init_conv(sk, spec['k'], spec['k'], spec['in'], spec['out'])
                           for sk in subkeys]
                params[spec['name']] = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *stacked)
            else:
                params[spec['name']] = base.init_conv(
                    k, spec['k'], spec['k'], spec['in'], spec['out'])
        params['fc'] = base.init_linear(keys[-2], self.fc_in, self.n_latents)
        if self.variational:
            params['logvar'] = base.init_linear(keys[-1], self.fc_in, self.n_latents)
        return params

    def apply(self, params, x, dataset=0, train=False, stats_out=None):
        """x: (N, H, W, C) -> (latents[, logvar], pool_idx list).

        ``train`` selects BN batch-vs-running statistics; with
        ``stats_out`` (a dict) the updated running stats are recorded
        per BN layer for the trainer to merge after the optimizer step.
        """
        pool_idx = []
        for spec in self.layers:
            if spec['type'] == 'conv':
                p = params[spec['name']]
                if spec['sess_io']:
                    p = jax.tree_util.tree_map(lambda a: a[dataset], p)
                x = ops.conv2d(x, p['w'], p['b'], spec['stride'],
                               spec['pad_y'], spec['pad_x'],
                               compute_dtype=self.compute_dtype,
                               out_dtype=self.act_dtype)
            elif spec['type'] == 'maxpool':
                x, idx = ops.max_pool2d_with_indices(x, ceil_mode=spec['ceil'])
                pool_idx.append(idx)
            elif spec['type'] == 'bn':
                x = _apply_bn(x, params, spec, train, stats_out)
            else:
                x = ops.leaky_relu(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        mu = ops.linear(x, params['fc']['w'], params['fc']['b'])
        if self.variational:
            logvar = ops.linear(x, params['logvar']['w'], params['logvar']['b'])
            return mu, logvar, pool_idx
        return mu, pool_idx


class ConvDecoder:
    """Conv decoder mirroring the encoder (reference aes.py:221-488)."""

    def __init__(self, hparams):
        self.hparams = hparams
        self.sess_io = bool(hparams.get('fit_sess_io_layers', False))
        self.n_datasets = int(hparams.get('n_datasets', 1))
        self.compute_dtype = hparams.get('compute_dtype', None)
        self.act_dtype = self.compute_dtype \
            if hparams.get('bf16_pipeline', False) else None
        self.hidden_layer_size = int(hparams['hidden_layer_size'])
        self.starting_dim = tuple(int(v) for v in hparams['ae_decoding_starting_dim'])  # (C,H,W)
        self.last_ff = bool(hparams.get('ae_decoding_last_FF_layer', False))
        padding_type = hparams['ae_padding_type']

        layer_types = hparams['ae_decoding_layer_type']
        n = len(hparams['ae_decoding_n_channels'])
        self.layers = []
        for i in range(n):
            if layer_types[i] != 'convtranspose':
                continue
            # unpool preceding this conv-transpose
            if i > 0 and layer_types[i - 1] == 'unpool':
                self.layers.append({
                    'type': 'unpool',
                    'name': 'unpool_%d' % (i - 1),
                    'out_hw': (int(hparams['ae_decoding_y_dim'][i - 1]),
                               int(hparams['ae_decoding_x_dim'][i - 1])),
                })
            c_in = self.starting_dim[0] if i == 0 else hparams['ae_decoding_n_channels'][i - 1]
            k = int(hparams['ae_decoding_kernel_size'][i])
            s = int(hparams['ae_decoding_stride_size'][i])
            py = tuple(hparams['ae_decoding_y_padding'][i])
            px = tuple(hparams['ae_decoding_x_padding'][i])
            if padding_type == 'valid':
                # output padding restores the exact pre-conv shape (reference aes.py:382-405)
                in_y = int(hparams['ae_decoding_starting_dim'][1] if i == 0
                           else hparams['ae_decoding_y_dim'][i - 1])
                in_x = int(hparams['ae_decoding_starting_dim'][2] if i == 0
                           else hparams['ae_decoding_x_dim'][i - 1])
                opy = int(hparams['ae_decoding_y_dim'][i]) - ((in_y - 1) * s + k)
                opx = int(hparams['ae_decoding_x_dim'][i]) - ((in_x - 1) * s + k)
                out_pad = (opy, opx)
            else:
                # 'same': symmetric pads map directly; asymmetric pads are the
                # reference's conv-then-crop (aes.py:413-418), folded into the
                # conv padding by conv_transpose2d
                out_pad = (0, 0)
            is_last = (i == n - 1) and not self.last_ff
            c_out = int(hparams['ae_decoding_n_channels'][i])
            # subpixel layout for tiny-Cout upsampling layers (e.g. the final
            # conv back to 1 image channel): computes the output in
            # block-of-pixels-as-channels layout so the MXU's output lanes
            # are used; block=4*s measured best (1.6x fwd+bwd on the default
            # arch's last layer at batch 1024; larger blocks lose to kernel
            # growth + dilated grad-x). Identical math (ops.conv_transpose2d
            # docstring). `subpixel_block_mult` overrides the 4*s factor
            # (block = mult*s; correctness tested for 1/2/4 in
            # tests/test_ops/test_conv.py) — in-context step measurements
            # on v5e favor 4 at batch 1024 for 1- and 2-view; smaller
            # batches are latency-bound and noise-dominated (r4 notes).
            subpixel = hparams.get('subpixel_decoder', True)
            block_mult = int(hparams.get('subpixel_block_mult') or 4)
            block = block_mult * s if (subpixel and s > 1 and c_out <= 4) else None
            self.layers.append({
                'type': 'convtranspose',
                'name': 'convt_%d' % i,
                'in': int(c_in),
                'out': c_out,
                'k': k, 'stride': s, 'pad_y': py, 'pad_x': px, 'out_pad': out_pad,
                'block': block,
                'sess_io': self.sess_io and (i == n - 1) and not self.last_ff,
            })
            if hparams.get('ae_batch_norm') and not is_last:
                self.layers.append({
                    'type': 'bn', 'name': 'bn_%d' % i,
                    'ch': int(hparams['ae_decoding_n_channels'][i]),
                    'momentum': hparams.get('ae_batch_norm_momentum', 0.1),
                    'track': bool(hparams.get('track_running_stats', True))})
            self.layers.append({'type': 'sigmoid' if is_last else 'relu'})

        if self.last_ff:
            if self.sess_io:
                raise NotImplementedError
            self.ff_in = int(hparams['ae_decoding_x_dim'][-1]
                             * hparams['ae_decoding_y_dim'][-1]
                             * hparams['ae_decoding_n_channels'][-1])
            self.ff_out_dim = tuple(int(v) for v in hparams['ae_input_dim'])  # (C,H,W)
            self.layers.append({'type': 'last_ff', 'name': 'last_ff'})
            self.layers.append({'type': 'sigmoid'})

    def init(self, key):
        params = {}
        keys = jax.random.split(key, len(self.layers) + 1)
        params['fc'] = base.init_linear(
            keys[-1], self.hidden_layer_size, int(np.prod(self.starting_dim)))
        for spec, k in zip(self.layers, keys):
            if spec['type'] == 'bn':
                params[spec['name']] = _init_bn(spec)
                continue
            if spec['type'] == 'convtranspose':
                if spec['sess_io']:
                    subkeys = jax.random.split(k, self.n_datasets)
                    stacked = [base.init_conv_transpose(
                        sk, spec['k'], spec['k'], spec['in'], spec['out']) for sk in subkeys]
                    params[spec['name']] = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *stacked)
                else:
                    params[spec['name']] = base.init_conv_transpose(
                        k, spec['k'], spec['k'], spec['in'], spec['out'])
            elif spec['type'] == 'last_ff':
                params[spec['name']] = base.init_linear(
                    k, self.ff_in, int(np.prod(self.ff_out_dim)))
        return params

    def apply(self, params, z, pool_idx=None, dataset=0, train=False, stats_out=None):
        """z: (N, hidden) -> (N, H, W, C) reconstruction."""
        x = ops.linear(z, params['fc']['w'], params['fc']['b'])
        c, h, w = self.starting_dim
        x = x.reshape(x.shape[0], h, w, c)
        pool_stack = list(pool_idx) if pool_idx else []
        for spec in self.layers:
            if spec['type'] == 'convtranspose':
                p = params[spec['name']]
                if spec['sess_io']:
                    p = jax.tree_util.tree_map(lambda a: a[dataset], p)
                x = ops.conv_transpose2d(
                    x, p['w'], p['b'], spec['stride'], spec['pad_y'], spec['pad_x'],
                    out_pad=spec['out_pad'], compute_dtype=self.compute_dtype,
                    out_dtype=self.act_dtype, block=spec.get('block'))
            elif spec['type'] == 'unpool':
                idx = pool_stack.pop(-1)
                x = ops.max_unpool2d(x, idx, spec['out_hw'])
            elif spec['type'] == 'bn':
                x = _apply_bn(x, params, spec, train, stats_out)
            elif spec['type'] == 'relu':
                x = ops.leaky_relu(x)
            elif spec['type'] == 'sigmoid':
                # reconstruction head back to f32 for the loss
                x = jax.nn.sigmoid(x.astype(jnp.float32))
            elif spec['type'] == 'last_ff':
                p = params[spec['name']]
                x = ops.linear(x.reshape(x.shape[0], -1), p['w'], p['b'])
                cc, hh, ww = self.ff_out_dim
                x = x.reshape(-1, hh, ww, cc)
        return x


class LinearEncoder:
    """Single dense layer to latents (reference aes.py:491-544)."""

    def __init__(self, n_latents, input_size):
        self.n_latents = n_latents
        self.input_size = tuple(input_size)  # (C, H, W)
        self.d_in = int(np.prod(input_size))

    def init(self, key):
        return base.init_linear(key, self.d_in, self.n_latents)

    def apply(self, params, x):
        x = x.reshape(x.shape[0], -1)
        return ops.linear(x, params['w'], params['b'])


class LinearDecoder:
    """Dense decoder, optionally with weights tied (transposed) to the encoder.

    Tied mode matches the reference's PCA-like construction
    (aes.py:547-613): decoder output = z @ W_enc^T-equivalent + free bias.
    """

    def __init__(self, n_latents, output_size, tied=True):
        self.n_latents = n_latents
        self.output_size = tuple(output_size)  # (C, H, W)
        self.d_out = int(np.prod(output_size))
        self.tied = tied

    def init(self, key):
        if self.tied:
            return {'b': jnp.zeros((self.d_out,))}
        return base.init_linear(key, self.n_latents, self.d_out)

    def apply(self, params, z, encoder_params=None, out_hw=None):
        if self.tied:
            y = jnp.dot(z, encoder_params['w'].T,
                        preferred_element_type=jnp.float32) + params['b']
        else:
            y = ops.linear(z, params['w'], params['b'])
        n, (c, h, w) = z.shape[0], self.output_size
        return y.reshape(n, h, w, c)


class AE(base.BaseModel):
    """Conv or tied-linear autoencoder (reference aes.py:616-773)."""

    model_class = 'ae'
    metrics_keys = ['loss']

    def __init__(self, hparams):
        self.hparams = dict(hparams)
        self.model_type = hparams['model_type']
        self.img_size = (hparams['n_input_channels'], hparams['y_pixels'], hparams['x_pixels'])
        self.build_model()
        # BN running statistics are non-gradient state the train step must
        # merge into params after the optimizer update (reference
        # aes.py:92-95: track_running_stats defaults on)
        self.has_state = bool(self.hparams.get('ae_batch_norm')) and \
            bool(self.hparams.get('track_running_stats', True)) and \
            self.model_type == 'conv'

    def _bn_stats(self, train):
        """Fresh stats_out dict when this step must record BN running stats."""
        return {} if (train and getattr(self, 'has_state', False)) else None

    @staticmethod
    def _sub_stats(stats_out, key):
        return None if stats_out is None else stats_out.setdefault(key, {})

    @staticmethod
    def _attach_state(metrics, stats):
        """Move recorded BN stats into the aux metrics under '_state'."""
        if stats:
            st = {k: v for k, v in stats.items() if v}
            if st:
                metrics['_state'] = st
        return metrics

    def build_model(self):
        self.hparams['hidden_layer_size'] = self.hparams['n_ae_latents']
        if self.model_type == 'conv':
            self.encoding = ConvEncoder(self.hparams)
            self.decoding = ConvDecoder(self.hparams)
        elif self.model_type == 'linear':
            if self.hparams.get('fit_sess_io_layers', False):
                raise NotImplementedError
            self.encoding = LinearEncoder(self.hparams['n_ae_latents'], self.img_size)
            self.decoding = LinearDecoder(self.hparams['n_ae_latents'], self.img_size, tied=True)
        else:
            raise ValueError('"%s" is an invalid model_type' % self.model_type)

    def init(self, key):
        k_e, k_d = jax.random.split(key)
        return {'encoder': self.encoding.init(k_e), 'decoder': self.decoding.init(k_d)}

    def encode(self, params, x, dataset=0):
        if self.model_type == 'conv':
            z, _ = self.encoding.apply(params['encoder'], x, dataset=dataset)
        else:
            z = self.encoding.apply(params['encoder'], x)
        return z

    def forward(self, params, x, dataset=0, train=False, stats_out=None, **kwargs):
        """Returns (reconstruction, latents)."""
        if self.model_type == 'conv':
            z, pool_idx = self.encoding.apply(
                params['encoder'], x, dataset=dataset, train=train,
                stats_out=self._sub_stats(stats_out, 'encoder'))
            y = self.decoding.apply(
                params['decoder'], z, pool_idx, dataset=dataset, train=train,
                stats_out=self._sub_stats(stats_out, 'decoder'))
        else:
            z = self.encoding.apply(params['encoder'], x)
            y = self.decoding.apply(params['decoder'], z, encoder_params=params['encoder'])
        return y, z

    def loss_fn(self, params, batch, rng, dataset=0, train=False):
        x = batch['images']
        m = batch.get('masks')
        fm = batch.get('frame_mask')
        stats = self._bn_stats(train)
        y, _ = self.forward(params, x, dataset=dataset, train=train, stats_out=stats)
        loss = losses.mse(y, x, m, frame_mask=fm)
        return loss, self._attach_state({'loss': loss}, stats)


class ConditionalAE(AE):
    """AE with labels concatenated to latents before decoding (reference aes.py:776-898)."""

    model_class = 'cond-ae'
    metrics_keys = ['loss']

    def build_model(self):
        self.hparams['hidden_layer_size'] = \
            self.hparams['n_ae_latents'] + self.hparams['n_labels']
        if self.model_type != 'conv':
            raise NotImplementedError
        self.encoding = ConvEncoder(self.hparams)
        self.decoding = ConvDecoder(self.hparams)

    def forward(self, params, x, dataset=0, labels=None, labels_2d=None,
                train=False, stats_out=None, **kwargs):
        if self.hparams.get('conditional_encoder', False):
            x = jnp.concatenate([x, labels_2d], axis=-1)  # channel concat (NHWC)
        z, pool_idx = self.encoding.apply(
            params['encoder'], x, dataset=dataset, train=train,
            stats_out=self._sub_stats(stats_out, 'encoder'))
        zl = jnp.concatenate([z, labels], axis=1)
        y = self.decoding.apply(
            params['decoder'], zl, pool_idx, dataset=dataset, train=train,
            stats_out=self._sub_stats(stats_out, 'decoder'))
        return y, z

    def loss_fn(self, params, batch, rng, dataset=0, train=False):
        x = batch['images']
        m = batch.get('masks')
        fm = batch.get('frame_mask')
        labels = batch['labels']
        labels_2d = batch.get('labels_sc')
        stats = self._bn_stats(train)
        y, _ = self.forward(params, x, dataset=dataset, labels=labels,
                            labels_2d=labels_2d, train=train, stats_out=stats)
        loss = losses.mse(y, x, m, frame_mask=fm)
        return loss, self._attach_state({'loss': loss}, stats)


class AEMSP(AE):
    """AE with matrix subspace projection on the latents (reference aes.py:901-1217).

    Li et al 2019 (arXiv 1907.12385): a trainable linear projection M maps
    latents to labels; loss = pixel MSE + alpha * (label MSE +
    back-projection MSE). At save time M is completed to a full-rank
    orthogonal matrix U = [M; null(M)^T] used for latent-space manipulation.
    """

    model_class = 'cond-ae-msp'
    metrics_keys = ['loss', 'loss_mse', 'loss_msp', 'labels_r2']

    def __init__(self, hparams):
        if hparams['model_type'] == 'linear':
            raise NotImplementedError
        if hparams['n_ae_latents'] < hparams['n_labels']:
            raise ValueError('AEMSP model must contain at least as many latents as labels')
        self.n_latents = hparams['n_ae_latents']
        self.n_labels = hparams['n_labels']
        super().__init__(hparams)

    def build_model(self):
        self.hparams['hidden_layer_size'] = self.hparams['n_ae_latents']
        self.encoding = ConvEncoder(self.hparams)
        self.decoding = ConvDecoder(self.hparams)

    def init(self, key):
        k_e, k_d, k_p = jax.random.split(key, 3)
        return {
            'encoder': self.encoding.init(k_e),
            'decoder': self.decoding.init(k_d),
            # projection: latents -> labels, no bias (reference aes.py:951)
            'projection': base.init_linear(k_p, self.n_latents, self.n_labels, bias=False),
            # U is filled by create_orthogonal_matrix at save time
            'U': jnp.zeros((self.n_latents, self.n_latents)),
        }

    def forward(self, params, x, dataset=0, train=False, stats_out=None, **kwargs):
        """Returns (reconstruction, latents, predicted labels)."""
        z, pool_idx = self.encoding.apply(
            params['encoder'], x, dataset=dataset, train=train,
            stats_out=self._sub_stats(stats_out, 'encoder'))
        y_labels = jnp.dot(z, params['projection']['w'], preferred_element_type=jnp.float32)
        x_hat = self.decoding.apply(
            params['decoder'], z, pool_idx, dataset=dataset, train=train,
            stats_out=self._sub_stats(stats_out, 'decoder'))
        return x_hat, z, y_labels

    def loss_fn(self, params, batch, rng, dataset=0, train=False):
        x = batch['images']
        y = batch['labels']
        m = batch.get('masks')
        fm = batch.get('frame_mask')
        stats = self._bn_stats(train)
        x_hat, z, y_hat = self.forward(params, x, dataset=dataset,
                                       train=train, stats_out=stats)
        loss_mse = losses.mse(x_hat, x, m, frame_mask=fm)
        # back-projection: z ~= y_hat @ M (projection weight transposed back)
        loss_msp = losses.mse(y_hat, y, frame_mask=fm) + \
            losses.mse(z, jnp.dot(y_hat, params['projection']['w'].T,
                                  preferred_element_type=jnp.float32), frame_mask=fm)
        loss = loss_mse + self.hparams['msp.alpha'] * loss_msp
        r2 = r2_score_vw(y, y_hat, weights=fm)
        return loss, self._attach_state(
            {'loss': loss, 'loss_mse': loss_mse, 'loss_msp': loss_msp, 'labels_r2': r2}, stats)

    @staticmethod
    def create_orthogonal_matrix(params):
        """Complete the projection into a full-rank orthogonal matrix U (reference :1067)."""
        from scipy.linalg import null_space
        M = np.asarray(params['projection']['w']).T  # (n_labels, n_latents)
        N = null_space(M)  # (n_latents, n_latents - n_labels)
        U = np.concatenate([M, N.T], axis=0)
        new = dict(params)
        new['U'] = jnp.asarray(U, dtype=jnp.float32)
        return new

    def get_transformed_latents(self, params, inputs, dataset=0):
        """Latents transformed by U; accepts images (N,H,W,C) or latents (N,d)."""
        inputs = jnp.asarray(inputs)
        if inputs.ndim == 2:
            z = inputs
        else:
            z, _ = self.encoding.apply(params['encoder'], inputs, dataset=dataset)
        return jnp.dot(z, params['U'].T)

    def get_inverse_transformed_latents(self, params, latents):
        """Transformed space -> original latent space (reference :1124)."""
        return jnp.dot(jnp.asarray(latents), params['U'])

    def sample(self, params, x=None, dataset=0, latents=None, labels=None, labels_2d=None):
        """Generate an image from arbitrary labels and/or (transformed) latents (reference :1148)."""
        if latents is None or labels is None:
            latents_tr = np.asarray(self.get_transformed_latents(params, x, dataset=dataset))
        else:
            batch_size = latents.shape[0] if latents is not None else labels.shape[0]
            latents_tr = np.full((batch_size, self.n_latents), np.nan)
        if labels is not None:
            latents_tr[:, :self.n_labels] = labels
        if latents is not None:
            latents_tr[:, self.n_labels:] = latents
        z = jnp.dot(jnp.asarray(latents_tr, dtype=jnp.float32), params['U'])
        return self.decoding.apply(params['decoder'], z, None, dataset=dataset)


def load_pretrained_ae(params, model, hparams):
    """Warm-start AE params from a saved checkpoint (reference aes.py:1220-1274).

    Drops the encoder/decoder FF layers when the latent dims or spatial dims
    differ between the checkpoint and the constructed model.
    """
    path = hparams.get('pretrained_weights_path')
    if hparams['model_type'] == 'linear' and path:
        raise NotImplementedError('Loading pretrained weights with linear AE')
    if hparams['model_type'] != 'conv' or not path:
        print('Initializing with random weights')
        return params

    print('Loading pretrained weights')
    loaded, _ = base.load_params(path)
    same_ff = ('fc' in loaded.get('encoder', {})) and \
        loaded['encoder']['fc']['w'].shape == params['encoder']['fc']['w'].shape

    new = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy via rebuild
    for group in ('encoder', 'decoder'):
        if group not in loaded:
            continue
        for name, p in loaded[group].items():
            if name in ('fc', 'logvar') and not same_ff:
                print('PRETRAINED MODEL HAS DIFFERENT SPATIAL DIMENSIONS OR N LATENTS: '
                      'NOT LOADING FF PARAMETERS')
                continue
            if name in new[group] and all(
                    np.shape(a) == np.shape(b) for a, b in zip(
                        jax.tree_util.tree_leaves(p),
                        jax.tree_util.tree_leaves(new[group][name]))):
                new[group][name] = p
    return new
