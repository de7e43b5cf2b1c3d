"""Neural decoders (neural activity <-> latents/states/labels) in JAX.

Behavioral contract follows the reference (behavenet/models/decoders.py):
- ``Decoder`` wraps an MLP whose first layer is a Conv1d over time with
  kernel ``2*n_lags+1`` and same padding — the +/-n_lags neural window
  (decoders.py:187-193).
- noise distributions: 'gaussian' (MSE), 'gaussian-full' (learned
  data-dependent precision head, y = L L^T, decoders.py:228-232),
  'poisson' (PoissonNLL on softplus rates), 'categorical' (cross-entropy).
- the loss is computed on a lag-trimmed window: ``n_max_lags`` rows are
  trimmed from each edge so models with different lags are compared on
  identical data, and the mean is rescaled by (T-2*max_lags)/T to match the
  reference's chunked accumulation arithmetic (decoders.py:97-131).
- ``ConvDecoder`` decodes images directly from labels by reusing the conv
  AE decoder (decoders.py:355-496).

TPU-native notes: the temporal conv runs as a 1-D ``lax.conv_general_dilated``
over the whole trial at once (time on the sublane axis); no chunking.
An LSTM decoder is provided via a ``lax.scan`` (the reference's LSTM is an
unimplemented stub, decoders.py:329-353).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from behavenet_tpu.models import base
from behavenet_tpu.models.aes import ConvDecoder as _ConvDecoderModule
from behavenet_tpu.models.aes import LinearDecoder, r2_score_vw
from behavenet_tpu.ops import losses

__all__ = ['Decoder', 'MLP', 'LSTM', 'ConvDecoder']

_ACTIVATIONS = {
    'linear': None,
    'relu': jax.nn.relu,
    'lrelu': lambda x: jnp.where(x >= 0, x, 0.05 * x),
    'sigmoid': jax.nn.sigmoid,
    'tanh': jnp.tanh,
}


class MLP:
    """Feedforward decoder with a temporal-conv first layer (reference decoders.py:155-326)."""

    def __init__(self, hparams):
        self.hparams = hparams
        self.input_size = int(hparams['input_size'])
        self.output_size = int(hparams['output_size'])
        self.n_hid_layers = int(hparams['n_hid_layers'])
        self.n_hid_units = int(hparams.get('n_hid_units', 0))
        self.n_lags = int(hparams['n_lags'])
        self.noise_dist = hparams['noise_dist']
        self.activation = hparams.get('activation', 'relu')
        if self.activation not in _ACTIVATIONS:
            raise ValueError('"%s" is an invalid activation function' % self.activation)
        self.conv_out = self.output_size if self.n_hid_layers == 0 else self.n_hid_units
        # precision head hangs off the input to the final layer (reference :228,284)
        self.precision = self.noise_dist == 'gaussian-full'
        self.final_in = self.input_size if self.n_hid_layers == 0 else \
            (self.n_hid_units if self.n_hid_layers >= 1 else self.input_size)

    def init(self, key):
        n_keys = 2 + self.n_hid_layers
        keys = jax.random.split(key, n_keys + 1)
        params = {}
        k_conv = 2 * self.n_lags + 1
        # conv1d kernel stored (K, in, out); torch init fan_in = in * K
        fan_in = self.input_size * k_conv
        params['conv'] = {
            'w': base.uniform_fan_in(keys[0], (k_conv, self.input_size, self.conv_out), fan_in),
            'b': base.uniform_fan_in(keys[1], (self.conv_out,), fan_in),
        }
        in_size = self.conv_out
        for i in range(self.n_hid_layers):
            out_size = self.output_size if i == self.n_hid_layers - 1 else self.n_hid_units
            params['dense_%d' % i] = base.init_linear(keys[2 + i], in_size, out_size)
            in_size = out_size
        if self.precision:
            prec_in = self.input_size if self.n_hid_layers == 0 else self.final_in
            params['precision_sqrt'] = base.init_linear(
                keys[-1], prec_in, self.output_size ** 2)
        return params

    def apply(self, params, x):
        """x: (T, input_size) -> (predictions (T, output_size), precision or None)."""
        precision = None
        act_mid = _ACTIVATIONS[self.activation]
        act_final = jax.nn.softplus if self.noise_dist == 'poisson' else None

        if self.precision and self.n_hid_layers == 0:
            precision = self._precision(params, x)

        # temporal conv over the trial: (1, T, Cin) -> (1, T, Cout), same padding
        h = lax.conv_general_dilated(
            x[None], params['conv']['w'],
            window_strides=(1,),
            padding=((self.n_lags, self.n_lags),),
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            preferred_element_type=jnp.float32,
        )[0] + params['conv']['b']

        if self.n_hid_layers == 0:
            if act_final is not None:
                h = act_final(h)
            return h, precision

        if act_mid is not None:
            h = act_mid(h)
        for i in range(self.n_hid_layers):
            if i == self.n_hid_layers - 1 and self.precision:
                precision = self._precision(params, h)
            p = params['dense_%d' % i]
            h = jnp.dot(h, p['w'], preferred_element_type=jnp.float32) + p['b']
            if i == self.n_hid_layers - 1:
                if act_final is not None:
                    h = act_final(h)
            elif act_mid is not None:
                h = act_mid(h)
        return h, precision

    def _precision(self, params, h):
        p = params['precision_sqrt']
        L = jnp.dot(h, p['w'], preferred_element_type=jnp.float32) + p['b']
        L = L.reshape(-1, self.output_size, self.output_size)
        return jnp.einsum('tij,tkj->tik', L, L)


class LSTM:
    """LSTM decoder as a lax.scan over time.

    The reference's LSTM is an unimplemented stub (decoders.py:329-353);
    this provides a working TPU-native implementation with the same
    input/output contract as MLP: (T, input_size) -> (T, output_size).
    """

    def __init__(self, hparams):
        self.hparams = hparams
        self.input_size = int(hparams['input_size'])
        self.output_size = int(hparams['output_size'])
        self.n_hid_units = int(hparams.get('n_hid_units', 64))
        self.noise_dist = hparams['noise_dist']
        self.bidirectional = bool(hparams.get('bidirectional', True))
        self.precision = self.noise_dist == 'gaussian-full'

    def init(self, key):
        h = self.n_hid_units
        keys = jax.random.split(key, 6)
        fan_in = self.input_size + h

        def cell(k):
            kw, kb = jax.random.split(k)
            return {
                'w': base.uniform_fan_in(kw, (self.input_size + h, 4 * h), fan_in),
                'b': base.uniform_fan_in(kb, (4 * h,), fan_in),
            }
        params = {'fwd': cell(keys[0])}
        out_in = h
        if self.bidirectional:
            params['bwd'] = cell(keys[1])
            out_in = 2 * h
        params['out'] = base.init_linear(keys[2], out_in, self.output_size)
        if self.precision:
            params['precision_sqrt'] = base.init_linear(keys[3], out_in, self.output_size ** 2)
        return params

    @staticmethod
    def _run(cell, x, h_dim):
        def step(carry, xt):
            h, c = carry
            gates = jnp.dot(jnp.concatenate([xt, h]), cell['w'],
                            preferred_element_type=jnp.float32) + cell['b']
            i, f, g, o = jnp.split(gates, 4)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h
        init = (jnp.zeros(h_dim), jnp.zeros(h_dim))
        _, hs = lax.scan(step, init, x)
        return hs

    def apply(self, params, x):
        h = self._run(params['fwd'], x, self.n_hid_units)
        if self.bidirectional:
            hb = self._run(params['bwd'], x[::-1], self.n_hid_units)[::-1]
            h = jnp.concatenate([h, hb], axis=1)
        precision = None
        if self.precision:
            p = params['precision_sqrt']
            L = jnp.dot(h, p['w'], preferred_element_type=jnp.float32) + p['b']
            L = L.reshape(-1, self.output_size, self.output_size)
            precision = jnp.einsum('tij,tkj->tik', L, L)
        out = jnp.dot(h, params['out']['w'],
                      preferred_element_type=jnp.float32) + params['out']['b']
        if self.noise_dist == 'poisson':
            out = jax.nn.softplus(out)
        return out, precision


class Decoder(base.BaseModel):
    """Wrapper dispatching model type and noise distribution (reference decoders.py:14-152)."""

    model_class = 'neural-decoder'
    metrics_keys = ['loss', 'r2', 'fc']

    def __init__(self, hparams):
        self.hparams = dict(hparams)
        mt = hparams['model_type']
        if mt in ('mlp', 'mlp-mv'):
            self.model = MLP(self.hparams)
        elif mt == 'lstm':
            self.model = LSTM(self.hparams)
        else:
            raise ValueError('"%s" is not a valid model type' % mt)
        if hparams['noise_dist'] not in ('gaussian', 'gaussian-full', 'poisson', 'categorical'):
            raise ValueError('"%s" is not a valid noise dist' % hparams['noise_dist'])

    def init(self, key):
        return self.model.init(key)

    def forward(self, params, x, **kwargs):
        return self.model.apply(params, x)

    def loss_fn(self, params, batch, rng, dataset=0):
        predictors = batch['predictors']
        targets = batch['targets']
        fm = batch.get('frame_mask')
        max_lags = int(self.hparams['n_max_lags'])
        T = targets.shape[0]
        noise = self.hparams['noise_dist']

        outputs, precision = self.model.apply(params, predictors)

        if fm is None:
            # static window: trim max_lags rows from each edge
            out_w = outputs[max_lags:T - max_lags]
            tgt_w = targets[max_lags:T - max_lags]
            w = None
            n_valid = T
        else:
            # padded batch: valid window is [max_lags, n_valid - max_lags)
            n_valid = jnp.sum(fm)
            t_idx = jnp.arange(T)
            w = ((t_idx >= max_lags) & (t_idx < n_valid - max_lags)).astype(jnp.float32)
            out_w = outputs
            tgt_w = targets

        if noise == 'gaussian':
            raw = losses.mse(out_w, tgt_w, frame_mask=w)
        elif noise == 'gaussian-full':
            if fm is None:
                raw = losses.gaussian_neg_log_prob(
                    out_w, tgt_w, precision[max_lags:T - max_lags])
            else:
                raw = losses.gaussian_neg_log_prob(
                    out_w, tgt_w, precision, frame_mask=w)
        elif noise == 'poisson':
            # torch PoissonNLLLoss(log_input=False, full=False, eps=1e-8)
            nll = out_w - tgt_w * jnp.log(out_w + 1e-8)
            if w is None:
                raw = jnp.mean(nll)
            else:
                raw = jnp.sum(jnp.mean(nll, axis=1) * w) / jnp.maximum(jnp.sum(w), 1.0)
        else:  # categorical
            logp = jax.nn.log_softmax(out_w, axis=1)
            nll = -jnp.take_along_axis(
                logp, tgt_w.reshape(-1, 1).astype(jnp.int32), axis=1)[:, 0]
            if w is None:
                raw = jnp.mean(nll)
            else:
                raw = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

        # reference arithmetic: per-chunk means weighted by window rows / full T
        loss = raw * (n_valid - 2 * max_lags) / n_valid

        if noise in ('gaussian', 'gaussian-full'):
            r2 = r2_score_vw(tgt_w, out_w, weights=w)
            fc = jnp.float32(0.0)
        elif noise == 'categorical':
            r2 = jnp.float32(0.0)
            correct = (jnp.argmax(out_w, axis=1) == tgt_w).astype(jnp.float32)
            if w is None:
                fc = jnp.mean(correct)
            else:
                fc = jnp.sum(correct * w) / jnp.maximum(jnp.sum(w), 1.0)
        else:
            r2 = jnp.float32(0.0)
            fc = jnp.float32(0.0)
        return loss, {'loss': loss, 'r2': r2, 'fc': fc}


class ConvDecoder(base.BaseModel):
    """Decode images directly from labels (reference decoders.py:355-496)."""

    model_class = 'labels-images'
    metrics_keys = ['loss']

    def __init__(self, hparams):
        self.hparams = dict(hparams)
        self.model_type = hparams['model_type']
        self.img_size = (hparams['n_input_channels'], hparams['y_pixels'], hparams['x_pixels'])
        self.hparams['hidden_layer_size'] = self.hparams['n_labels']
        if self.model_type == 'conv':
            self.decoding = _ConvDecoderModule(self.hparams)
        elif self.model_type == 'linear':
            if self.hparams.get('fit_sess_io_layers', False):
                raise NotImplementedError
            self.decoding = LinearDecoder(self.hparams['n_labels'], self.img_size, tied=False)
        else:
            raise ValueError('"%s" is an invalid model_type' % self.model_type)
        self.has_state = bool(self.hparams.get('ae_batch_norm')) and \
            bool(self.hparams.get('track_running_stats', True)) and \
            self.model_type == 'conv'

    def init(self, key):
        return {'decoder': self.decoding.init(key)}

    def forward(self, params, x, dataset=0, train=False, stats_out=None, **kwargs):
        if self.model_type == 'conv':
            sub = None if stats_out is None else stats_out.setdefault('decoder', {})
            return self.decoding.apply(params['decoder'], x, None, dataset=dataset,
                                       train=train, stats_out=sub)
        return self.decoding.apply(params['decoder'], x)

    def loss_fn(self, params, batch, rng, dataset=0, train=False):
        x = batch['images']
        y = batch['labels']
        m = batch.get('masks')
        fm = batch.get('frame_mask')
        stats = {} if (train and getattr(self, 'has_state', False)) else None
        x_hat = self.forward(params, y, dataset=dataset, train=train, stats_out=stats)
        loss = losses.mse(x_hat, x, m, frame_mask=fm)
        metrics = {'loss': loss}
        if stats and stats.get('decoder'):
            metrics['_state'] = {'decoder': stats['decoder']}
        return loss, metrics
