"""VAE family (VAE / ConditionalVAE / BetaTCVAE / PSVAE / MSPSVAE) in JAX.

Behavioral contract follows the reference (behavenet/models/vaes.py):
- ``reparameterize`` keeps the reference's ``std = exp(logvar)`` convention
  (vaes.py:33 — NOT exp(logvar/2)) for parity.
- beta/KL annealing schedules are precomputed per epoch (vaes.py:92-100,
  398-409, 542-553); the trainer passes the scheduled weights into
  ``loss_fn`` as traced scalars so no retracing occurs across epochs.
- PS-VAE splits the encoder head through fixed random orthogonal maps A
  (to supervised latents) and B (to unsupervised latents), with a trainable
  diagonal map D from supervised latents to labels (vaes.py:1276-1363).
- MSPS-VAE adds a background subspace via a third orthogonal head C with
  trainable bias, plus a cross-session triplet loss on the background
  latents (vaes.py:849-1073).

Fixed (non-trainable) parameters are kept inside the params pytree but used
through ``lax.stop_gradient``; the trainer additionally masks them out of
weight decay via ``model.trainable_mask``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from behavenet_tpu.models import base
from behavenet_tpu.models.aes import AE, ConvEncoder, ConvDecoder, r2_score_vw
from behavenet_tpu.ops import losses

__all__ = ['reparameterize', 'VAE', 'ConditionalVAE', 'BetaTCVAE', 'PSVAE', 'MSPSVAE']


def reparameterize(key, mu, logvar):
    """Sample z ~ N(mu, std) with std = exp(logvar) (reference vaes.py:17-35)."""
    std = jnp.exp(logvar)
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return eps * std + mu


def _decomposed_kl(hparams, z, mu, logvar, frame_mask=None):
    """Minibatch KL-decomposition estimators (MI / TC / DWKL).

    A hand-written Pallas kernel for the O(B^2 D) pairwise reduction was
    benchmarked against this XLA implementation on TPU v5e and lost at
    every size including its intended large-batch design point (1.1x at
    B=1k, 3x at B=4k, 5x at B=8k, D=16): XLA fuses the pairwise logsumexp
    without materializing the (B, B, D) intermediate, so the kernel's
    HBM-capping rationale never binds. The kernel was removed; the
    measurement lives in docs/tpu_design.md.
    """
    return losses.decomposed_kl(z, mu, logvar, frame_mask=frame_mask)


def _linear_anneal(beta, anneal_epochs, max_n_epochs):
    """Per-epoch schedule arrays matching the reference's precomputation."""
    if anneal_epochs and anneal_epochs > 0:
        beta_vals = np.append(
            np.linspace(0, beta, anneal_epochs), beta * np.ones(max_n_epochs + 1))
        kl_vals = np.append(
            np.linspace(0, 1, anneal_epochs), np.ones(max_n_epochs + 1))
    else:
        beta_vals = beta * np.ones(max_n_epochs + 1)
        kl_vals = np.ones(max_n_epochs + 1)
    return beta_vals, kl_vals


class VAE(AE):
    """beta-VAE with optional linear beta annealing (reference vaes.py:38-208)."""

    model_class = 'vae'
    variational = True
    metrics_keys = ['loss', 'loss_ll', 'loss_kl', 'loss_mse', 'beta']

    def __init__(self, hparams):
        if hparams['model_type'] == 'linear':
            raise NotImplementedError
        hparams = dict(hparams)
        hparams['variational'] = True
        super().__init__(hparams)
        anneal_epochs = self.hparams.get('vae.beta_anneal_epochs', 0) or 0
        max_n_epochs = self.hparams.get('max_n_epochs', 200)
        if anneal_epochs > 0:
            # reference vaes.py:96-98: anneal 0 -> beta, then **1.0** afterwards
            self.beta_vals = np.append(
                np.linspace(0, hparams['vae.beta'], anneal_epochs),
                np.ones(max_n_epochs + 1))
        else:
            self.beta_vals = hparams['vae.beta'] * np.ones(max_n_epochs + 1)

    def loss_kwargs(self, epoch):
        return {'beta': jnp.float32(self.beta_vals[epoch])}

    def forward(self, params, x, rng=None, dataset=0, use_mean=False,
                train=False, stats_out=None, **kwargs):
        """Returns (x_hat, z, mu, logvar)."""
        mu, logvar, pool_idx = self.encoding.apply(
            params['encoder'], x, dataset=dataset, train=train,
            stats_out=self._sub_stats(stats_out, 'encoder'))
        z = mu if use_mean else reparameterize(rng, mu, logvar)
        x_hat = self.decoding.apply(
            params['decoder'], z, pool_idx, dataset=dataset, train=train,
            stats_out=self._sub_stats(stats_out, 'decoder'))
        return x_hat, z, mu, logvar

    def loss_fn(self, params, batch, rng, dataset=0, beta=1.0, train=False):
        x = batch['images']
        m = batch.get('masks')
        fm = batch.get('frame_mask')
        stats = self._bn_stats(train)
        x_hat, _, mu, logvar = self.forward(params, x, rng=rng, dataset=dataset,
                                            train=train, stats_out=stats)
        loss_ll = losses.gaussian_ll(x, x_hat, m, frame_mask=fm)
        loss_kl = losses.kl_div_to_std_normal(mu, logvar, frame_mask=fm)
        loss = -loss_ll + beta * loss_kl
        n_dims = int(np.prod(x.shape[1:]))
        loss_mse = -(loss_ll + (0.5 * losses.LN2PI) * n_dims) * 2.0 / n_dims
        return loss, self._attach_state(
            {'loss': loss, 'loss_ll': loss_ll, 'loss_kl': loss_kl,
             'loss_mse': loss_mse, 'beta': beta}, stats)


class ConditionalVAE(VAE):
    """VAE with labels concatenated to latents before decoding (reference vaes.py:211-364)."""

    model_class = 'cond-vae'
    metrics_keys = ['loss', 'loss_ll', 'loss_kl', 'loss_mse', 'beta']

    def build_model(self):
        self.hparams['hidden_layer_size'] = \
            self.hparams['n_ae_latents'] + self.hparams['n_labels']
        self.encoding = ConvEncoder(self.hparams)
        self.decoding = ConvDecoder(self.hparams)

    def forward(self, params, x, rng=None, dataset=0, labels=None, labels_2d=None,
                use_mean=False, train=False, stats_out=None, **kwargs):
        if self.hparams.get('conditional_encoder', False):
            x = jnp.concatenate([x, labels_2d], axis=-1)
        mu, logvar, pool_idx = self.encoding.apply(
            params['encoder'], x, dataset=dataset, train=train,
            stats_out=self._sub_stats(stats_out, 'encoder'))
        z = mu if use_mean else reparameterize(rng, mu, logvar)
        z_aug = jnp.concatenate([z, labels], axis=1)
        x_hat = self.decoding.apply(
            params['decoder'], z_aug, pool_idx, dataset=dataset, train=train,
            stats_out=self._sub_stats(stats_out, 'decoder'))
        return x_hat, z, mu, logvar

    def loss_fn(self, params, batch, rng, dataset=0, beta=1.0, train=False):
        x = batch['images']
        m = batch.get('masks')
        fm = batch.get('frame_mask')
        labels = batch['labels']
        labels_2d = batch.get('labels_sc')
        stats = self._bn_stats(train)
        x_hat, _, mu, logvar = self.forward(
            params, x, rng=rng, dataset=dataset, labels=labels, labels_2d=labels_2d,
            train=train, stats_out=stats)
        loss_ll = losses.gaussian_ll(x, x_hat, m, frame_mask=fm)
        loss_kl = losses.kl_div_to_std_normal(mu, logvar, frame_mask=fm)
        loss = -loss_ll + beta * loss_kl
        n_dims = int(np.prod(x.shape[1:]))
        loss_mse = -(loss_ll + (0.5 * losses.LN2PI) * n_dims) * 2.0 / n_dims
        return loss, self._attach_state(
            {'loss': loss, 'loss_ll': loss_ll, 'loss_kl': loss_kl,
             'loss_mse': loss_mse, 'beta': beta}, stats)


class BetaTCVAE(VAE):
    """VAE with decomposed-KL ELBO and up-weighted total correlation (reference vaes.py:367-503)."""

    model_class = 'beta-tcvae'
    metrics_keys = ['loss', 'loss_ll', 'loss_mi', 'loss_tc', 'loss_dwkl', 'loss_mse', 'beta']

    def __init__(self, hparams):
        if hparams['model_type'] == 'linear':
            raise NotImplementedError
        super().__init__(dict(hparams, **{'vae.beta': 1}))
        anneal_epochs = self.hparams.get('beta_tcvae.beta_anneal_epochs', 0) or 0
        max_n_epochs = self.hparams.get('max_n_epochs', 200)
        self.beta_vals, self.kl_anneal_vals = _linear_anneal(
            hparams['beta_tcvae.beta'], anneal_epochs, max_n_epochs)

    def loss_kwargs(self, epoch):
        return {'beta': jnp.float32(self.beta_vals[epoch]),
                'kl': jnp.float32(self.kl_anneal_vals[epoch])}

    def loss_fn(self, params, batch, rng, dataset=0, beta=1.0, kl=1.0, train=False):
        x = batch['images']
        m = batch.get('masks')
        fm = batch.get('frame_mask')
        stats = self._bn_stats(train)
        x_hat, sample, mu, logvar = self.forward(params, x, rng=rng, dataset=dataset,
                                                 train=train, stats_out=stats)
        loss_ll = losses.gaussian_ll(x, x_hat, m, frame_mask=fm)
        mi, tc, dwkl = _decomposed_kl(self.hparams, sample, mu, logvar, frame_mask=fm)
        loss = -loss_ll + kl * mi + beta * tc + kl * dwkl
        n_dims = int(np.prod(x.shape[1:]))
        loss_mse = -(loss_ll + (0.5 * losses.LN2PI) * n_dims) * 2.0 / n_dims
        return loss, self._attach_state(
            {'loss': loss, 'loss_ll': loss_ll, 'loss_mi': mi, 'loss_tc': tc,
             'loss_dwkl': dwkl, 'loss_mse': loss_mse, 'beta': beta}, stats)


class _PSEncoderMixin:
    """Shared init/apply pieces for PS-VAE / MSPS-VAE heads."""

    @staticmethod
    def _ortho(seed, dim):
        from scipy.stats import ortho_group
        rng = np.random.RandomState(seed)
        return ortho_group.rvs(dim=dim, random_state=rng).astype(np.float32)


class PSVAE(AE, _PSEncoderMixin):
    """Partitioned-subspace VAE (reference vaes.py:506-846).

    Encoder FF output is split through fixed orthogonal maps A (supervised)
    and B (unsupervised); the diagonal map D reconstructs labels from the
    supervised subspace.
    """

    model_class = 'ps-vae'
    variational = True
    metrics_keys = ['loss', 'loss_data_ll', 'loss_label_ll', 'loss_zs_kl', 'loss_zu_mi',
                    'loss_zu_tc', 'loss_zu_dwkl', 'loss_data_mse', 'alpha', 'beta', 'label_r2']

    def __init__(self, hparams):
        if hparams['model_type'] == 'linear':
            raise NotImplementedError
        if hparams['n_ae_latents'] < hparams['n_labels']:
            raise ValueError('PS-VAE model must contain at least as many latents as labels')
        self.n_latents = hparams['n_ae_latents']
        self.n_labels = hparams['n_labels']
        hparams = dict(hparams)
        hparams['variational'] = True
        super().__init__(hparams)
        anneal_epochs = self.hparams.get('ps_vae.anneal_epochs', 0) or 0
        max_n_epochs = self.hparams.get('max_n_epochs', 200)
        self.beta_vals, self.kl_anneal_vals = _linear_anneal(
            hparams['ps_vae.beta'], anneal_epochs, max_n_epochs)

    def build_model(self):
        self.hparams['hidden_layer_size'] = self.hparams['n_ae_latents']
        self.encoding = ConvEncoder(self.hparams)
        self.decoding = ConvDecoder(self.hparams)

    def loss_kwargs(self, epoch):
        # alpha rides along as a traced scalar so the vmapped grid trainer
        # can stack per-trial values (fitting/vmap_grid.py); identical to
        # the loss_fn default for single-trial fits
        return {'beta': jnp.float32(self.beta_vals[epoch]),
                'kl': jnp.float32(self.kl_anneal_vals[epoch]),
                'alpha': jnp.float32(self.hparams['ps_vae.alpha'])}

    def init(self, key):
        k_e, k_d, k_dd = jax.random.split(key, 3)
        params = {'encoder': self.encoding.init(k_e), 'decoder': self.decoding.init(k_d)}
        m = self._ortho(self.hparams.get('rng_seed_model', 0), self.n_latents)
        # stored input-major: y = x @ A
        params['encoder']['A'] = jnp.asarray(m[:self.n_labels, :].T)
        params['encoder']['B'] = jnp.asarray(m[self.n_labels:, :].T)
        params['encoder']['D'] = base.init_diag_linear(k_dd, self.n_labels)
        return params

    def trainable_mask(self, params):
        mask = jax.tree_util.tree_map(lambda _: True, params)
        mask['encoder']['A'] = False
        mask['encoder']['B'] = False
        return mask

    def encode(self, params, x, dataset=0, train=False, stats_out=None):
        """Returns (y, w, logvar, pool_idx): supervised / unsupervised heads."""
        mu_ff, logvar, pool_idx = self.encoding.apply(
            params['encoder'], x, dataset=dataset, train=train,
            stats_out=self._sub_stats(stats_out, 'encoder'))
        A = jax.lax.stop_gradient(params['encoder']['A'])
        B = jax.lax.stop_gradient(params['encoder']['B'])
        y = jnp.dot(mu_ff, A, preferred_element_type=jnp.float32)
        w = jnp.dot(mu_ff, B, preferred_element_type=jnp.float32)
        return y, w, logvar, pool_idx

    def forward(self, params, x, rng=None, dataset=0, use_mean=False,
                train=False, stats_out=None, **kwargs):
        """Returns (x_hat, z, mu, logvar, y_hat)."""
        y, w, logvar, pool_idx = self.encode(params, x, dataset=dataset,
                                             train=train, stats_out=stats_out)
        mu = jnp.concatenate([y, w], axis=1)
        z = mu if use_mean else reparameterize(rng, mu, logvar)
        x_hat = self.decoding.apply(
            params['decoder'], z, pool_idx, dataset=dataset, train=train,
            stats_out=self._sub_stats(stats_out, 'decoder'))
        y_hat = base.diag_linear(params['encoder']['D'], y)
        return x_hat, z, mu, logvar, y_hat

    def loss_fn(self, params, batch, rng, dataset=0, beta=1.0, kl=1.0,
                alpha=None, train=False):
        x = batch['images']
        y = batch['labels']
        m = batch.get('masks')
        n = batch.get('labels_masks')
        fm = batch.get('frame_mask')
        n_labels = self.n_labels
        # alpha is an hparam, not a schedule, but the vmapped grid trainer
        # threads per-trial values through the loss kwargs
        if alpha is None:
            alpha = self.hparams['ps_vae.alpha']
        stats = self._bn_stats(train)
        x_hat, sample, mu, logvar, y_hat = self.forward(
            params, x, rng=rng, dataset=dataset, train=train, stats_out=stats)

        loss_data_ll = losses.gaussian_ll(x, x_hat, m, frame_mask=fm)
        loss_label_ll = losses.gaussian_ll(y, y_hat, n, frame_mask=fm)
        loss_zs_kl = losses.kl_div_to_std_normal(
            mu[:, :n_labels], logvar[:, :n_labels], frame_mask=fm)
        mi, tc, dwkl = _decomposed_kl(
            self.hparams, sample[:, n_labels:], mu[:, n_labels:], logvar[:, n_labels:],
            frame_mask=fm)
        loss = -loss_data_ll - alpha * loss_label_ll + loss_zs_kl \
            + kl * mi + beta * tc + kl * dwkl

        n_dims = int(np.prod(x.shape[1:]))
        loss_data_mse = -(loss_data_ll + (0.5 * losses.LN2PI) * n_dims) * 2.0 / n_dims
        w_ = None
        if n is not None and fm is not None:
            w_ = n * fm[:, None]
        elif n is not None:
            w_ = n
        elif fm is not None:
            w_ = fm
        r2 = r2_score_vw(y, y_hat, weights=w_)
        return loss, self._attach_state({
            'loss': loss, 'loss_data_ll': loss_data_ll, 'loss_label_ll': loss_label_ll,
            'loss_zs_kl': loss_zs_kl, 'loss_zu_mi': mi, 'loss_zu_tc': tc, 'loss_zu_dwkl': dwkl,
            'loss_data_mse': loss_data_mse, 'alpha': jnp.float32(alpha), 'beta': beta,
            'label_r2': r2}, stats)

    def get_predicted_labels(self, params, x, dataset=0, use_mean=True, rng=None):
        y, _, logvar, _ = self.encode(params, x, dataset=dataset)
        if not use_mean:
            y = reparameterize(rng, y, logvar[:, :self.n_labels])
        return base.diag_linear(params['encoder']['D'], y)

    def get_transformed_latents(self, params, inputs, dataset=0):
        """Supervised subspace mapped to label space (reference vaes.py:755)."""
        inputs = jnp.asarray(inputs)
        if inputs.ndim == 2:
            y_og = inputs[:, :self.n_labels]
            w_og = inputs[:, self.n_labels:]
        else:
            y_og, w_og, _, _ = self.encode(params, inputs, dataset=dataset)
        y_new = base.diag_linear(params['encoder']['D'], y_og)
        return jnp.concatenate([y_new, w_og], axis=1)

    def get_inverse_transformed_latents(self, params, inputs):
        """Label space mapped back to the supervised subspace (reference vaes.py:801)."""
        inputs = jnp.asarray(inputs)
        y_og = inputs[:, :self.n_labels]
        w_og = inputs[:, self.n_labels:]
        D = params['encoder']['D']
        y_new = (y_og - D['b']) / D['d']
        return jnp.concatenate([y_new, w_og], axis=1)


class MSPSVAE(PSVAE):
    """Multi-session PS-VAE with background subspace (reference vaes.py:849-1273)."""

    model_class = 'msps-vae'
    metrics_keys = ['loss', 'loss_data_ll', 'loss_label_ll', 'loss_zs_kl', 'loss_zu_mi',
                    'loss_zu_tc', 'loss_zu_dwkl', 'loss_triplet', 'loss_data_mse',
                    'alpha', 'beta', 'delta', 'label_r2']

    def __init__(self, hparams):
        if hparams.get('n_sessions_per_batch', 1) == 1:
            raise ValueError('must choose "n_sessions_per_batch" > 1 in hparams')
        super().__init__(hparams)
        self.n_background = int(self.hparams.get('n_background', 4))
        self.hparams['n_background'] = self.n_background

    def init(self, key):
        k_e, k_d, k_dd, k_c = jax.random.split(key, 4)
        params = {'encoder': self.encoding.init(k_e), 'decoder': self.decoding.init(k_d)}
        n_bg = int(self.hparams.get('n_background', 4))
        m = self._ortho(self.hparams.get('rng_seed_model', 0), self.n_latents)
        params['encoder']['A'] = jnp.asarray(m[:self.n_labels, :].T)
        params['encoder']['B'] = jnp.asarray(m[self.n_labels + n_bg:, :].T)
        params['encoder']['C'] = jnp.asarray(m[self.n_labels:self.n_labels + n_bg, :].T)
        # C has a trainable bias (reference vaes.py:1385)
        params['encoder']['C_b'] = base.uniform_fan_in(k_c, (n_bg,), self.n_latents)
        params['encoder']['D'] = base.init_diag_linear(k_dd, self.n_labels)
        return params

    def trainable_mask(self, params):
        mask = jax.tree_util.tree_map(lambda _: True, params)
        mask['encoder']['A'] = False
        mask['encoder']['B'] = False
        mask['encoder']['C'] = False
        return mask

    def encode(self, params, x, dataset=0, train=False, stats_out=None):
        """Returns (z_s, z_b, z_u, logvar, pool_idx)."""
        mu_ff, logvar, pool_idx = self.encoding.apply(
            params['encoder'], x, dataset=dataset, train=train,
            stats_out=self._sub_stats(stats_out, 'encoder'))
        A = jax.lax.stop_gradient(params['encoder']['A'])
        B = jax.lax.stop_gradient(params['encoder']['B'])
        C = jax.lax.stop_gradient(params['encoder']['C'])
        z_s = jnp.dot(mu_ff, A, preferred_element_type=jnp.float32)
        z_u = jnp.dot(mu_ff, B, preferred_element_type=jnp.float32)
        z_b = jnp.dot(mu_ff, C, preferred_element_type=jnp.float32) + params['encoder']['C_b']
        return z_s, z_b, z_u, logvar, pool_idx

    def forward(self, params, x, rng=None, dataset=0, use_mean=False,
                train=False, stats_out=None, **kwargs):
        z_s, z_b, z_u, logvar, pool_idx = self.encode(
            params, x, dataset=dataset, train=train, stats_out=stats_out)
        mu = jnp.concatenate([z_s, z_b, z_u], axis=1)
        z = mu if use_mean else reparameterize(rng, mu, logvar)
        x_hat = self.decoding.apply(
            params['decoder'], z, pool_idx, dataset=dataset, train=train,
            stats_out=self._sub_stats(stats_out, 'decoder'))
        y_hat = base.diag_linear(params['encoder']['D'], z_s)
        return x_hat, z, mu, logvar, y_hat

    def loss_kwargs(self, epoch):
        # delta rides along as a traced scalar like alpha so the vmapped
        # grid trainer can stack per-trial alpha/beta/delta values
        # (fitting/vmap_grid.py); identical to the loss_fn default
        kw = super().loss_kwargs(epoch)
        kw['delta'] = jnp.float32(self.hparams['ps_vae.delta'])
        return kw

    def loss_fn(self, params, batch, rng, dataset=0, beta=1.0, kl=1.0, alpha=None,
                delta=None, seg_lens=None, train=False):
        """Batch is a dataset-major concatenation of per-session trial segments.

        ``seg_lens`` (static tuple of per-session row counts) drives the
        triplet loss; when None the batch is treated as one session and the
        triplet term is skipped (reference vaes.py:1039-1042).
        """
        x = batch['images']
        y = batch['labels']
        m = batch.get('masks')
        n = batch.get('labels_masks')
        fm = batch.get('frame_mask')
        n_labels = self.n_labels
        n_bg = self.n_background
        if alpha is None:
            alpha = self.hparams['ps_vae.alpha']
        if delta is None:
            delta = self.hparams['ps_vae.delta']
        rng_f, rng_t = jax.random.split(rng)
        stats = self._bn_stats(train)
        x_hat, sample, mu, logvar, y_hat = self.forward(
            params, x, rng=rng_f, dataset=dataset, train=train, stats_out=stats)

        loss_data_ll = losses.gaussian_ll(x, x_hat, m, frame_mask=fm)
        loss_label_ll = losses.gaussian_ll(y, y_hat, n, frame_mask=fm)
        loss_zs_kl = losses.kl_div_to_std_normal(
            mu[:, :n_labels], logvar[:, :n_labels], frame_mask=fm)
        mi, tc, dwkl = _decomposed_kl(
            self.hparams, sample[:, n_labels + n_bg:], mu[:, n_labels + n_bg:],
            logvar[:, n_labels + n_bg:], frame_mask=fm)
        loss = -loss_data_ll - alpha * loss_label_ll + loss_zs_kl \
            + kl * mi + beta * tc + kl * dwkl

        if seg_lens is not None:
            loss_triplet = losses.triplet_loss(
                rng_t, mu[:, n_labels:n_labels + n_bg], seg_lens, seg_mask=fm)
            loss = loss + delta * loss_triplet
        else:
            loss_triplet = jnp.float32(0.0)

        n_dims = int(np.prod(x.shape[1:]))
        loss_data_mse = -(loss_data_ll + (0.5 * losses.LN2PI) * n_dims) * 2.0 / n_dims
        w_ = None
        if n is not None and fm is not None:
            w_ = n * fm[:, None]
        elif n is not None:
            w_ = n
        elif fm is not None:
            w_ = fm
        r2 = r2_score_vw(y, y_hat, weights=w_)
        return loss, self._attach_state({
            'loss': loss, 'loss_data_ll': loss_data_ll, 'loss_label_ll': loss_label_ll,
            'loss_zs_kl': loss_zs_kl, 'loss_zu_mi': mi, 'loss_zu_tc': tc, 'loss_zu_dwkl': dwkl,
            'loss_triplet': loss_triplet, 'loss_data_mse': loss_data_mse,
            'alpha': jnp.float32(alpha), 'beta': beta, 'delta': jnp.float32(delta),
            'label_r2': r2}, stats)

    def get_predicted_labels(self, params, x, dataset=0, use_mean=True, rng=None):
        # PSVAE's version unpacks a 4-tuple; the msps encoder returns
        # (z_s, z_b, z_u, logvar, pool_idx) — found via the msps-vae
        # analysis notebook's label-reconstruction cell
        z_s, _, _, logvar, _ = self.encode(params, x, dataset=dataset)
        if not use_mean:
            z_s = reparameterize(rng, z_s, logvar[:, :self.n_labels])
        return base.diag_linear(params['encoder']['D'], z_s)

    def get_transformed_latents(self, params, inputs, dataset=0):
        inputs = jnp.asarray(inputs)
        n_l, n_b = self.n_labels, self.n_background
        if inputs.ndim == 2:
            z_s = inputs[:, :n_l]
            z_b = inputs[:, n_l:n_l + n_b]
            z_u = inputs[:, n_l + n_b:]
        else:
            z_s, z_b, z_u, _, _ = self.encode(params, inputs, dataset=dataset)
        y_new = base.diag_linear(params['encoder']['D'], z_s)
        return jnp.concatenate([y_new, z_b, z_u], axis=1)

    def get_inverse_transformed_latents(self, params, inputs):
        inputs = jnp.asarray(inputs)
        n_l, n_b = self.n_labels, self.n_background
        z_s = inputs[:, :n_l]
        z_b = inputs[:, n_l:n_l + n_b]
        z_u = inputs[:, n_l + n_b:]
        D = params['encoder']['D']
        z_s_new = (z_s - D['b']) / D['d']
        return jnp.concatenate([z_s_new, z_b, z_u], axis=1)
