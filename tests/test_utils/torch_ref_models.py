"""Torch reference models + losses for lockstep training-parity checks.

These mirror the reference's PS-VAE (vaes.py:506-846, encoder
vaes.py:1276-1364) and MLP neural decoder (decoders.py:14-327) behavior —
same module graph, same loss arithmetic — with the reference's state-dict
key naming so checkpoints import through ``utils/torch_import.py``. Used
by ``tools/parity_check.py`` and the lockstep pytest suite; not a copy of
reference code (independent implementations of the documented math).
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from .test_torch_import import TorchRefAE  # noqa: F401 (re-export)

LN2PI = float(np.log(2 * np.pi))


# ---------------------------------------------------------------------------
# torch mirrors of the reference loss zoo (fitting/losses.py)

def t_gaussian_ll(y_pred, y_mean, masks=None, std=1.0):
    """Diagonal-Gaussian LL summed over dims, averaged over batch (ref :63-98)."""
    n_dims = int(np.prod(y_pred.shape[1:]))
    diff_sq = (y_pred - y_mean) ** 2
    if masks is not None:
        diff_sq = diff_sq * masks
    ll = -(0.5 * LN2PI + 0.5 * np.log(std ** 2)) * n_dims \
        - (0.5 / std ** 2) * diff_sq.reshape(diff_sq.shape[0], -1).sum(dim=1)
    return ll.mean()


def t_kl_div_to_std_normal(mu, logvar):
    """KL(q || N(0,1)) summed over dims, averaged over batch (ref :131-147)."""
    return (0.5 * torch.sum(logvar.exp() - logvar + mu.pow(2) - 1, dim=1)).mean()


def _t_log_density(z, mu, logvar):
    return -0.5 * (torch.exp(-logvar) * (z - mu) ** 2 + logvar + LN2PI)


def t_decomposed_kl(z, mu, logvar):
    """Minibatch (MI, TC, DWKL) estimators (ref :284-351)."""
    log_qz_prob = _t_log_density(z[:, None], mu[None, :], logvar[None, :])
    summed = log_qz_prob.sum(dim=2)
    log_qz = torch.logsumexp(summed, dim=1)
    log_qz_cond = torch.diag(summed)
    log_qz_product = torch.logsumexp(log_qz_prob, dim=1).sum(dim=1)
    log_pz_product = (-0.5 * (z ** 2 + LN2PI)).sum(dim=1)
    mi = (log_qz_cond - log_qz).mean()
    tc = (log_qz - log_qz_product).mean()
    dwkl = (log_qz_product - log_pz_product).mean()
    return mi, tc, dwkl


# ---------------------------------------------------------------------------
# VAE / Beta-TC-VAE

class TorchRefVAE(TorchRefAE):
    """Torch beta-VAE with the reference's module graph and key naming.

    TorchRefAE plus a logvar head off the flattened conv features
    (reference ConvAEEncoder with ``variational=True``, aes.py:104-110);
    ``forward`` takes an explicit ``eps`` so the lockstep harness shares
    sampling noise with the JAX side, keeping the reference's
    ``std = exp(logvar)`` reparameterization quirk (vaes.py:17-35).
    """

    def __init__(self, hp):
        super().__init__(hp)
        self.logvar = nn.Linear(self.FF_enc.in_features, hp['n_ae_latents'])

    def forward(self, x, eps=None):
        x1 = self.encode_features(x)
        mu = self.FF_enc(x1)
        logvar = self.logvar(x1)
        z = mu if eps is None else eps * torch.exp(logvar) + mu
        return self.decode(z), z, mu, logvar

    def loss(self, x, eps, beta):
        """Reference VAE.loss arithmetic, single chunk (vaes.py:155-209)."""
        x_hat, _, mu, logvar = self.forward(x, eps=eps)
        return -t_gaussian_ll(x, x_hat) + beta * t_kl_div_to_std_normal(mu, logvar)

    def reference_state_dict(self):
        sd = super().reference_state_dict()
        sd['encoding.logvar.weight'] = self.logvar.weight
        sd['encoding.logvar.bias'] = self.logvar.bias
        return sd


class TorchRefBetaTCVAE(TorchRefVAE):
    """Torch Beta-TC-VAE: same graph as the VAE, decomposed-KL ELBO with the
    total-correlation term up-weighted (reference vaes.py:367-505)."""

    def loss(self, x, eps, beta, kl=1.0):
        """Reference BetaTCVAE.loss arithmetic, single chunk (vaes.py:411-505)."""
        x_hat, sample, mu, logvar = self.forward(x, eps=eps)
        mi, tc, dwkl = t_decomposed_kl(sample, mu, logvar)
        return -t_gaussian_ll(x, x_hat) + kl * mi + beta * tc + kl * dwkl


# ---------------------------------------------------------------------------
# Conditional AE / VAE (labels concatenated at the latent layer)

class TorchRefCondAE(TorchRefAE):
    """Torch conditional AE (reference aes.py:776-899): continuous labels
    concatenate with the latents before decoding; with
    ``conditional_encoder`` one spatial one-hot map per (x, y) label pair
    concatenates to the input channels (reference aes.py:130-137, 831-836).
    """

    def __init__(self, hp):
        hp_enc = dict(hp)
        if hp.get('conditional_encoder', False):
            hp_enc['ae_input_dim'] = \
                [hp['ae_input_dim'][0] + hp['n_labels'] // 2] \
                + list(hp['ae_input_dim'][1:])
        super().__init__(hp_enc)
        self.FF_dec = nn.Linear(hp['n_ae_latents'] + hp['n_labels'],
                                self.FF_dec.out_features)

    def forward(self, x, labels=None, labels_2d=None):
        if self.hp.get('conditional_encoder', False):
            x = torch.cat((x, labels_2d), dim=1)
        z = self.FF_enc(self.encode_features(x))
        return self.decode(torch.cat((z, labels), dim=1)), z

    def loss(self, x, labels, labels_2d=None):
        """Reference ConditionalAE.loss arithmetic, single chunk (aes.py:841-899)."""
        y, _ = self.forward(x, labels=labels, labels_2d=labels_2d)
        return torch.mean((y - x) ** 2)


class TorchRefCondVAE(TorchRefVAE):
    """Torch conditional VAE (reference vaes.py:211-365): the VAE graph with
    continuous labels concatenated to the sampled latents before decoding.
    ``conditional_encoder`` is left off — setting it crashes the reference
    (its encoder widens input channels for cond-ae only, aes.py:130-137)."""

    def __init__(self, hp):
        super().__init__(hp)
        self.FF_dec = nn.Linear(hp['n_ae_latents'] + hp['n_labels'],
                                self.FF_dec.out_features)

    def forward(self, x, labels=None, eps=None):
        x1 = self.encode_features(x)
        mu = self.FF_enc(x1)
        logvar = self.logvar(x1)
        z = mu if eps is None else eps * torch.exp(logvar) + mu
        return self.decode(torch.cat((z, labels), dim=1)), z, mu, logvar

    def loss(self, x, labels, eps, beta):
        """Reference ConditionalVAE.loss arithmetic, single chunk (vaes.py:289-365)."""
        x_hat, _, mu, logvar = self.forward(x, labels=labels, eps=eps)
        return -t_gaussian_ll(x, x_hat) + beta * t_kl_div_to_std_normal(mu, logvar)


# ---------------------------------------------------------------------------
# AEMSP (matrix-subspace-projection AE)

class TorchRefAEMSP(TorchRefAE):
    """Torch AEMSP: AE plus a trainable bias-free projection from latents to
    labels, trained with the matrix-subspace-projection penalty (reference
    aes.py:901-1080; Li et al 2019, arXiv 1907.12385)."""

    def __init__(self, hp):
        super().__init__(hp)
        self.projection = nn.Linear(hp['n_ae_latents'], hp['n_labels'], bias=False)

    def forward(self, x):
        z = self.FF_enc(self.encode_features(x))
        return self.decode(z), z, self.projection(z)

    def loss(self, x, labels, alpha):
        """Reference AEMSP.loss arithmetic, single chunk (aes.py:1019-1041):
        pixel MSE + alpha * (label MSE + back-projection MSE)."""
        x_hat, z, y_hat = self.forward(x)
        loss_msp = torch.mean((y_hat - labels) ** 2) \
            + torch.mean((z - y_hat @ self.projection.weight) ** 2)
        return torch.mean((x_hat - x) ** 2) + alpha * loss_msp

    def reference_state_dict(self):
        sd = super().reference_state_dict()
        sd['projection.weight'] = self.projection.weight
        # U is a save-time artifact (aes.py:1067-1080); zeros keep the import
        # path exercised without affecting training
        sd['U.weight'] = torch.zeros(self.hp['n_ae_latents'],
                                     self.hp['n_ae_latents'])
        return sd


# ---------------------------------------------------------------------------
# PS-VAE

class TorchRefPSVAE(TorchRefAE):
    """Torch PS-VAE with the reference's module graph and key naming.

    Encoder conv stack + FF (``hidden_layer_size == n_ae_latents``) feed
    fixed orthogonal maps A (-> supervised) / B (-> unsupervised); logvar
    comes off the pre-FF features; D is a trainable diagonal map from the
    supervised subspace to labels (reference vaes.py:1276-1364).
    ``forward`` takes an explicit ``eps`` so a lockstep harness can share
    the sampling noise with the JAX side; the reference's
    ``std = exp(logvar)`` reparameterization quirk (vaes.py:17-35) is kept.
    """

    def __init__(self, hp):
        super().__init__(hp)
        n_latents = hp['n_ae_latents']
        n_labels = hp['n_labels']
        fc_in = self.FF_enc.in_features
        self.logvar = nn.Linear(fc_in, n_latents)
        self.A = nn.Linear(n_latents, n_labels, bias=False)
        self.B = nn.Linear(n_latents, n_latents - n_labels, bias=False)
        m = TorchRefPSVAE.ortho_m(hp.get('rng_seed_model', 0), n_latents)
        with torch.no_grad():
            self.A.weight = nn.Parameter(torch.from_numpy(m[:n_labels].copy()),
                                         requires_grad=False)
            self.B.weight = nn.Parameter(torch.from_numpy(m[n_labels:].copy()),
                                         requires_grad=False)
        # diagonal label map (reference base.py:70 DiagLinear)
        bound = 1.0 / np.sqrt(n_labels)
        self.D_weight = nn.Parameter(torch.empty(n_labels).uniform_(-bound, bound))
        self.D_bias = nn.Parameter(torch.empty(n_labels).uniform_(-bound, bound))

    @staticmethod
    def ortho_m(seed, dim):
        from scipy.stats import ortho_group
        rng = np.random.RandomState(seed)
        return ortho_group.rvs(dim=dim, random_state=rng).astype(np.float32)

    def forward(self, x, eps=None):
        x1 = self.encode_features(x)
        mu_ff = self.FF_enc(x1)
        logvar = self.logvar(x1)
        y = self.A(mu_ff)
        w = self.B(mu_ff)
        mu = torch.cat([y, w], dim=1)
        if eps is None:
            z = mu
        else:
            z = eps * torch.exp(logvar) + mu
        x_hat = self.decode(z)
        y_hat = y * self.D_weight + self.D_bias
        return x_hat, z, mu, logvar, y_hat

    def loss(self, x, labels, eps, alpha, beta, kl=1.0):
        """Reference PSVAE.loss arithmetic, single chunk (vaes.py:605-700)."""
        n_labels = self.hp['n_labels']
        x_hat, sample, mu, logvar, y_hat = self.forward(x, eps=eps)
        loss = -t_gaussian_ll(x, x_hat)
        loss = loss - alpha * t_gaussian_ll(labels, y_hat)
        loss = loss + t_kl_div_to_std_normal(mu[:, :n_labels], logvar[:, :n_labels])
        mi, tc, dwkl = t_decomposed_kl(
            sample[:, n_labels:], mu[:, n_labels:], logvar[:, n_labels:])
        loss = loss + kl * mi + beta * tc + kl * dwkl
        return loss

    def reference_state_dict(self):
        sd = super().reference_state_dict()
        sd['encoding.logvar.weight'] = self.logvar.weight
        sd['encoding.logvar.bias'] = self.logvar.bias
        sd['encoding.A.weight'] = self.A.weight
        sd['encoding.B.weight'] = self.B.weight
        sd['encoding.D.weight'] = self.D_weight
        sd['encoding.D.bias'] = self.D_bias
        return sd


# ---------------------------------------------------------------------------
# MSPS-VAE (multi-session)

def t_triplet_2ds(triplet_obj, z, perms, seg_lens):
    """Reference 2-dataset triplet enumeration with *given* permutations.

    The reference draws the per-session permutations with host
    ``np.random.permutation`` (fitting/losses.py:402-441); a lockstep
    harness passes the permutations the JAX side drew so both sides chunk
    identically. ``perms[ds]`` holds local row indices into session ds's
    contiguous (dataset-major) segment; the divide-by-3 keeps the
    reference's ``n_loss_terms = 3`` legacy normalization.
    """
    n_chunks = 3
    a_full = np.asarray(perms[0])
    b_full = np.asarray(perms[1]) + int(seg_lens[0])
    m = min(len(a_full) // n_chunks, len(b_full) // n_chunks)
    a = [torch.as_tensor(a_full[i::n_chunks][:m].copy()) for i in range(n_chunks)]
    b = [torch.as_tensor(b_full[i::n_chunks][:m].copy()) for i in range(n_chunks)]
    loss = triplet_obj(z[a[0]], z[a[1]], z[b[2]]) \
        + triplet_obj(z[b[0]], z[b[1]], z[a[2]]) \
        + torch.pairwise_distance(z[a[0]], z[a[1]]).mean() \
        + torch.pairwise_distance(z[b[0]], z[b[1]]).mean()
    return loss / 3


class TorchRefMSPSVAE(TorchRefPSVAE):
    """Torch MSPS-VAE: PS-VAE plus a fixed background subspace C and the
    cross-session triplet loss (reference vaes.py:849-1072, encoder
    vaes.py:1366-1465).

    The orthogonal completion splits row-wise into A (supervised,
    ``n_labels`` rows), C (background, next ``n_background`` rows, plus a
    trainable bias), and B (unsupervised, remaining rows); latents order as
    ``[z_s, z_b, z_u]``. Background dims carry no KL term — only the
    triplet embedding loss.
    """

    def __init__(self, hp):
        super().__init__(hp)
        n_latents = hp['n_ae_latents']
        n_labels = hp['n_labels']
        n_bg = int(hp.get('n_background', 4))
        self.n_bg = n_bg
        self.B = nn.Linear(n_latents, n_latents - n_labels - n_bg, bias=False)
        self.C = nn.Linear(n_latents, n_bg, bias=True)
        m = TorchRefPSVAE.ortho_m(hp.get('rng_seed_model', 0), n_latents)
        with torch.no_grad():
            self.A.weight = nn.Parameter(
                torch.from_numpy(m[:n_labels].copy()), requires_grad=False)
            self.B.weight = nn.Parameter(
                torch.from_numpy(m[n_labels + n_bg:].copy()), requires_grad=False)
            self.C.weight = nn.Parameter(
                torch.from_numpy(m[n_labels:n_labels + n_bg].copy()),
                requires_grad=False)
        self.TripletLoss = nn.TripletMarginLoss(margin=1.0, p=2)

    def forward(self, x, eps=None):
        x1 = self.encode_features(x)
        mu_ff = self.FF_enc(x1)
        logvar = self.logvar(x1)
        z_s = self.A(mu_ff)
        z_u = self.B(mu_ff)
        z_b = self.C(mu_ff)
        mu = torch.cat([z_s, z_b, z_u], dim=1)
        z = mu if eps is None else eps * torch.exp(logvar) + mu
        x_hat = self.decode(z)
        y_hat = z_s * self.D_weight + self.D_bias
        return x_hat, z, mu, logvar, y_hat

    def loss(self, x, labels, eps, perms, seg_lens, alpha, beta, delta, kl=1.0):
        """Reference MSPSVAE.loss arithmetic, single chunk (vaes.py:925-1047)."""
        n_labels = self.hp['n_labels']
        n_bg = self.n_bg
        x_hat, sample, mu, logvar, y_hat = self.forward(x, eps=eps)
        loss = -t_gaussian_ll(x, x_hat)
        loss = loss - alpha * t_gaussian_ll(labels, y_hat)
        loss = loss + t_kl_div_to_std_normal(mu[:, :n_labels], logvar[:, :n_labels])
        mi, tc, dwkl = t_decomposed_kl(
            sample[:, n_labels + n_bg:], mu[:, n_labels + n_bg:],
            logvar[:, n_labels + n_bg:])
        loss = loss + kl * mi + beta * tc + kl * dwkl
        z_bg = mu[:, n_labels:n_labels + n_bg]
        loss = loss + delta * t_triplet_2ds(self.TripletLoss, z_bg, perms, seg_lens)
        return loss

    def reference_state_dict(self):
        sd = super().reference_state_dict()
        sd['encoding.C.weight'] = self.C.weight
        sd['encoding.C.bias'] = self.C.bias
        return sd


# ---------------------------------------------------------------------------
# MLP neural decoder

class TorchRefMLPDecoder(nn.Module):
    """Torch MLP decoder: temporal Conv1d first layer + dense stack.

    Mirrors the reference's module graph (decoders.py:155-326): Conv1d over
    time with kernel ``2*n_lags+1`` and same padding, mid-layer activations,
    final-layer activation selected by the noise dist (softplus for
    poisson, identity for gaussian/categorical).
    """

    _ACTS = {'linear': None, 'relu': F.relu,
             'lrelu': lambda x: F.leaky_relu(x, 0.05),
             'sigmoid': torch.sigmoid, 'tanh': torch.tanh}

    def __init__(self, hp):
        super().__init__()
        self.hp = hp
        in_size = hp['input_size']
        n_hid = hp['n_hid_layers']
        out0 = hp['output_size'] if n_hid == 0 else hp['n_hid_units']
        self.conv = nn.Conv1d(in_size, out0, hp['n_lags'] * 2 + 1,
                              padding=hp['n_lags'])
        self.dense = nn.ModuleList()
        cur = out0
        for i in range(n_hid):
            nxt = hp['output_size'] if i == n_hid - 1 else hp['n_hid_units']
            self.dense.append(nn.Linear(cur, nxt))
            cur = nxt

    def forward(self, x):
        """x: (time, neurons) -> predictions (time, output_size)."""
        hp = self.hp
        act = self._ACTS[hp.get('activation', 'relu')]
        final_act = F.softplus if hp['noise_dist'] == 'poisson' else None
        h = self.conv(x.transpose(1, 0).unsqueeze(0)).squeeze(0).transpose(1, 0)
        n_hid = hp['n_hid_layers']
        if n_hid == 0:
            return final_act(h) if final_act is not None else h
        if act is not None:
            h = act(h)
        for i, layer in enumerate(self.dense):
            h = layer(h)
            if i == n_hid - 1:
                if final_act is not None:
                    h = final_act(h)
            elif act is not None:
                h = act(h)
        return h

    def loss(self, predictors, targets):
        """Reference Decoder.loss arithmetic, single chunk (decoders.py:70-152).

        Returns the chunk-weighted loss ``mse(window) * (T - 2L) / T``; the
        reference backprops the unscaled per-chunk mean, which differs only
        by a positive constant (invisible to Adam up to eps effects) — the
        lockstep harness backprops this scaled value to match the JAX
        gradient exactly.
        """
        L = self.hp['n_max_lags']
        T = targets.shape[0]
        out = self.forward(predictors)
        mse = torch.mean((out[L:T - L] - targets[L:T - L]) ** 2)
        return mse * (T - 2 * L) / T

    def to_jax_params(self):
        """Export weights as a behavenet_tpu MLP params pytree.

        Copies explicitly: jnp.asarray zero-copies contiguous host arrays,
        and a .numpy() view of a live torch parameter would alias memory
        that optimizer.step() later mutates in place.
        """
        import jax.numpy as jnp
        params = {'conv': {
            'w': jnp.asarray(self.conv.weight.detach().numpy().transpose(2, 1, 0).copy()),
            'b': jnp.asarray(self.conv.bias.detach().numpy().copy()),
        }}
        for i, layer in enumerate(self.dense):
            params['dense_%d' % i] = {
                'w': jnp.asarray(layer.weight.detach().numpy().T.copy()),
                'b': jnp.asarray(layer.bias.detach().numpy().copy()),
            }
        return params
