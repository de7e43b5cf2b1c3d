"""Long-horizon training parity checks vs equivalent torch models.

BASELINE.md target: metrics within 1% of the PyTorch reference over
training. For each model the same architecture is built in behavenet_tpu
and in torch (identical init — the torch state dict is imported, identical
batch sequence, Adam(amsgrad) with the same hyperparameters, shared
sampling noise where the model is variational) and trained in lockstep for
N steps; the converged-regime relative loss gap is reported.

Covered models (VERDICT r3 item 2, completed VERDICT r4 item 4):
- ``ae``      — conv AE (reference models/aes.py)
- ``vae``     — beta-VAE incl. the beta-anneal schedule
  (reference models/vaes.py:38-209)
- ``btcvae``  — Beta-TC-VAE: decomposed-KL ELBO gradients + twin anneal
  schedules (reference models/vaes.py:367-505)
- ``condae``  — conditional AE with ``conditional_encoder`` ON: one-hot 2D
  label maps at the encoder input + continuous labels at the latent layer
  (reference models/aes.py:776-899)
- ``condvae`` — conditional VAE: labels concatenated to the sampled
  latents, shared beta-anneal schedule (reference models/vaes.py:211-365)
- ``aemsp``   — AEMSP / cond-ae-msp: matrix-subspace-projection penalty
  (reference models/aes.py:901-1080)
- ``psvae``   — PS-VAE incl. the full KL decomposition + label head
  (reference models/vaes.py:506-846)
- ``mspsvae`` — multi-session PS-VAE incl. the background subspace and the
  cross-session triplet loss with shared chunk permutations
  (reference models/vaes.py:849-1072, fitting/losses.py:402-441)
- ``decoder`` — MLP neural decoder incl. Conv1d lag window + lag trimming
  (reference models/decoders.py:14-327)
- ``convdecoder`` — conv label-decoder (labels-images)
  (reference models/decoders.py:355-496)

Run on CPU:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/parity_check.py [--json] [--model ae]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from behavenet_tpu.ops import optim

from behavenet_tpu.models import (AE, AEMSP, MSPSVAE, PSVAE, VAE, BetaTCVAE,
                                  ConditionalAE, ConditionalVAE)
from behavenet_tpu.models.decoders import ConvDecoder, Decoder
from behavenet_tpu.utils.torch_import import torch_state_dict_to_params
from test_utils.test_torch_import import TorchRefAE, build_hparams
from test_utils.torch_ref_models import (
    TorchRefAEMSP, TorchRefBetaTCVAE, TorchRefCondAE, TorchRefCondVAE,
    TorchRefMLPDecoder, TorchRefMSPSVAE, TorchRefPSVAE, TorchRefVAE)


def _report(name, i, lj, lt, rel):
    print('%-8s step %4d: jax loss %.6f | torch loss %.6f | rel gap %.4f%%' % (
        name, i, lj, lt, rel * 100))


def _blob_batches(rs, batch, h, w, n_steps):
    """Structured frames (moving blob) + blob-position labels."""
    yy, xx = np.mgrid[:h, :w]
    for _ in range(n_steps):
        pos = rs.rand(batch, 2) * [h - 4, w - 4] + 2
        ims = np.exp(-((yy[None] - pos[:, 0, None, None]) ** 2
                       + (xx[None] - pos[:, 1, None, None]) ** 2) / 12.0)
        labels = ((pos - [h / 2, w / 2]) / [h / 4, w / 4]).astype(np.float32)
        yield ims[..., None].astype(np.float32), labels


def parity_ae(n_steps=200, batch=32, lr=1e-3, report_every=50):
    """Conv-AE lockstep parity (as in rounds 1-3)."""
    hp = build_hparams(img=(1, 32, 24), n_latents=5)
    torch.manual_seed(0)
    ref = TorchRefAE(hp)

    model = AE(hp)
    params = model.init(jax.random.PRNGKey(0))
    params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)

    tx = optim.amsgrad(lr)
    opt_state = tx.init(params)
    opt_t = torch.optim.Adam(ref.parameters(), lr=lr, amsgrad=True)

    @jax.jit
    def step(params, opt_state, batch_d):
        def lf(p):
            return model.loss_fn(p, batch_d, jax.random.PRNGKey(0))[0]
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    gaps = []
    for i, (x, _) in enumerate(_blob_batches(np.random.RandomState(0), batch, 32, 24, n_steps), 1):
        params, opt_state, loss = step(params, opt_state, {'images': jnp.asarray(x)})
        opt_t.zero_grad()
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        y_t, _ = ref(xt)
        loss_t = torch.mean((y_t - xt) ** 2)
        loss_t.backward()
        opt_t.step()
        lj, lt = float(loss), float(loss_t)
        rel = abs(lj - lt) / max(abs(lt), 1e-12)
        gaps.append(rel)
        if i % report_every == 0 or i == 1:
            _report('ae', i, lj, lt, rel)
    return float(np.mean(gaps[-n_steps // 4:]))


def parity_vae(n_steps=200, batch=32, lr=1e-4, report_every=50, beta=4.0,
               anneal_epochs=100):
    """VAE lockstep parity incl. the beta-anneal schedule (vaes.py:38-209).

    Each step advances the epoch counter so the linear 0 -> beta ramp (and
    the reference's post-ramp drop to 1.0, vaes.py:96-98) is exercised in
    lockstep; sampling noise is shared via an explicit eps (the same draw
    the jitted loss makes internally from its key).
    """
    h_img, w_img, n_latents = 32, 24, 5
    hp = build_hparams(
        img=(1, h_img, w_img), n_latents=n_latents, model_class='vae',
        max_n_epochs=n_steps, variational=True,
        **{'vae.beta': beta, 'vae.beta_anneal_epochs': anneal_epochs})
    torch.manual_seed(0)
    ref = TorchRefVAE(hp)

    model = VAE(hp)
    params = model.init(jax.random.PRNGKey(0))
    params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)

    tx = optim.amsgrad(lr)
    opt_state = tx.init(params)
    opt_t = torch.optim.Adam(ref.parameters(), lr=lr, amsgrad=True)

    @jax.jit
    def step(params, opt_state, batch_d, rng, beta_t):
        def lf(p):
            return model.loss_fn(p, batch_d, rng, beta=beta_t)[0]
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    gaps = []
    data = _blob_batches(np.random.RandomState(6), batch, h_img, w_img, n_steps)
    for i, (x, _) in enumerate(data, 1):
        rng = jax.random.PRNGKey(3000 + i)
        eps = np.asarray(jax.random.normal(rng, (batch, n_latents), jnp.float32))
        beta_i = float(model.beta_vals[i - 1])  # step i == epoch i-1
        params, opt_state, loss = step(
            params, opt_state, {'images': jnp.asarray(x)}, rng,
            jnp.float32(beta_i))
        opt_t.zero_grad()
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        loss_t = ref.loss(xt, torch.tensor(eps), beta=beta_i)
        loss_t.backward()
        opt_t.step()
        lj, lt = float(loss), float(loss_t)
        rel = abs(lj - lt) / max(abs(lt), 1e-12)
        gaps.append(rel)
        if i % report_every == 0 or i == 1:
            _report('vae', i, lj, lt, rel)
    return float(np.mean(gaps[-n_steps // 4:]))


def parity_btcvae(n_steps=200, batch=64, lr=1e-4, report_every=50, beta=5.0,
                  anneal_epochs=100):
    """Beta-TC-VAE lockstep parity: decomposed-KL ELBO gradients (the
    minibatch MI/TC/DWKL estimators, vaes.py:411-505) plus the twin
    anneal schedules (TC ramps 0 -> beta while MI/DWKL ramp 0 -> 1)."""
    h_img, w_img, n_latents = 32, 24, 6
    hp = build_hparams(
        img=(1, h_img, w_img), n_latents=n_latents, model_class='beta-tcvae',
        max_n_epochs=n_steps, variational=True,
        **{'beta_tcvae.beta': beta,
           'beta_tcvae.beta_anneal_epochs': anneal_epochs})
    torch.manual_seed(0)
    ref = TorchRefBetaTCVAE(hp)

    model = BetaTCVAE(hp)
    params = model.init(jax.random.PRNGKey(0))
    params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)

    tx = optim.amsgrad(lr)
    opt_state = tx.init(params)
    opt_t = torch.optim.Adam(ref.parameters(), lr=lr, amsgrad=True)

    @jax.jit
    def step(params, opt_state, batch_d, rng, beta_t, kl_t):
        def lf(p):
            return model.loss_fn(p, batch_d, rng, beta=beta_t, kl=kl_t)[0]
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    gaps = []
    data = _blob_batches(np.random.RandomState(7), batch, h_img, w_img, n_steps)
    for i, (x, _) in enumerate(data, 1):
        rng = jax.random.PRNGKey(4000 + i)
        eps = np.asarray(jax.random.normal(rng, (batch, n_latents), jnp.float32))
        beta_i = float(model.beta_vals[i - 1])
        kl_i = float(model.kl_anneal_vals[i - 1])
        params, opt_state, loss = step(
            params, opt_state, {'images': jnp.asarray(x)}, rng,
            jnp.float32(beta_i), jnp.float32(kl_i))
        opt_t.zero_grad()
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        loss_t = ref.loss(xt, torch.tensor(eps), beta=beta_i, kl=kl_i)
        loss_t.backward()
        opt_t.step()
        lj, lt = float(loss), float(loss_t)
        rel = abs(lj - lt) / max(abs(lt), 1e-12)
        gaps.append(rel)
        if i % report_every == 0 or i == 1:
            _report('btcvae', i, lj, lt, rel)
    return float(np.mean(gaps[-n_steps // 4:]))


def _blob_onehot2d(labels, h, w):
    """(batch, 2) normalized blob labels -> (batch, h, w, 1) spatial one-hot.

    The same derivation MakeOneHot2D applies to the labels_sc signal
    (transforms.py:111-139), computed once here and fed to BOTH frameworks
    so the conditional-encoder input channels are bit-identical.
    """
    pos = labels * [h / 4, w / 4] + [h / 2, w / 2]
    b = labels.shape[0]
    oh = np.zeros((b, h, w, 1), np.float32)
    yi = np.clip(np.round(pos[:, 0]).astype(int), 0, h - 1)
    xi = np.clip(np.round(pos[:, 1]).astype(int), 0, w - 1)
    oh[np.arange(b), yi, xi, 0] = 1.0
    return oh


def parity_condae(n_steps=200, batch=32, lr=1e-3, report_every=50):
    """Conditional-AE lockstep parity with ``conditional_encoder`` ON, so
    both label concatenations are exercised: the spatial one-hot maps at
    the encoder input (reference aes.py:130-137, 831-836) and the
    continuous labels at the latent layer (aes.py:836)."""
    h_img, w_img, n_labels = 32, 24, 2
    hp = build_hparams(img=(1, h_img, w_img), n_latents=5,
                       model_class='cond-ae', n_labels=n_labels,
                       conditional_encoder=True)
    torch.manual_seed(0)
    ref = TorchRefCondAE(hp)

    model = ConditionalAE(hp)
    params = model.init(jax.random.PRNGKey(0))
    params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)

    tx = optim.amsgrad(lr)
    opt_state = tx.init(params)
    opt_t = torch.optim.Adam(ref.parameters(), lr=lr, amsgrad=True)

    @jax.jit
    def step(params, opt_state, batch_d):
        def lf(p):
            return model.loss_fn(p, batch_d, jax.random.PRNGKey(0))[0]
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    gaps = []
    data = _blob_batches(np.random.RandomState(12), batch, h_img, w_img, n_steps)
    for i, (x, labels) in enumerate(data, 1):
        oh = _blob_onehot2d(labels, h_img, w_img)
        params, opt_state, loss = step(
            params, opt_state,
            {'images': jnp.asarray(x), 'labels': jnp.asarray(labels),
             'labels_sc': jnp.asarray(oh)})
        opt_t.zero_grad()
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        loss_t = ref.loss(xt, torch.tensor(labels),
                          labels_2d=torch.tensor(np.transpose(oh, (0, 3, 1, 2))))
        loss_t.backward()
        opt_t.step()
        lj, lt = float(loss), float(loss_t)
        rel = abs(lj - lt) / max(abs(lt), 1e-12)
        gaps.append(rel)
        if i % report_every == 0 or i == 1:
            _report('condae', i, lj, lt, rel)
    return float(np.mean(gaps[-n_steps // 4:]))


def parity_condvae(n_steps=200, batch=32, lr=1e-4, report_every=50, beta=4.0,
                   anneal_epochs=100):
    """Conditional-VAE lockstep parity (vaes.py:211-365): the VAE ELBO with
    labels concatenated to the sampled latents before decoding, incl. the
    shared beta-anneal schedule."""
    h_img, w_img, n_latents, n_labels = 32, 24, 5, 2
    hp = build_hparams(
        img=(1, h_img, w_img), n_latents=n_latents, model_class='cond-vae',
        n_labels=n_labels, conditional_encoder=False, max_n_epochs=n_steps,
        variational=True, **{'vae.beta': beta, 'vae.beta_anneal_epochs': anneal_epochs})
    torch.manual_seed(0)
    ref = TorchRefCondVAE(hp)

    model = ConditionalVAE(hp)
    params = model.init(jax.random.PRNGKey(0))
    params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)

    tx = optim.amsgrad(lr)
    opt_state = tx.init(params)
    opt_t = torch.optim.Adam(ref.parameters(), lr=lr, amsgrad=True)

    @jax.jit
    def step(params, opt_state, batch_d, rng, beta_t):
        def lf(p):
            return model.loss_fn(p, batch_d, rng, beta=beta_t)[0]
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    gaps = []
    data = _blob_batches(np.random.RandomState(13), batch, h_img, w_img, n_steps)
    for i, (x, labels) in enumerate(data, 1):
        rng = jax.random.PRNGKey(7000 + i)
        eps = np.asarray(jax.random.normal(rng, (batch, n_latents), jnp.float32))
        beta_i = float(model.beta_vals[i - 1])
        params, opt_state, loss = step(
            params, opt_state,
            {'images': jnp.asarray(x), 'labels': jnp.asarray(labels)},
            rng, jnp.float32(beta_i))
        opt_t.zero_grad()
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        loss_t = ref.loss(xt, torch.tensor(labels), torch.tensor(eps), beta=beta_i)
        loss_t.backward()
        opt_t.step()
        lj, lt = float(loss), float(loss_t)
        rel = abs(lj - lt) / max(abs(lt), 1e-12)
        gaps.append(rel)
        if i % report_every == 0 or i == 1:
            _report('condvae', i, lj, lt, rel)
    return float(np.mean(gaps[-n_steps // 4:]))


def parity_aemsp(n_steps=200, batch=32, lr=1e-3, report_every=50, alpha=20.0):
    """AEMSP (cond-ae-msp) lockstep parity: pixel MSE + alpha * (label MSE +
    back-projection MSE) through the trainable projection (aes.py:1019-1041)."""
    h_img, w_img, n_labels = 32, 24, 2
    hp = build_hparams(img=(1, h_img, w_img), n_latents=5,
                       model_class='cond-ae-msp', n_labels=n_labels,
                       **{'msp.alpha': alpha})
    torch.manual_seed(0)
    ref = TorchRefAEMSP(hp)

    model = AEMSP(hp)
    params = model.init(jax.random.PRNGKey(0))
    params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)

    tx = optim.amsgrad(lr)
    opt_state = tx.init(params)
    opt_t = torch.optim.Adam(ref.parameters(), lr=lr, amsgrad=True)

    @jax.jit
    def step(params, opt_state, batch_d):
        def lf(p):
            return model.loss_fn(p, batch_d, jax.random.PRNGKey(0))[0]
        # U (the save-time orthogonal completion) has no grad path: its
        # gradient is exactly zero, so Adam leaves it untouched on both sides
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    gaps = []
    data = _blob_batches(np.random.RandomState(8), batch, h_img, w_img, n_steps)
    for i, (x, labels) in enumerate(data, 1):
        params, opt_state, loss = step(
            params, opt_state,
            {'images': jnp.asarray(x), 'labels': jnp.asarray(labels)})
        opt_t.zero_grad()
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        loss_t = ref.loss(xt, torch.tensor(labels), alpha=alpha)
        loss_t.backward()
        opt_t.step()
        lj, lt = float(loss), float(loss_t)
        rel = abs(lj - lt) / max(abs(lt), 1e-12)
        gaps.append(rel)
        if i % report_every == 0 or i == 1:
            _report('aemsp', i, lj, lt, rel)
    return float(np.mean(gaps[-n_steps // 4:]))


def parity_psvae(n_steps=200, batch=64, lr=1e-4, report_every=50,
                 alpha=50.0, beta=1.0):
    """PS-VAE lockstep parity: full KL decomposition + label head.

    Sampling noise is shared: both sides use eps drawn from the same JAX
    key the jitted loss uses internally, so z = eps * exp(logvar) + mu
    matches elementwise (reference reparameterize quirk, vaes.py:17-35).
    """
    h_img, w_img, n_latents, n_labels = 32, 24, 6, 2
    hp = build_hparams(
        img=(1, h_img, w_img), n_latents=n_latents, model_class='ps-vae',
        n_labels=n_labels, max_n_epochs=n_steps, variational=True,
        **{'ps_vae.alpha': alpha, 'ps_vae.beta': beta})
    torch.manual_seed(0)
    ref = TorchRefPSVAE(hp)

    model = PSVAE(hp)
    params = model.init(jax.random.PRNGKey(0))
    params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)

    tx = optim.amsgrad(lr)
    opt_state = tx.init(params)
    opt_t = torch.optim.Adam(
        [p for p in ref.parameters() if p.requires_grad], lr=lr, amsgrad=True)

    @jax.jit
    def step(params, opt_state, batch_d, rng):
        def lf(p):
            return model.loss_fn(p, batch_d, rng, beta=beta, kl=1.0, alpha=alpha)[0]
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    gaps = []
    data = _blob_batches(np.random.RandomState(1), batch, h_img, w_img, n_steps)
    for i, (x, labels) in enumerate(data, 1):
        rng = jax.random.PRNGKey(1000 + i)
        # the eps the jitted loss will draw internally
        eps = np.asarray(jax.random.normal(rng, (batch, n_latents), jnp.float32))
        params, opt_state, loss = step(
            params, opt_state,
            {'images': jnp.asarray(x), 'labels': jnp.asarray(labels)}, rng)
        opt_t.zero_grad()
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        loss_t = ref.loss(xt, torch.tensor(labels), torch.tensor(eps),
                          alpha=alpha, beta=beta)
        loss_t.backward()
        opt_t.step()
        lj, lt = float(loss), float(loss_t)
        rel = abs(lj - lt) / max(abs(lt), 1e-12)
        gaps.append(rel)
        if i % report_every == 0 or i == 1:
            _report('psvae', i, lj, lt, rel)
    return float(np.mean(gaps[-n_steps // 4:]))


def parity_mspsvae(n_steps=200, batch=48, lr=1e-4, report_every=50,
                   alpha=50.0, beta=1.0, delta=10.0):
    """MSPS-VAE lockstep parity: background subspace + cross-session triplet.

    Two synthetic sessions (different blob statistics + a per-session
    brightness offset so the background embedding carries real signal)
    concatenate dataset-major; both randomness sources are shared with the
    torch side — the reparameterization eps is drawn from the first split
    of the loss's key, and the triplet chunk permutations from the second
    split (mirroring ``MSPSVAE.loss_fn``'s internal ``jax.random.split`` /
    ``ops.losses.triplet_loss`` key derivation), fed to the torch model as
    explicit indices (the reference permutes with host numpy,
    fitting/losses.py:430-434).
    """
    h_img, w_img, n_latents, n_labels, n_bg = 32, 24, 6, 2, 2
    hp = build_hparams(
        img=(1, h_img, w_img), n_latents=n_latents, model_class='msps-vae',
        n_labels=n_labels, max_n_epochs=n_steps, variational=True,
        n_sessions_per_batch=2, n_background=n_bg,
        **{'ps_vae.alpha': alpha, 'ps_vae.beta': beta, 'ps_vae.delta': delta})
    torch.manual_seed(0)
    ref = TorchRefMSPSVAE(hp)

    model = MSPSVAE(hp)
    params = model.init(jax.random.PRNGKey(0))
    params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)

    tx = optim.amsgrad(lr)
    opt_state = tx.init(params)
    opt_t = torch.optim.Adam(
        [p for p in ref.parameters() if p.requires_grad], lr=lr, amsgrad=True)

    seg_lens = (batch, batch)

    @jax.jit
    def step(params, opt_state, batch_d, rng):
        def lf(p):
            return model.loss_fn(p, batch_d, rng, beta=beta, kl=1.0,
                                 alpha=alpha, delta=delta, seg_lens=seg_lens)[0]
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    gaps = []
    data_a = _blob_batches(np.random.RandomState(3), batch, h_img, w_img, n_steps)
    data_b = _blob_batches(np.random.RandomState(4), batch, h_img, w_img, n_steps)
    for i, ((xa, la), (xb, lb)) in enumerate(zip(data_a, data_b), 1):
        xb = 0.8 * xb + 0.1  # per-session appearance shift
        x = np.concatenate([xa, xb], axis=0)
        labels = np.concatenate([la, lb], axis=0)
        rng = jax.random.PRNGKey(2000 + i)
        # mirror loss_fn's internal key derivation
        rng_f, rng_t = jax.random.split(rng)
        eps = np.asarray(jax.random.normal(rng_f, (2 * batch, n_latents), jnp.float32))
        t_keys = jax.random.split(rng_t, 2)
        perms = [np.asarray(jax.random.permutation(t_keys[ds], batch))
                 for ds in range(2)]
        params, opt_state, loss = step(
            params, opt_state,
            {'images': jnp.asarray(x), 'labels': jnp.asarray(labels)}, rng)
        opt_t.zero_grad()
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        loss_t = ref.loss(xt, torch.tensor(labels), torch.tensor(eps),
                          perms, seg_lens, alpha=alpha, beta=beta, delta=delta)
        loss_t.backward()
        opt_t.step()
        lj, lt = float(loss), float(loss_t)
        rel = abs(lj - lt) / max(abs(lt), 1e-12)
        gaps.append(rel)
        if i % report_every == 0 or i == 1:
            _report('mspsvae', i, lj, lt, rel)
    return float(np.mean(gaps[-n_steps // 4:]))


def parity_decoder(n_steps=200, T=200, lr=1e-3, report_every=50):
    """MLP neural-decoder lockstep parity incl. Conv1d lag window + trimming."""
    n_in, n_out, n_lags, n_max_lags = 16, 4, 2, 3
    hp = {'model_type': 'mlp', 'model_class': 'neural-decoder',
          'input_size': n_in, 'output_size': n_out,
          'n_hid_layers': 2, 'n_hid_units': 16,
          'n_lags': n_lags, 'n_max_lags': n_max_lags,
          'noise_dist': 'gaussian', 'activation': 'relu'}
    torch.manual_seed(0)
    ref = TorchRefMLPDecoder(hp)

    model = Decoder(hp)
    params = ref.to_jax_params()

    tx = optim.amsgrad(lr)
    opt_state = tx.init(params)
    opt_t = torch.optim.Adam(ref.parameters(), lr=lr, amsgrad=True)

    @jax.jit
    def step(params, opt_state, batch_d):
        def lf(p):
            return model.loss_fn(p, batch_d, jax.random.PRNGKey(0))[0]
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # targets are a lagged linear readout of smoothed predictors, so the
    # temporal conv window carries real signal
    rs = np.random.RandomState(2)
    W = rs.randn(2 * n_lags + 1, n_in, n_out).astype(np.float32) / np.sqrt(n_in)

    def make_trial():
        raw = rs.randn(T + 8, n_in).astype(np.float32)
        pred = (raw[:-8] + raw[2:-6] + raw[4:-4] + raw[6:-2] + raw[8:]) / np.sqrt(5)
        tgt = np.zeros((T, n_out), np.float32)
        for k in range(2 * n_lags + 1):
            sh = np.roll(pred, n_lags - k, axis=0)
            tgt += sh @ W[k]
        tgt += 0.1 * rs.randn(T, n_out).astype(np.float32)
        return pred.astype(np.float32), tgt.astype(np.float32)

    gaps = []
    for i in range(1, n_steps + 1):
        pred, tgt = make_trial()
        params, opt_state, loss = step(
            params, opt_state,
            {'predictors': jnp.asarray(pred), 'targets': jnp.asarray(tgt)})
        opt_t.zero_grad()
        loss_t = ref.loss(torch.tensor(pred), torch.tensor(tgt))
        loss_t.backward()
        opt_t.step()
        lj, lt = float(loss), float(loss_t)
        rel = abs(lj - lt) / max(abs(lt), 1e-12)
        gaps.append(rel)
        if i % report_every == 0 or i == 1:
            _report('decoder', i, lj, lt, rel)
    return float(np.mean(gaps[-n_steps // 4:]))


def parity_convdecoder(n_steps=200, batch=32, lr=1e-3, report_every=50):
    """Conv label-decoder (labels-images) lockstep parity.

    The torch side reuses TorchRefAE's decoder half: with the arch built at
    ``n_latents == n_labels`` its FF + tconv stack is exactly the reference
    ConvDecoder (decoders.py:355-496 builds ConvAEDecoder with
    ``hidden_layer_size = n_labels``); encoder params sit in the optimizer
    with ``grad=None`` and are never touched.
    """
    h_img, w_img, n_labels = 32, 24, 2
    hp = build_hparams(img=(1, h_img, w_img), n_latents=n_labels,
                       model_class='labels-images', n_labels=n_labels)
    torch.manual_seed(0)
    ref = TorchRefAE(hp)

    model = ConvDecoder(hp)
    params = model.init(jax.random.PRNGKey(0))
    params = torch_state_dict_to_params(ref.reference_state_dict(), model, params)

    tx = optim.amsgrad(lr)
    opt_state = tx.init(params)
    opt_t = torch.optim.Adam(ref.parameters(), lr=lr, amsgrad=True)

    @jax.jit
    def step(params, opt_state, batch_d):
        def lf(p):
            return model.loss_fn(p, batch_d, jax.random.PRNGKey(0))[0]
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    gaps = []
    data = _blob_batches(np.random.RandomState(5), batch, h_img, w_img, n_steps)
    for i, (x, labels) in enumerate(data, 1):
        params, opt_state, loss = step(
            params, opt_state,
            {'images': jnp.asarray(x), 'labels': jnp.asarray(labels)})
        opt_t.zero_grad()
        xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        y_t = ref.decode(torch.tensor(labels))
        loss_t = torch.mean((y_t - xt) ** 2)
        loss_t.backward()
        opt_t.step()
        lj, lt = float(loss), float(loss_t)
        rel = abs(lj - lt) / max(abs(lt), 1e-12)
        gaps.append(rel)
        if i % report_every == 0 or i == 1:
            _report('convdec', i, lj, lt, rel)
    return float(np.mean(gaps[-n_steps // 4:]))


PARITIES = {'ae': parity_ae, 'vae': parity_vae, 'btcvae': parity_btcvae,
            'condae': parity_condae, 'condvae': parity_condvae,
            'aemsp': parity_aemsp, 'psvae': parity_psvae,
            'mspsvae': parity_mspsvae, 'decoder': parity_decoder,
            'convdecoder': parity_convdecoder}


def main(models=None):
    models = models or list(PARITIES)
    gaps = {}
    for name in models:
        gaps[name] = PARITIES[name]()
        print('%s converged-regime mean relative loss gap: %.4f%% (target: < 1%%)\n'
              % (name, gaps[name] * 100))
    return gaps


if __name__ == '__main__':
    which = None
    if '--model' in sys.argv:
        idx = sys.argv.index('--model') + 1
        if idx >= len(sys.argv) or sys.argv[idx] not in PARITIES:
            sys.exit('usage: parity_check.py [--model {%s}] [--json]'
                     % '|'.join(PARITIES))
        which = [sys.argv[idx]]
    gaps = main(which)
    if '--json' in sys.argv:
        # machine-readable line for bench.py (last line of stdout)
        import json
        payload = {k: v * 100 for k, v in gaps.items()}
        payload['converged_rel_gap_pct'] = max(payload.values())
        print(json.dumps(payload))
    sys.exit(0 if all(g < 0.01 for g in gaps.values()) else 1)
