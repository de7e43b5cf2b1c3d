"""Import reference (PyTorch) BehaveNet checkpoints into behavenet_tpu params.

The reference stores AE-family checkpoints as torch ``state_dict``s named by
module path (behavenet/models/aes.py builds e.g. ``encoding.encoder.conv0``,
``encoding.FF``, ``decoding.decoder.convtranspose4``; base.py:61-63 saves
them to ``best_val_model.pt``). This module maps those tensors onto the
functional param pytrees used here, handling the layout differences:

- torch Conv2d kernels (O, I, kh, kw) -> HWIO
- torch ConvTranspose2d kernels (I, O, kh, kw) -> HWIO (forward orientation)
- dense layers: torch (out, in) -> (in, out)
- flattening order: torch flattens conv activations channel-major (C*H*W);
  the NHWC pipeline here flattens (H*W*C). The encoder FF input dims and
  decoder FF output dims are permuted accordingly so forward passes match
  the reference bit-for-bit (up to f32 accumulation order).
"""

import numpy as np

import jax.numpy as jnp

__all__ = ['load_torch_ae_checkpoint', 'torch_state_dict_to_params',
           'params_to_torch_state_dict', 'save_torch_ae_checkpoint']


def _chw_to_hwc_perm(c, h, w):
    """Permutation p with flat_hwc[i] = flat_chw[p[i]]."""
    idx = np.arange(c * h * w).reshape(c, h, w)  # value = chw flat index
    return np.transpose(idx, (1, 2, 0)).reshape(-1)  # order by (h, w, c)


def torch_state_dict_to_params(state_dict, model, params):
    """Map a reference AE-family state dict onto a params pytree.

    Parameters
    ----------
    state_dict : dict of str -> np.ndarray (or torch tensors)
    model : behavenet_tpu.models AE-family model (for layer specs)
    params : existing params pytree (used for shapes; unmatched leaves kept)

    Returns
    -------
    new params pytree
    """
    # always copy: jnp.asarray zero-copies contiguous host arrays, and a
    # torch-tensor .numpy() view would leave the params pytree aliasing live
    # torch parameter memory (later optimizer.step() mutations would race
    # with asynchronously dispatched jax reads — found round 4 via the
    # lockstep parity harness)
    sd = {k: np.array(v.detach().cpu().numpy() if hasattr(v, 'detach') else v)
          for k, v in state_dict.items()}
    new = {k: (dict(v) if isinstance(v, dict) else v) for k, v in params.items()}
    # decoder-only models (ConvDecoder, reference decoders.py:355-496) have
    # no encoder half; everything below guards per-group
    if 'encoder' in params:
        new['encoder'] = dict(params['encoder'])
    new['decoder'] = dict(params['decoder'])

    hp = model.hparams

    # ---- encoder convs: reference names conv layers by global layer number
    conv_specs = [s for s in getattr(model, 'encoding', None).layers
                  if s['type'] == 'conv'] if hasattr(model, 'encoding') else []
    for g, spec in enumerate(conv_specs):
        for tkey in ('encoding.encoder.conv%i.weight' % g,):
            if tkey in sd:
                w = sd[tkey]  # (O, I, kh, kw)
                b = sd['encoding.encoder.conv%i.bias' % g]
                new['encoder'][spec['name']] = {
                    'w': jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                    'b': jnp.asarray(b),
                }

    # ---- batch-norm layers (reference names batchnorm%i alongside conv%i /
    # convtranspose%i; state dict carries weight/bias + running stats when
    # track_running_stats=True, aes.py:92-95, 332-336)
    for group, module, prefix in (('encoder', getattr(model, 'encoding', None),
                                   'encoding.encoder'),
                                  ('decoder', getattr(model, 'decoding', None),
                                   'decoding.decoder')):
        if module is None or not hasattr(module, 'layers'):
            continue
        bn_specs = [s for s in module.layers if s['type'] == 'bn']
        for g, spec in enumerate(bn_specs):
            tkey = '%s.batchnorm%i.weight' % (prefix, g)
            if tkey not in sd:
                continue
            p = {'gamma': jnp.asarray(sd[tkey]),
                 'beta': jnp.asarray(sd['%s.batchnorm%i.bias' % (prefix, g)])}
            rm_key = '%s.batchnorm%i.running_mean' % (prefix, g)
            if rm_key in sd:
                p['running_mean'] = jnp.asarray(sd[rm_key])
                p['running_var'] = jnp.asarray(
                    sd['%s.batchnorm%i.running_var' % (prefix, g)])
                nb = sd.get('%s.batchnorm%i.num_batches_tracked' % (prefix, g), 0)
                p['num_batches'] = jnp.asarray(float(np.asarray(nb)))
            new[group][spec['name']] = p

    # ---- encoder FF (+ logvar): permute input dims CHW -> HWC
    if 'encoder' in new:
        c_last = hp['ae_encoding_n_channels'][-1]
        h_last = hp['ae_encoding_y_dim'][-1]
        w_last = hp['ae_encoding_x_dim'][-1]
        perm_in = _chw_to_hwc_perm(c_last, h_last, w_last)
    for tname, pname in (('FF', 'fc'), ('logvar', 'logvar')):
        tkey = 'encoding.%s.weight' % tname
        if tkey in sd and pname in new.get('encoder', {}):
            w = sd[tkey]  # (n_latents, fc_in_chw)
            b = sd['encoding.%s.bias' % tname]
            new['encoder'][pname] = {
                'w': jnp.asarray(w[:, perm_in].T),
                'b': jnp.asarray(b),
            }

    # ---- decoder FF: permute output dims CHW -> HWC
    c0, h0, w0 = hp['ae_decoding_starting_dim']
    perm_out = _chw_to_hwc_perm(c0, h0, w0)
    if 'decoding.FF.weight' in sd:
        w = sd['decoding.FF.weight']  # (first_conv_chw, hidden)
        b = sd['decoding.FF.bias']
        new['decoder']['fc'] = {
            'w': jnp.asarray(w[perm_out, :].T),
            'b': jnp.asarray(b[perm_out]),
        }

    # ---- decoder conv-transposes
    convt_specs = [s for s in model.decoding.layers if s['type'] == 'convtranspose']
    for g, spec in enumerate(convt_specs):
        tkey = 'decoding.decoder.convtranspose%i.weight' % g
        if tkey in sd:
            w = sd[tkey]  # (I, O, kh, kw)
            b = sd['decoding.decoder.convtranspose%i.bias' % g]
            new['decoder'][spec['name']] = {
                'w': jnp.asarray(np.transpose(w, (2, 3, 0, 1))),
                'b': jnp.asarray(b),
            }

    # ---- AEMSP projection / U
    if 'projection.weight' in sd and 'projection' in params:
        new['projection'] = {'w': jnp.asarray(sd['projection.weight'].T)}
    if 'U.weight' in sd and 'U' in params:
        new['U'] = jnp.asarray(sd['U.weight'])

    # ---- PS-VAE heads (fixed orthogonal maps + diagonal label map)
    if 'encoding.A.weight' in sd and 'A' in params.get('encoder', {}):
        new['encoder']['A'] = jnp.asarray(sd['encoding.A.weight'].T)
    if 'encoding.B.weight' in sd and 'B' in params.get('encoder', {}):
        new['encoder']['B'] = jnp.asarray(sd['encoding.B.weight'].T)
    if 'encoding.C.weight' in sd and 'C' in params.get('encoder', {}):
        new['encoder']['C'] = jnp.asarray(sd['encoding.C.weight'].T)
        if 'encoding.C.bias' in sd:
            new['encoder']['C_b'] = jnp.asarray(sd['encoding.C.bias'])
    if 'encoding.D.weight' in sd and 'D' in params.get('encoder', {}):
        new['encoder']['D'] = {
            'd': jnp.asarray(sd['encoding.D.weight']).reshape(-1),
            'b': jnp.asarray(sd['encoding.D.bias']).reshape(-1),
        }

    # ---- linear AE
    if 'encoding.encoder.weight' in sd:
        # torch flattens images channel-major; permute input dims
        c, h, w = model.img_size
        perm = _chw_to_hwc_perm(c, h, w)
        wt = sd['encoding.encoder.weight']  # (n_latents, chw)
        new['encoder'] = {
            'w': jnp.asarray(wt[:, perm].T),
            'b': jnp.asarray(sd['encoding.encoder.bias']),
        }
        if 'decoding.bias' in sd:
            new['decoder'] = {'b': jnp.asarray(sd['decoding.bias'][perm])}

    return new


def params_to_torch_state_dict(model, params):
    """Export a params pytree as a reference-named torch state dict.

    Exact inverse of :func:`torch_state_dict_to_params`: tensors come back
    in the reference's layouts ((O, I, kh, kw) convs, (I, O, kh, kw)
    conv-transposes, channel-major dense flattening) under the reference's
    module names (behavenet/models/aes.py builds ``encoding.encoder.conv%i``
    etc.; base.py:61-63 saves that naming), so the produced dict loads into
    a reference model with ``load_state_dict`` and lets trained models
    round-trip back into the torch ecosystem.

    Returns a dict of str -> np.ndarray (f32; ``num_batches_tracked`` int64).
    """
    hp = model.hparams
    sd = {}

    def to_np(x):
        return np.asarray(jnp.asarray(x), dtype=np.float32)

    enc = params.get('encoder', {})
    dec = params.get('decoder', {})

    # ---- linear AE (params are a flat {'w','b'} encoder, tied decoder)
    if isinstance(enc, dict) and 'w' in enc and 'fc' not in enc:
        c, h, w = model.img_size
        perm = _chw_to_hwc_perm(c, h, w)
        wt = np.empty_like(to_np(enc['w']).T)      # (n_latents, chw)
        wt[:, perm] = to_np(enc['w']).T
        sd['encoding.encoder.weight'] = wt
        sd['encoding.encoder.bias'] = to_np(enc['b'])
        if isinstance(dec, dict) and 'b' in dec:
            bt = np.empty_like(to_np(dec['b']))
            bt[perm] = to_np(dec['b'])
            sd['decoding.bias'] = bt
        return sd

    # ---- encoder convs (absent on decoder-only models, e.g. ConvDecoder)
    conv_specs = [s for s in getattr(model, 'encoding', None).layers
                  if s['type'] == 'conv'] if hasattr(model, 'encoding') else []
    for g, spec in enumerate(conv_specs):
        p = enc.get(spec['name'])
        if p is not None:
            sd['encoding.encoder.conv%i.weight' % g] = \
                np.transpose(to_np(p['w']), (3, 2, 0, 1))
            sd['encoding.encoder.conv%i.bias' % g] = to_np(p['b'])

    # ---- batch-norm layers
    for group, module, prefix in (('encoder', getattr(model, 'encoding', None),
                                   'encoding.encoder'),
                                  ('decoder', getattr(model, 'decoding', None),
                                   'decoding.decoder')):
        if module is None or not hasattr(module, 'layers'):
            continue
        src = params.get(group, {})
        bn_specs = [s for s in module.layers if s['type'] == 'bn']
        for g, spec in enumerate(bn_specs):
            p = src.get(spec['name'])
            if p is None:
                continue
            sd['%s.batchnorm%i.weight' % (prefix, g)] = to_np(p['gamma'])
            sd['%s.batchnorm%i.bias' % (prefix, g)] = to_np(p['beta'])
            if 'running_mean' in p:
                sd['%s.batchnorm%i.running_mean' % (prefix, g)] = \
                    to_np(p['running_mean'])
                sd['%s.batchnorm%i.running_var' % (prefix, g)] = \
                    to_np(p['running_var'])
                sd['%s.batchnorm%i.num_batches_tracked' % (prefix, g)] = \
                    np.int64(np.asarray(p['num_batches']))

    # ---- encoder FF (+ logvar): permute input dims HWC -> CHW
    c_last = hp['ae_encoding_n_channels'][-1]
    h_last = hp['ae_encoding_y_dim'][-1]
    w_last = hp['ae_encoding_x_dim'][-1]
    perm_in = _chw_to_hwc_perm(c_last, h_last, w_last)
    for tname, pname in (('FF', 'fc'), ('logvar', 'logvar')):
        p = enc.get(pname)
        if isinstance(p, dict) and 'w' in p:
            wt = np.empty_like(to_np(p['w']).T)    # (n_latents, fc_in_chw)
            wt[:, perm_in] = to_np(p['w']).T
            sd['encoding.%s.weight' % tname] = wt
            sd['encoding.%s.bias' % tname] = to_np(p['b'])

    # ---- decoder FF: permute output dims HWC -> CHW
    c0, h0, w0 = hp['ae_decoding_starting_dim']
    perm_out = _chw_to_hwc_perm(c0, h0, w0)
    p = dec.get('fc')
    if isinstance(p, dict) and 'w' in p:
        wt = np.empty_like(to_np(p['w']).T)        # (first_conv_chw, hidden)
        wt[perm_out, :] = to_np(p['w']).T
        bt = np.empty_like(to_np(p['b']))
        bt[perm_out] = to_np(p['b'])
        sd['decoding.FF.weight'] = wt
        sd['decoding.FF.bias'] = bt

    # ---- decoder conv-transposes
    convt_specs = [s for s in model.decoding.layers if s['type'] == 'convtranspose']
    for g, spec in enumerate(convt_specs):
        p = dec.get(spec['name'])
        if p is not None:
            sd['decoding.decoder.convtranspose%i.weight' % g] = \
                np.transpose(to_np(p['w']), (2, 3, 0, 1))
            sd['decoding.decoder.convtranspose%i.bias' % g] = to_np(p['b'])

    # ---- AEMSP projection / U
    if 'projection' in params:
        sd['projection.weight'] = to_np(params['projection']['w']).T
    if 'U' in params:
        sd['U.weight'] = to_np(params['U'])

    # ---- PS-VAE heads
    for name in ('A', 'B', 'C'):
        if name in enc:
            sd['encoding.%s.weight' % name] = to_np(enc[name]).T
    if 'C_b' in enc:
        sd['encoding.C.bias'] = to_np(enc['C_b'])
    if 'D' in enc and isinstance(enc['D'], dict):
        sd['encoding.D.weight'] = to_np(enc['D']['d'])
        sd['encoding.D.bias'] = to_np(enc['D']['b'])

    return sd


def save_torch_ae_checkpoint(filepath, model, params):
    """Save params as a torch ``state_dict`` file the reference can load.

    The reference loads checkpoints with ``model.load_state_dict(torch.load(
    filepath))`` (fitting/utils.py:944-1063); this writes that format.
    """
    import torch
    # np.array copies: jax-backed buffers are read-only, torch wants writable
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in params_to_torch_state_dict(model, params).items()}
    torch.save(sd, filepath)


def load_torch_ae_checkpoint(filepath, model, params):
    """Load a reference ``best_val_model.pt`` (torch state dict) into params.

    Requires torch (CPU) to deserialize the checkpoint.
    """
    import torch
    state_dict = torch.load(filepath, map_location='cpu')
    return torch_state_dict_to_params(state_dict, model, params)
