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

__all__ = ['load_torch_ae_checkpoint', 'torch_state_dict_to_params']


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
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, 'detach') else v)
          for k, v in state_dict.items()}
    new = {k: (dict(v) if isinstance(v, dict) else v) for k, v in params.items()}
    new['encoder'] = dict(params['encoder'])
    new['decoder'] = dict(params['decoder'])

    hp = model.hparams

    # ---- encoder convs: reference names conv layers by global layer number
    conv_specs = [s for s in model.encoding.layers if s['type'] == 'conv']
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
    for group, module, prefix in (('encoder', model.encoding, 'encoding.encoder'),
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
    c_last = hp['ae_encoding_n_channels'][-1]
    h_last = hp['ae_encoding_y_dim'][-1]
    w_last = hp['ae_encoding_x_dim'][-1]
    perm_in = _chw_to_hwc_perm(c_last, h_last, w_last)
    for tname, pname in (('FF', 'fc'), ('logvar', 'logvar')):
        tkey = 'encoding.%s.weight' % tname
        if tkey in sd and pname in new['encoder']:
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


def load_torch_ae_checkpoint(filepath, model, params):
    """Load a reference ``best_val_model.pt`` (torch state dict) into params.

    Requires torch (CPU) to deserialize the checkpoint.
    """
    import torch
    state_dict = torch.load(filepath, map_location='cpu')
    return torch_state_dict_to_params(state_dict, model, params)
