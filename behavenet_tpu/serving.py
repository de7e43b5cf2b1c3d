"""AOT-compiled serving exports for trained models (``jax.export``).

The reference has no deployment story — inference means loading torch
modules inside analysis notebooks. Here every model's inference path is
already a pure function of arrays, so it is ahead-of-time lowered,
serialized, and shipped as a self-contained StableHLO artifact:

- parameters are baked into the artifact as constants — serving needs the
  blob and jax, not behavenet_tpu, the model code, or the checkpoint;
- the batch/time leading dimension is shape-polymorphic (one artifact
  serves any batch size);
- the uint8 video contract is part of the artifact (normalization
  compiled in), so the server feeds raw frames;
- the same blob runs on TPU, CPU, or GPU — XLA re-specializes StableHLO
  to the target at load time.

Exported heads per model class (same signatures the analysis layer uses,
fitting/eval.py):

=============== ======================================================
model_class     artifacts
=============== ======================================================
ae family       ``encode(images) -> latents``,
                ``reconstruct(images) -> images`` (uint8 NHWC in,
                float32 out; VAE-family encodes posterior means)
neural decoders ``predict(predictors) -> predictions``
labels-images   ``predict(labels) -> images``
arhmm           ``states(latents) -> int32 path`` (Viterbi),
                ``gamma(latents) -> posteriors`` (forward-backward)
=============== ======================================================

Usage::

    from behavenet_tpu import serving
    serving.export_model(model, params, '/srv/ae_v3')      # at train time
    bundle = serving.load_bundle('/srv/ae_v3')              # at serve time
    latents = bundle.encode(frames_u8)                      # any batch size

or from a fitted experiment-store version::

    serving.export_version('/results/.../version_3', '/srv/ae_v3')
"""

import json
import os
import pickle

import numpy as np

__all__ = ['export_model', 'export_version', 'load_bundle', 'ServingBundle']

_MANIFEST = 'manifest.json'


def _jax():
    import jax
    from jax import export as jax_export
    return jax, jax_export


def _norm_images(x):
    import jax.numpy as jnp
    return x.astype(jnp.float32) / 255.0


def _infer_fns(model, params):
    """Named pure inference fns (params baked via closure) + input specs.

    Returns {name: (fn, [(shape_tail, dtype)])} where the leading batch/
    time dim is added polymorphically by the exporter.
    """
    import jax

    from behavenet_tpu.models.arhmm import ARHMM

    hp = getattr(model, 'hparams', None) or {}
    mc = 'arhmm' if isinstance(model, ARHMM) else hp['model_class']
    fns = {}

    if mc in ('ae', 'cond-ae-msp', 'vae', 'beta-tcvae', 'ps-vae', 'msps-vae'):
        img = (int(hp['y_pixels']), int(hp['x_pixels']),
               int(hp['n_input_channels']))
        rng = jax.random.PRNGKey(0)  # unused under use_mean=True

        if mc == 'ae':
            def encode(x):
                return model.forward(params, _norm_images(x))[1]

            def reconstruct(x):
                return model.forward(params, _norm_images(x))[0]
        elif mc == 'cond-ae-msp':
            def encode(x):
                return model.forward(params, _norm_images(x))[1]

            def reconstruct(x):
                return model.forward(params, _norm_images(x))[0]
        elif mc in ('vae', 'beta-tcvae'):
            def encode(x):
                return model.forward(params, _norm_images(x), rng=rng,
                                     use_mean=True)[1]

            def reconstruct(x):
                return model.forward(params, _norm_images(x), rng=rng,
                                     use_mean=True)[0]
        else:  # ps-vae / msps-vae: forward -> (recon, _, latents, ...)
            def encode(x):
                return model.forward(params, _norm_images(x), rng=rng,
                                     use_mean=True)[2]

            def reconstruct(x):
                return model.forward(params, _norm_images(x), rng=rng,
                                     use_mean=True)[0]
        fns['encode'] = (encode, [(img, np.uint8)])
        fns['reconstruct'] = (reconstruct, [(img, np.uint8)])

    elif mc in ('cond-ae', 'cond-vae'):
        img = (int(hp['y_pixels']), int(hp['x_pixels']),
               int(hp['n_input_channels']))
        n_labels = int(hp['n_labels'])
        rng = jax.random.PRNGKey(0)
        cond_enc = bool(hp.get('conditional_encoder', False))
        vae_kw = {} if mc == 'cond-ae' else {'rng': rng, 'use_mean': True}

        if cond_enc:
            # conditional encoder: one-hot 2D label maps join the inputs
            # (spatial layout as the labels_sc signal, NHWC)
            def encode(x, y, y2d):
                return model.forward(params, _norm_images(x), labels=y,
                                     labels_2d=y2d, **vae_kw)[1]

            def reconstruct(x, y, y2d):
                return model.forward(params, _norm_images(x), labels=y,
                                     labels_2d=y2d, **vae_kw)[0]
            specs = [(img, np.uint8), ((n_labels,), np.float32),
                     ((img[0], img[1], n_labels // 2), np.float32)]
        else:
            def encode(x, y):
                return model.forward(params, _norm_images(x), labels=y, **vae_kw)[1]

            def reconstruct(x, y):
                return model.forward(params, _norm_images(x), labels=y, **vae_kw)[0]
            specs = [(img, np.uint8), ((n_labels,), np.float32)]
        fns['encode'] = (encode, specs)
        fns['reconstruct'] = (reconstruct, specs)

    elif mc == 'labels-images':
        n_labels = int(hp['n_labels'])

        def predict(y):
            return model.forward(params, y)
        fns['predict'] = (predict, [((n_labels,), np.float32)])

    elif mc == 'arhmm':
        # `model` is an ARHMM; bake its params dict into pure message passes
        import jax.numpy as jnp
        from behavenet_tpu.ops import hmm as hmm_ops
        p = model.params
        D = int(model.D)

        def _prep(x):
            mask = jnp.ones(x.shape[0], dtype=x.dtype)
            ll = model._log_likes(p, x, mask)
            lp = model._log_P(p, x, mask)
            return ll, lp, mask

        def states(x):
            ll, lp, mask = _prep(x)
            return hmm_ops.viterbi(p['log_pi0'], lp, ll, mask)

        def gamma(x):
            ll, lp, mask = _prep(x)
            g, _, _ = hmm_ops.forward_backward(p['log_pi0'], lp, ll, mask)
            return g
        fns['states'] = (states, [((D,), np.float32)])
        fns['gamma'] = (gamma, [((D,), np.float32)])

    elif mc in ('neural-ae', 'neural-ae-me', 'neural-arhmm', 'neural-labels',
                'ae-neural', 'arhmm-neural', 'labels-neural'):
        n_in = int(hp['input_size'])

        def predict(x):
            out = model.forward(params, x)
            # MLP/LSTM forward returns (predictions, precision-or-None);
            # serving exposes the predictions head
            return out[0] if isinstance(out, tuple) else out
        fns['predict'] = (predict, [((n_in,), np.float32)])

    else:
        raise NotImplementedError(
            'no serving export defined for model_class=%r' % mc)

    return fns


def export_model(model, params, out_dir, names=None):
    """AOT-export a model's inference heads to ``out_dir``.

    ``names`` optionally restricts which artifacts to export. Returns the
    manifest dict. The leading dimension is shape-polymorphic ('b'); if a
    head cannot be lowered polymorphically (export raises), it is skipped
    with a note in the manifest rather than failing the rest.
    """
    jax, jax_export = _jax()
    os.makedirs(out_dir, exist_ok=True)
    fns = _infer_fns(model, params)
    if names is not None:
        fns = {k: v for k, v in fns.items() if k in names}

    hp = getattr(model, 'hparams', {}) or {}
    manifest = {
        'model_class': hp.get('model_class', type(model).__name__.lower()),
        'jax_version': jax.__version__,
        'artifacts': {},
        'skipped': {},
    }
    for name, (fn, in_specs) in fns.items():
        blob, min_b, err = None, 1, None
        # time-recursive heads (scans over the leading dim) need b >= 2 to
        # resolve 'b - 1 >= 1' comparisons; try unconstrained first so
        # batch-parallel heads keep serving batch size 1
        for constraints in (None, ['b >= 2']):
            try:
                (b,) = jax_export.symbolic_shape(
                    'b', constraints=constraints or [])
                args = [jax.ShapeDtypeStruct((b,) + tuple(tail), dtype)
                        for tail, dtype in in_specs]
                exp = jax_export.export(jax.jit(fn))(*args)
                blob = exp.serialize()
                min_b = 2 if constraints else 1
                break
            except Exception as e:  # noqa: PERF203
                err = e
        if blob is None:
            manifest['skipped'][name] = str(err)[:500]
            continue
        fname = '%s.stablehlo' % name
        with open(os.path.join(out_dir, fname), 'wb') as f:
            f.write(blob)
        manifest['artifacts'][name] = {
            'file': fname,
            'min_leading_dim': min_b,
            'inputs': [{'shape': ['b'] + [int(d) for d in tail],
                        'dtype': np.dtype(dtype).name}
                       for tail, dtype in in_specs],
        }
    with open(os.path.join(out_dir, _MANIFEST), 'w') as f:
        json.dump(manifest, f, indent=2)
    return manifest


def export_version(version_dir, out_dir, names=None):
    """Export a fitted experiment-store version (meta_tags.pkl +
    best_val_model.pt) to serving artifacts."""
    meta = os.path.join(version_dir, 'meta_tags.pkl')
    ckpt = os.path.join(version_dir, 'best_val_model.pt')
    with open(meta, 'rb') as f:
        hparams = pickle.load(f)
    mc = hparams['model_class']
    if mc == 'arhmm':
        from behavenet_tpu.models.arhmm import ARHMM
        model = ARHMM.load(ckpt)
        return export_model(model, None, out_dir, names=names)
    import behavenet_tpu.models as M
    from behavenet_tpu.models import base as models_base
    class_map = {
        'ae': M.AE, 'vae': M.VAE, 'cond-ae': M.ConditionalAE,
        'cond-vae': M.ConditionalVAE, 'cond-ae-msp': M.AEMSP,
        'beta-tcvae': M.BetaTCVAE, 'ps-vae': M.PSVAE, 'msps-vae': M.MSPSVAE,
        'labels-images': M.ConvDecoder,
        'neural-ae': M.Decoder, 'neural-ae-me': M.Decoder,
        'neural-arhmm': M.Decoder, 'neural-labels': M.Decoder,
        'ae-neural': M.Decoder, 'arhmm-neural': M.Decoder,
        'labels-neural': M.Decoder,
    }
    if mc not in class_map:
        raise NotImplementedError('no serving export for model_class=%s' % mc)
    model = class_map[mc](hparams)
    params, _ = models_base.load_params(ckpt)
    return export_model(model, params, out_dir, names=names)


class ServingBundle:
    """Loaded serving directory: artifacts as callable attributes.

    Deserialization happens once per head at first call; calls accept
    numpy or jax arrays with any leading batch size and return jax arrays
    on the default device.
    """

    def __init__(self, path):
        self.path = path
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self._loaded = {}

    def names(self):
        return sorted(self.manifest['artifacts'])

    def __getattr__(self, name):
        arts = self.__dict__.get('manifest', {}).get('artifacts', {})
        if name not in arts:
            raise AttributeError(name)
        fn = self.__dict__['_loaded'].get(name)
        if fn is None:
            _, jax_export = _jax()
            with open(os.path.join(self.path, arts[name]['file']), 'rb') as f:
                exp = jax_export.deserialize(f.read())
            fn = lambda *a: exp.call(*a)  # noqa: E731
            self.__dict__['_loaded'][name] = fn
        return fn


def load_bundle(path):
    """Load a directory written by :func:`export_model`."""
    return ServingBundle(path)


def cli(argv=None):
    """Console entry (``behavenet-export-serving``): export a fitted
    experiment-store version directory to serving artifacts."""
    import argparse
    p = argparse.ArgumentParser(
        prog='behavenet-export-serving',
        description='AOT-export a fitted experiment-store version '
                    '(meta_tags.pkl + best_val_model.pt) to self-contained '
                    'StableHLO serving artifacts.')
    p.add_argument('version_dir', help='experiment-store version directory')
    p.add_argument('-o', '--out_dir', required=True,
                   help='directory to write manifest.json + *.stablehlo into')
    p.add_argument('--names', nargs='+', default=None, metavar='HEAD',
                   help='restrict exported heads (default: every head the '
                        'model class supports)')
    args = p.parse_args(argv)
    manifest = export_version(args.version_dir, args.out_dir, names=args.names)
    for name, info in sorted(manifest['artifacts'].items()):
        print('exported %s -> %s (min leading dim %d)'
              % (name, os.path.join(args.out_dir, info['file']),
                 info['min_leading_dim']))
    for name, err in sorted(manifest['skipped'].items()):
        print('skipped %s: %s' % (name, err))
    return 0 if manifest['artifacts'] else 1


if __name__ == '__main__':
    import sys
    sys.exit(cli())
