"""Example 07: AOT serving export of a fitted AE.

Requires examples 00 and 01 to have run first:

    python examples/00_make_data.py
    python examples/01_ae.py
    python examples/07_serving.py

Finds the AE version example 01 fitted in the experiment store, exports
its inference heads as self-contained StableHLO artifacts
(``behavenet_tpu.serving``), reloads them, and serves frames through the
``encode``/``reconstruct`` blobs at several batch sizes — demonstrating
that the artifact (params baked in, uint8 contract compiled in,
batch-polymorphic) reproduces the model bit-for-bit without touching the
checkpoint again.
"""

import glob
import os

import numpy as np

from _common import base_dirs


def main():
    from behavenet_tpu import serving

    _, save_dir = base_dirs()
    versions = sorted(glob.glob(os.path.join(
        save_dir, '*', '*', '*', '*', 'ae', 'conv', '*', 'ae-demo',
        'version_*')))
    if not versions:
        raise SystemExit('no fitted AE found — run examples/00 and 01 first')
    version_dir = versions[-1]
    out_dir = os.path.join('/tmp/bntpu', 'serving_ae')
    print('exporting %s\n       -> %s' % (version_dir, out_dir))
    manifest = serving.export_version(version_dir, out_dir)
    for name, art in manifest['artifacts'].items():
        size = os.path.getsize(os.path.join(out_dir, art['file']))
        print('  %s: %s (%.1f kB, inputs %s)'
              % (name, art['file'], size / 1e3,
                 [i['shape'] for i in art['inputs']]))

    bundle = serving.load_bundle(out_dir)
    rs = np.random.RandomState(0)
    shape = tuple(int(d) for d in
                  manifest['artifacts']['encode']['inputs'][0]['shape'][1:])
    for batch in (1, 7, 32):
        frames = rs.randint(0, 255, (batch,) + shape).astype('uint8')
        z = np.asarray(bundle.encode(frames))
        recon = np.asarray(bundle.reconstruct(frames))
        print('batch %3d: frames %s -> latents %s -> recon %s'
              % (batch, frames.shape, z.shape, recon.shape))
    print('\nserving artifacts live in %s — portable to any jax process'
          % out_dir)


if __name__ == '__main__':
    main()
