"""Host-side input-staging benchmark: h5py vs raw-offset vs native kernels.

Measures the trial-read hot loop (reference data_generator.py:551-633 —
``f[signal]['trial_%04i'][()]`` per batch) at several video shapes through
three implementations:

1. ``h5py``      — per-trial ``h5py.File(...)[...][()]`` + numpy NCHW->NHWC
                   transpose (the reference's path, and this repo's fallback);
2. ``raw``       — ``data/raw_h5`` pread-at-offset + numpy transpose
                   (BEHAVENET_NO_NATIVE=1 path);
3. ``native``    — the C++ fused read+interleave kernel
                   (``_native/staging.cpp`` via ``RawGroupReader.read_nhwc``).

Rates are warm-page-cache GB/s of delivered NHWC bytes, best of
``--passes``. The interesting column is 2-channel video: numpy's uint8
channel-interleave transpose is the pipeline's worst pass (~0.15 GB/s on
the round-3 bench host) and the fused kernel removes it entirely.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/bench_staging.py
(no jax needed, but keep the env consistent with the other tools).
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from behavenet_tpu import _native  # noqa: E402
from behavenet_tpu.data import raw_h5  # noqa: E402


def _write_session(path, n_trials, T, C, hw):
    rs = np.random.RandomState(0)
    with h5py.File(path, 'w', libver='latest') as f:
        g = f.create_group('images')
        for i in range(n_trials):
            g.create_dataset('trial_%04i' % i,
                             data=rs.randint(0, 255, size=(T, C, hw, hw)),
                             dtype='uint8')


def _rate(read_one, n_trials, nbytes_each, passes):
    for i in range(n_trials):  # warm cache + indexes
        read_one(i)
    best = 0.0
    for _ in range(passes):
        t0 = time.perf_counter()
        for i in range(n_trials):
            out = read_one(i)
            assert out is not None
        best = max(best, n_trials * nbytes_each / (time.perf_counter() - t0) / 1e9)
    return best


def bench_shape(T, C, hw, n_trials, passes):
    tmpdir = tempfile.mkdtemp(prefix='bench_staging_')
    try:
        path = os.path.join(tmpdir, 'data.hdf5')
        _write_session(path, n_trials, T, C, hw)
        nbytes = T * C * hw * hw

        def via_h5py(i):
            with h5py.File(path, 'r', libver='latest', swmr=True) as f:
                arr = f['images']['trial_%04i' % i][()]
            return np.ascontiguousarray(np.transpose(arr, (0, 2, 3, 1)))

        reader = raw_h5.RawGroupReader(path, 'images')

        def via_raw(i):
            prior = os.environ.get('BEHAVENET_NO_NATIVE')
            os.environ['BEHAVENET_NO_NATIVE'] = '1'
            try:
                arr = reader.read('trial_%04i' % i)
                return np.ascontiguousarray(np.transpose(arr, (0, 2, 3, 1)))
            finally:
                if prior is None:
                    os.environ.pop('BEHAVENET_NO_NATIVE', None)
                else:
                    os.environ['BEHAVENET_NO_NATIVE'] = prior

        def via_native(i):
            return reader.read_nhwc('trial_%04i' % i)

        rows = {'h5py': _rate(via_h5py, n_trials, nbytes, passes),
                'raw': _rate(via_raw, n_trials, nbytes, passes)}
        if _native.get_lib() is not None:
            rows['native'] = _rate(via_native, n_trials, nbytes, passes)
            # sanity: all three paths must agree bit-for-bit
            np.testing.assert_array_equal(via_native(0), via_h5py(0))
        np.testing.assert_array_equal(via_raw(0), via_h5py(0))
        return rows
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n_trials', type=int, default=12)
    p.add_argument('--passes', type=int, default=4)
    p.add_argument('--frames', type=int, default=189)
    args = p.parse_args()

    print('native lib: %s (threads=%d, cpus=%s)'
          % ('loaded' if _native.get_lib() else 'UNAVAILABLE (pure python)',
             _native.native_threads(), os.cpu_count()))
    shapes = [(args.frames, 1, 128), (args.frames, 2, 128),
              (args.frames, 2, 192), (1000, 2, 128)]
    print('%-22s %10s %10s %10s' % ('shape (T,C,HW)', 'h5py', 'raw', 'native'))
    for T, C, hw in shapes:
        rows = bench_shape(T, C, hw, args.n_trials, args.passes)
        print('%-22s %9.2f %10.2f %10s' % (
            '(%d, %d, %dx%d)' % (T, C, hw, hw), rows['h5py'], rows['raw'],
            '%.2f' % rows['native'] if 'native' in rows else 'n/a'))
    print('(GB/s of delivered NHWC bytes, warm page cache, best of %d)'
          % args.passes)


if __name__ == '__main__':
    main()
