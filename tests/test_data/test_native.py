"""Native staging kernels: exactness vs numpy, fallbacks, integration."""

import os
import tempfile

import h5py
import numpy as np
import pytest

from behavenet_tpu import _native
from behavenet_tpu.data import raw_h5
from behavenet_tpu.data.generator import SingleSessionDataset

pytestmark = pytest.mark.skipif(
    _native.get_lib() is None, reason='native staging lib unavailable')


@pytest.fixture()
def raw_file():
    rs = np.random.RandomState(0)
    a = rs.randint(0, 255, size=(13, 2, 16, 12)).astype('uint8')
    f = tempfile.NamedTemporaryFile(delete=False)
    f.write(a.tobytes())
    f.close()
    fd = os.open(f.name, os.O_RDONLY)
    yield fd, a
    os.close(fd)
    os.unlink(f.name)


class TestKernels:

    def test_pread_into(self, raw_file):
        fd, a = raw_file
        out = np.empty(a.size, np.uint8)
        assert _native.pread_into(fd, 0, out)
        np.testing.assert_array_equal(out.reshape(a.shape), a)

    def test_pread_into_offset(self, raw_file):
        fd, a = raw_file
        frame = a[3]
        out = np.empty(frame.size, np.uint8)
        assert _native.pread_into(fd, 3 * frame.nbytes, out)
        np.testing.assert_array_equal(out.reshape(frame.shape), frame)

    def test_pread_short_read_fails(self, raw_file):
        fd, a = raw_file
        out = np.empty(a.size + 1, np.uint8)
        assert not _native.pread_into(fd, 0, out)

    @pytest.mark.parametrize('C', [1, 2, 3])
    @pytest.mark.parametrize('dtype', ['uint8', 'float32', 'float64'])
    def test_read_nchw_as_nhwc(self, C, dtype):
        rs = np.random.RandomState(1)
        a = (rs.rand(5, C, 8, 6) * 100).astype(dtype)
        f = tempfile.NamedTemporaryFile(delete=False)
        f.write(a.tobytes())
        f.close()
        fd = os.open(f.name, os.O_RDONLY)
        try:
            got = _native.read_nchw_as_nhwc(fd, 0, a.shape, a.dtype)
            np.testing.assert_array_equal(got, np.transpose(a, (0, 2, 3, 1)))
        finally:
            os.close(fd)
            os.unlink(f.name)

    def test_pad_tail_zeroed(self, raw_file):
        fd, a = raw_file
        got = _native.read_nchw_as_nhwc(fd, 0, a.shape, np.uint8, t_pad=16)
        assert got.shape == (16, 16, 12, 2)
        np.testing.assert_array_equal(got[:13], np.transpose(a, (0, 2, 3, 1)))
        assert (got[13:] == 0).all()

    def test_single_thread_matches(self, raw_file):
        fd, a = raw_file
        got = _native.read_nchw_as_nhwc(fd, 0, a.shape, np.uint8, nthreads=1)
        np.testing.assert_array_equal(got, np.transpose(a, (0, 2, 3, 1)))


class TestIntegration:

    def _session(self, tmp_path, n_trials=3):
        sess = tmp_path / 'lab' / 'expt' / 'animal' / 'session'
        sess.mkdir(parents=True)
        path = str(sess / 'data.hdf5')
        rs = np.random.RandomState(2)
        arrays = [rs.randint(0, 255, size=(7, 2, 8, 6)).astype('uint8')
                  for _ in range(n_trials)]
        with h5py.File(path, 'w', libver='latest') as f:
            g = f.create_group('images')
            for i, a in enumerate(arrays):
                g.create_dataset('trial_%04i' % i, data=a)
        return str(tmp_path), path, arrays

    def test_reader_read_nhwc(self, tmp_path):
        _, path, arrays = self._session(tmp_path)
        reader = raw_h5.RawGroupReader(path, 'images')
        for i, a in enumerate(arrays):
            got = reader.read_nhwc('trial_%04i' % i)
            np.testing.assert_array_equal(got, np.transpose(a, (0, 2, 3, 1)))
        assert reader.read_nhwc('trial_9999') is None

    def test_dataset_serves_native_trials(self, tmp_path):
        base, path, arrays = self._session(tmp_path)
        ds = SingleSessionDataset(
            base, lab='lab', expt='expt', animal='animal', session='session',
            signals=['images'], transforms=[None], paths=[path],
            batch_load=True)
        for i, a in enumerate(arrays):
            got = ds[i]['images']
            assert got.dtype == np.uint8
            np.testing.assert_array_equal(got, np.transpose(a, (0, 2, 3, 1)))
