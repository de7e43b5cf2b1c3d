"""Raw-offset HDF5 fast path: exactness vs h5py + fallback coverage."""

import os

import h5py
import numpy as np
import pytest

from behavenet_tpu.data import raw_h5
from behavenet_tpu.data.generator import SingleSessionDataset


def _write(path, layouts):
    """Write one group 'images' with the requested per-trial layouts."""
    rs = np.random.RandomState(0)
    arrays = []
    with h5py.File(path, 'w', libver='latest') as f:
        g = f.create_group('images')
        for i, layout in enumerate(layouts):
            a = rs.randint(0, 255, size=(7, 1, 8, 6)).astype('uint8')
            kw = {}
            if layout == 'chunked':
                kw = dict(chunks=(2, 1, 8, 6))
            elif layout == 'gzip':
                kw = dict(chunks=(2, 1, 8, 6), compression='gzip')
            g.create_dataset('trial_%04i' % i, data=a, **kw)
            arrays.append(a)
    return arrays


class TestRawGroupReader:

    def test_contiguous_reads_match_h5py(self, tmp_path):
        path = str(tmp_path / 'data.hdf5')
        arrays = _write(path, ['contig'] * 4)
        reader = raw_h5.RawGroupReader(path, 'images')
        for i, a in enumerate(arrays):
            got = reader.read('trial_%04i' % i)
            assert got is not None and got.dtype == np.uint8
            np.testing.assert_array_equal(got, a)

    def test_chunked_and_compressed_fall_back(self, tmp_path):
        path = str(tmp_path / 'data.hdf5')
        _write(path, ['contig', 'chunked', 'gzip'])
        reader = raw_h5.RawGroupReader(path, 'images')
        assert reader.read('trial_0000') is not None
        assert reader.read('trial_0001') is None
        assert reader.read('trial_0002') is None
        assert reader.read('trial_9999') is None  # absent name

    def test_float_and_int_dtypes(self, tmp_path):
        path = str(tmp_path / 'data.hdf5')
        rs = np.random.RandomState(1)
        ref = {'trial_0000': rs.randn(5, 3).astype('float32'),
               'trial_0001': rs.randint(0, 9, size=(5, 4)).astype('int64'),
               'trial_0002': rs.randn(5, 2)}  # float64
        with h5py.File(path, 'w') as f:
            g = f.create_group('neural')
            for k, v in ref.items():
                g.create_dataset(k, data=v)
        reader = raw_h5.RawGroupReader(path, 'neural')
        for k, v in ref.items():
            got = reader.read(k)
            assert got.dtype == v.dtype
            np.testing.assert_array_equal(got, v)

    def test_reader_cache_invalidates_on_rewrite(self, tmp_path):
        path = str(tmp_path / 'data.hdf5')
        arrays = _write(path, ['contig'] * 2)
        r1 = raw_h5.get_reader(path, 'images')
        np.testing.assert_array_equal(r1.read('trial_0000'), arrays[0])
        assert raw_h5.get_reader(path, 'images') is r1  # hot-loop dict hit
        # rewrite with different content/size -> new reader, fresh offsets
        os.utime(path)  # ensure mtime_ns moves even on coarse filesystems
        arrays2 = _write(path, ['contig'] * 5)
        r2 = raw_h5.get_reader(path, 'images')
        assert r2 is not r1
        np.testing.assert_array_equal(r2.read('trial_0004'), arrays2[4])

    def test_missing_file(self, tmp_path):
        assert raw_h5.get_reader(str(tmp_path / 'nope.hdf5'), 'images') is None

    def test_rewrite_evicts_stale_cache_entry(self, tmp_path):
        """A rewritten file must leave exactly one cached reader for its
        (path, group) — stale entries drop out (their fds close via
        refcount), so long runs that regenerate sessions can't leak fds."""
        path = str(tmp_path / 'data.hdf5')
        ident = (os.path.realpath(path), 'images')
        _write(path, ['contig'])
        r1 = raw_h5.get_reader(path, 'images')
        os.utime(path)
        _write(path, ['contig'] * 2)
        r2 = raw_h5.get_reader(path, 'images')
        assert r2 is not r1
        live = [k for k in raw_h5._readers if k[:2] == ident]
        assert len(live) == 1

    def test_replace_with_new_inode_invalidates(self, tmp_path):
        """os.replace swaps the inode: even with identical size (and
        however coarse the filesystem mtime), the ino in the cache key
        forces a re-index so offsets are never stale."""
        path = str(tmp_path / 'data.hdf5')
        arrays = _write(path, ['contig'] * 2)
        r1 = raw_h5.get_reader(path, 'images')
        np.testing.assert_array_equal(r1.read('trial_0000'), arrays[0])
        other = str(tmp_path / 'other.hdf5')
        arrays2 = _write(other, ['contig'] * 2)
        st = os.stat(path)
        os.replace(other, path)
        os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns))  # freeze mtime
        assert os.path.getsize(path) == st.st_size
        r2 = raw_h5.get_reader(path, 'images')
        assert r2 is not r1
        np.testing.assert_array_equal(r2.read('trial_0001'), arrays2[1])


class TestDatasetIntegration:

    @pytest.mark.parametrize('layout', ['contig', 'gzip'])
    def test_dataset_trials_identical_either_path(self, tmp_path, layout):
        """SingleSessionDataset serves bit-identical trials through the raw
        fast path (contiguous) and the h5py fallback (compressed)."""
        sess = tmp_path / 'lab' / 'expt' / 'animal' / 'session'
        sess.mkdir(parents=True)
        path = str(sess / 'data.hdf5')
        arrays = _write(path, [layout] * 3)
        ds = SingleSessionDataset(
            str(tmp_path), lab='lab', expt='expt', animal='animal',
            session='session', signals=['images'], transforms=[None],
            paths=[path], batch_load=True)
        for i, a in enumerate(arrays):
            got = ds[i]['images']
            np.testing.assert_array_equal(
                got, np.transpose(a, (0, 2, 3, 1)))
            assert got.dtype == np.uint8
