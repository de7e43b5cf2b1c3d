"""Raw video/label ingestion (build_hdf5) against a real synthetic video.

Closes a test gap the reference leaves open (SURVEY §4: preprocessing is
untested there because it needs video files) — cv2 can both write and read
an MJPG avi, so the whole ingestion path runs for real: video + DLC-format
pose csv -> HDF5 trial store with images / labels / labels_masks /
labels_sc groups (reference behavenet/data/preprocess.py:13-257).
"""

import os

import h5py
import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from behavenet_tpu.data.preprocess import (
    build_hdf5, get_frames_from_idxs, load_raw_labels, resize_labels)

W, H, N_FRAMES = 48, 32, 50


@pytest.fixture(scope='module')
def video_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp('vid') / 'session.avi')
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'MJPG'), 30, (W, H))
    assert writer.isOpened()
    rs = np.random.RandomState(0)
    for _ in range(N_FRAMES):
        writer.write(rs.randint(0, 255, size=(H, W, 3), dtype=np.uint8))
    writer.release()
    return path


def _write_dlc_csv(path, n_frames, n_markers=2, seed=1):
    """DLC csv layout: 3 header rows, index col, (x, y, likelihood) triplets."""
    rs = np.random.RandomState(seed)
    xy = rs.rand(n_frames, 2 * n_markers) * [W, W, H, H][:2 * n_markers]
    like = rs.rand(n_frames, n_markers)
    rows = ['scorer' + ',model' * 3 * n_markers,
            'bodyparts' + ''.join(',m%d' % m * 3 for m in range(n_markers)),
            'coords' + ',x,y,likelihood' * n_markers]
    for i in range(n_frames):
        vals = []
        for m in range(n_markers):
            vals += [xy[i, m], xy[i, n_markers + m], like[i, m]]
        rows.append(','.join([str(i)] + ['%.6f' % v for v in vals]))
    with open(path, 'w') as f:
        f.write('\n'.join(rows))
    return xy, like


class TestBuildHdf5:

    def test_images_only(self, video_file, tmp_path):
        save = str(tmp_path / 'store' / 'data.hdf5')
        build_hdf5(save, video_file, batch_size=16)
        with h5py.File(save, 'r') as f:
            trials = sorted(f['images'])
            assert trials == ['trial_0000', 'trial_0001', 'trial_0002',
                              'trial_0003']
            # 50 frames at batch_size 16 -> 16/16/16/2
            assert f['images']['trial_0000'].shape == (16, 1, H, W)
            assert f['images']['trial_0003'].shape == (2, 1, H, W)
            assert f['images']['trial_0000'].dtype == np.uint8
            assert 'labels' not in f
            # pixels are the video's grayscale frames, not blanks
            arr = f['images']['trial_0000'][()]
            assert arr.std() > 10

    def test_resize(self, video_file, tmp_path):
        save = str(tmp_path / 'store' / 'data.hdf5')
        build_hdf5(save, video_file, batch_size=25, xpix=24, ypix=16)
        with h5py.File(save, 'r') as f:
            assert f['images']['trial_0000'].shape == (25, 1, 16, 24)

    def test_with_dlc_labels(self, video_file, tmp_path):
        label_file = str(tmp_path / 'labels.csv')
        xy, like = _write_dlc_csv(label_file, N_FRAMES)
        save = str(tmp_path / 'store' / 'data.hdf5')
        build_hdf5(save, video_file, label_file=label_file, pose_algo='dlc',
                   batch_size=16, label_likelihood_thresh=0.5)
        with h5py.File(save, 'r') as f:
            for group in ('images', 'labels', 'labels_masks', 'labels_sc'):
                assert group in f, group
                assert len(f[group]) == 4
            labels = np.concatenate(
                [f['labels']['trial_%04i' % i][()] for i in range(4)])
            masks = np.concatenate(
                [f['labels_masks']['trial_%04i' % i][()] for i in range(4)])
            sc = np.concatenate(
                [f['labels_sc']['trial_%04i' % i][()] for i in range(4)])
        assert labels.shape == (N_FRAMES, 4)  # x0 x1 y0 y1
        # masks follow the likelihood threshold, duplicated over x and y
        want_mask = (like >= 0.5).astype(float)
        np.testing.assert_array_equal(masks, np.hstack([want_mask, want_mask]))
        # masked-out entries are zeroed in both label sets
        assert np.all(labels[masks == 0] == 0)
        assert np.all(sc[masks == 0] == 0)
        # z-scoring: valid entries of each column have ~0 mean under the
        # nan-aware statistics used at build time
        raw = np.hstack([xy[:, :2], xy[:, 2:]])
        raw_nan = raw.copy()
        raw_nan[np.hstack([want_mask, want_mask]) == 0] = np.nan
        want = (raw - np.nanmean(raw_nan, axis=0)) / np.nanstd(raw_nan, axis=0)
        want[np.hstack([want_mask, want_mask]) == 0] = 0
        np.testing.assert_allclose(labels, want, atol=1e-4)
        # labels_sc without resize are the raw pixel coords
        want_sc = raw.copy()
        want_sc[np.hstack([want_mask, want_mask]) == 0] = 0
        np.testing.assert_allclose(sc, want_sc, atol=1e-4)

    def test_label_frame_count_mismatch_raises(self, video_file, tmp_path):
        label_file = str(tmp_path / 'labels.csv')
        _write_dlc_csv(label_file, N_FRAMES + 3)
        with pytest.raises(AssertionError, match='does not match'):
            build_hdf5(str(tmp_path / 's' / 'data.hdf5'), video_file,
                       label_file=label_file, pose_algo='dlc')


class TestLoadRawLabels:

    def test_csv(self, tmp_path):
        label_file = str(tmp_path / 'labels.csv')
        xy, like = _write_dlc_csv(label_file, 10)
        labels, masks = load_raw_labels(label_file, 'dlc', likelihood_thresh=0.5)
        assert labels.shape == (10, 4) and masks.shape == (10, 4)
        want_mask = (like >= 0.5).astype(float)
        np.testing.assert_array_equal(masks, np.hstack([want_mask, want_mask]))
        assert np.all(np.isnan(labels[masks == 0]))
        good = masks == 1
        raw = np.hstack([xy[:, :2], xy[:, 2:]])
        np.testing.assert_allclose(labels[good], raw[good], atol=1e-5)

    def test_unsupported(self, tmp_path):
        with pytest.raises(NotImplementedError):
            load_raw_labels('x.csv', 'leap')
        with pytest.raises(NotImplementedError):
            load_raw_labels('x.npy', 'dlc')


class TestHelpers:

    def test_resize_labels(self):
        labels = np.array([[10.0, 20.0, 5.0, 8.0]])  # x0 x1 y0 y1
        out = resize_labels(labels, xpix_new=50, ypix_new=16, xpix_old=100,
                            ypix_old=32)
        np.testing.assert_allclose(out, [[5.0, 10.0, 2.5, 4.0]])
        # no-op without a target size
        np.testing.assert_allclose(resize_labels(labels, None, None, 100, 32),
                                   labels)

    def test_get_frames_contiguous_and_random(self, video_file):
        cap = cv2.VideoCapture(video_file)
        seq = get_frames_from_idxs(cap, np.arange(5, 9))
        assert seq.shape == (4, 1, H, W) and seq.dtype == np.uint8
        jumpy = get_frames_from_idxs(cap, np.array([8, 5, 7]))
        assert jumpy.shape == (3, 1, H, W)
        # the same frame read via either access pattern is identical
        np.testing.assert_array_equal(jumpy[1], seq[0])
        np.testing.assert_array_equal(jumpy[2], seq[2])
        cap.release()
