"""IBL paw-pipeline port (examples/ibl_utils.py) on synthetic data."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..', 'examples'))

import ibl_utils  # noqa: E402


def make_synthetic_session(T=200, seed=0):
    """Frames with a bright square tracking 'paw_r' + marker dict (right view)."""
    rs = np.random.RandomState(seed)
    frames = rs.randint(0, 40, (T, ibl_utils.IMG_HEIGHT, ibl_utils.IMG_WIDTH)).astype('uint8')
    markers = {}
    # anatomy: eye near (500, 150), nose near (350, 200)
    for part in ('pupil_bottom_r', 'pupil_left_r', 'pupil_right_r', 'pupil_top_r'):
        markers[part] = np.array([500.0, 150.0]) + rs.randn(T, 2)
    markers['nose_tip'] = np.array([350.0, 200.0]) + rs.randn(T, 2)
    # paws wander inside the crop region
    paw_r = np.array([420.0, 300.0]) + np.cumsum(rs.randn(T, 2), axis=0)
    paw_l = np.array([460.0, 320.0]) + np.cumsum(rs.randn(T, 2), axis=0)
    markers['paw_r'] = paw_r
    markers['paw_l'] = paw_l
    for t in range(T):
        y, x = int(np.clip(paw_r[t, 1], 0, 500)), int(np.clip(paw_r[t, 0], 0, 620))
        frames[t, y:y + 10, x:x + 10] = 255
    return frames, markers


class TestHelpers:

    def test_crop_frame_in_bounds(self):
        fr = np.arange(100, dtype='uint8').reshape(10, 10)
        out = ibl_utils.crop_frame(fr, 2, 6, 1, 5)
        assert out.shape == (4, 4)
        assert (out == fr[1:5, 2:6]).all()

    def test_crop_frame_pads_out_of_bounds(self):
        fr = np.full((10, 10), 7, dtype='uint8')
        out = ibl_utils.crop_frame(fr, -3, 7, -2, 8)
        assert out.shape == (10, 10)
        assert (out[:2, :] == 0).all() and (out[:, :3] == 0).all()
        assert (out[2:, 3:] == 7).all()
        out2 = ibl_utils.crop_frame(fr, 5, 15, 5, 15)
        assert out2.shape == (10, 10)
        assert (out2[:5, :5] == 7).all() and (out2[5:, :] == 0).all()

    def test_frame_lims_views(self):
        xl = ibl_utils.get_frame_lims(500, 150, 350, 200, 'left', 'nose')
        xr = ibl_utils.get_frame_lims(500, 150, 350, 200, 'right', 'nose')
        for (xmin, xmax, ymin, ymax) in (xl, xr):
            assert xmin < xmax and ymin < ymax
        # nose sits near the edge on the view side: left view extends right
        # of the eye, right view extends left of the eye
        assert xl[1] > 500 and xl[0] < 360
        assert xr[0] < 500 - 100
        with pytest.raises(ValueError):
            ibl_utils.get_frame_lims(0, 0, 1, 1, 'top')

    def test_marker_crop_scale_roundtrip(self):
        m = {'paw_r': np.array([[100.0, 60.0], [110.0, 70.0]])}
        c = ibl_utils.crop_markers(m, 80, 180, 40, 140)
        assert np.allclose(c['paw_r'][0], [20.0, 20.0])
        s = ibl_utils.scale_markers(c, 100, 50, 100, 25)
        assert np.allclose(s['paw_r'][0], [10.0, 5.0])
        # array form
        arr = ibl_utils.scale_markers(np.array([[100.0, 60.0]]), 100, 50, 100, 25)
        assert np.allclose(arr, [[50.0, 15.0]])

    def test_align_timestamps_offsets(self):
        ts = np.arange(20, dtype=float)
        neg = ibl_utils.align_timestamps(ts, 18, -2)
        assert neg.shape == (18,) and neg[0] == 2.0
        neg_pad = ibl_utils.align_timestamps(ts, 25, -2)
        assert neg_pad.shape == (25,) and np.isnan(neg_pad[-1])
        pos = ibl_utils.align_timestamps(ts, 20, 3)
        assert pos.shape == (20,) and np.isnan(pos[0]) and pos[3] == 0.0

    def test_highest_me_trials(self):
        rs = np.random.RandomState(0)
        m = 0.01 * rs.randn(200, 4)
        m[100:120] += np.cumsum(5 * np.ones((20, 4)), axis=0)  # violent batch 10
        best = ibl_utils.get_highest_me_trials(m, batch_size=10, n_batches=3)
        assert 10 in best or 11 in best
        # multi-view dict form
        d = {v: {p: 0.01 * rs.randn(100, 2) for p in ('paw_l', 'paw_r')}
             for v in ('left', 'right')}
        d['left']['paw_l'][50:60] += 100
        best = ibl_utils.get_highest_me_trials(d, batch_size=10, n_batches=1)
        assert best[0] == 5

    def test_get_markers_dict_csv(self, tmpdir):
        import pandas as pd
        T = 6
        rs = np.random.RandomState(0)
        df = pd.DataFrame({
            'paw_r_x': rs.rand(T) * 100, 'paw_r_y': rs.rand(T) * 100,
            'paw_r_likelihood': [0.99, 0.99, 0.1, 0.99, 0.99, 0.5],
        })
        path = str(tmpdir.join('markers.csv'))
        df.to_csv(path, index=False)
        vals, masks = ibl_utils.get_markers_dict(path, likelihood_thresh=0.9)
        assert set(vals) == {'paw_r'}
        assert np.isnan(vals['paw_r'][2]).all() and np.isnan(vals['paw_r'][5]).all()
        assert masks['paw_r'][2].sum() == 0 and masks['paw_r'][0].sum() == 2


class TestPawProcessor:

    def _build(self, tmpdir, batch_selection=None, n_batches=None, T=200):
        frames, markers = make_synthetic_session(T=T)
        proc = ibl_utils.PawProcessor('right', eid='test-eid', lab='l',
                                      animal='a', date='2021-01-01', number='001')
        proc.load_video_cap(frames=frames)
        proc.load_2d_markers(markers=markers)
        lims = proc.find_crop_params()
        path = str(tmpdir.join('data.hdf5'))
        proc.build_hdf5(path, batch_size=50, xpix=64, ypix=48,
                        n_batches=n_batches, batch_selection=batch_selection)
        return proc, lims, path

    def test_build_all_batches(self, tmpdir):
        proc, lims, path = self._build(tmpdir)
        assert lims['xmin'] < lims['xmax'] and lims['ymin'] < lims['ymax']
        data = ibl_utils.PawProcessor.load_hdf5_trials(path, idxs=[0, 1])
        assert data['images'].shape == (100, 1, 48, 64)
        assert data['images'].dtype == np.uint8
        assert data['labels'].shape == (100, 4)
        assert data['labels_sc'].shape == (100, 4)
        assert data['labels_masks'].shape == (100, 4)
        assert np.isfinite(data['labels']).all()  # masked rows are 0, not NaN
        import h5py
        with h5py.File(path, 'r') as f:
            assert len(f['images']) == 4  # ceil(200 / 50)

    def test_masked_markers_propagate(self, tmpdir):
        frames, markers = make_synthetic_session()
        markers['paw_r'][10:20] = np.nan  # occluded paw
        proc = ibl_utils.PawProcessor('right')
        proc.load_video_cap(frames=frames)
        proc.load_2d_markers(markers=markers)
        proc.find_crop_params()
        path = str(tmpdir.join('data.hdf5'))
        proc.build_hdf5(path, batch_size=50, xpix=64, ypix=48)
        data = ibl_utils.PawProcessor.load_hdf5_trials(path, idxs=[0])
        # layout is [x_r, x_l, y_r, y_l]: paw_r occupies columns 0 and 2
        assert (data['labels_masks'][10:20, 0] == 0).all()
        assert (data['labels_masks'][10:20, 2] == 0).all()
        assert (data['labels'][10:20, 0] == 0).all()
        assert (data['labels_sc'][10:20, 0] == 0).all()
        assert (data['labels_masks'][10:20, 1] == 1).all()  # paw_l still valid

    def test_me_batch_selection(self, tmpdir):
        proc, lims, path = self._build(tmpdir, batch_selection='me', n_batches=2)
        import h5py
        with h5py.File(path, 'r') as f:
            assert len(f['images']) == 2

    def test_timestamp_offset_alignment(self):
        frames, markers = make_synthetic_session(T=100)
        proc = ibl_utils.PawProcessor(
            'right', eid='x', timestamp_offsets={'x': {'right': -3}})
        proc.load_video_cap(frames=frames)
        proc.timestamps = np.arange(103, dtype=float)
        proc.load_2d_markers(markers=markers)
        assert proc.timestamps.shape == (100,)
        assert proc.timestamps[0] == 3.0

    def test_download_requires_one(self):
        proc = ibl_utils.PawProcessor('left')
        with pytest.raises(RuntimeError):
            proc.download_data()

    def test_left_view_halves_anatomy(self):
        """Left camera records half-resolution: its crop window equals the
        frame-lims heuristic applied to halved eye/nose positions."""
        _, markers = make_synthetic_session()
        proc_l = ibl_utils.PawProcessor('left')
        proc_l.markers = markers
        lims_l = proc_l.find_crop_params()
        ex, ey = ibl_utils.get_pupil_position(markers)
        nx, ny = ibl_utils.get_nose_position(markers)
        want = ibl_utils.get_frame_lims(
            ex / 2, ey / 2, nx / 2, ny / 2, 'left', vertical_align='nose')
        assert (lims_l['xmin'], lims_l['xmax'], lims_l['ymin'], lims_l['ymax']) == want
        # and the heuristic itself is scale-equivariant (within int rounding)
        full = ibl_utils.get_frame_lims(ex, ey, nx, ny, 'left', 'nose')
        for a, b in zip(want, full):
            assert abs(a * 2 - b) <= 2
