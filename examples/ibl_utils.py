"""Marker-guided video preprocessing into the BehaveNet HDF5 format.

A lab-agnostic rework of the reference's IBL paw-processing pipeline
(examples/msps-vae/ibl_utils/pipeline.py: PawProcessor / Video /
PawMarkers): load a video + DLC/DGP markers, compute a crop window that
tracks a body part (e.g. a paw), and write cropped grayscale trials +
scaled labels into a session HDF5 store for (MS)PS-VAE fitting.

The reference version additionally downloads data via ONE/ibllib (IBL
infrastructure, not available here); this module takes local file paths.
"""

import os

import h5py
import numpy as np

__all__ = ['Video', 'load_markers', 'find_crop_params', 'build_cropped_hdf5']


class Video(object):
    """Thin cv2 video wrapper with random-access frame loading."""

    def __init__(self, filepath):
        import cv2
        self.filepath = filepath
        self.cap = cv2.VideoCapture(filepath)
        self.n_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.xpix = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.ypix = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.fps = self.cap.get(cv2.CAP_PROP_FPS)

    def get_frames_from_idxs(self, idxs):
        """Grayscale frames (n, 1, y, x) uint8 for the given indices."""
        from behavenet_tpu.data.preprocess import get_frames_from_idxs
        return get_frames_from_idxs(self.cap, idxs)


def load_markers(markers_path, pose_algo='dlc', likelihood_thresh=0.9):
    """DLC/DGP marker file -> (labels (T, 2*n), masks (T, 2*n)).

    Labels are all x-values then all y-values (reference convention).
    """
    from behavenet_tpu.data.preprocess import load_raw_labels
    return load_raw_labels(markers_path, pose_algo=pose_algo,
                           likelihood_thresh=likelihood_thresh)


def find_crop_params(labels, masks, marker_idx=0, crop_size=128, xpix=None, ypix=None,
                     percentile=90):
    """Crop window center + extent that keeps a marker in frame.

    Follows the reference's approach (pipeline.py:292-327): center the crop
    on the marker's median position and size it to cover the bulk
    (``percentile``) of its excursion, clamped to the frame.
    """
    n = labels.shape[1] // 2
    x = labels[:, marker_idx]
    y = labels[:, n + marker_idx]
    good = (masks[:, marker_idx] > 0) & (masks[:, n + marker_idx] > 0)
    x, y = x[good], y[good]
    x0 = float(np.median(x))
    y0 = float(np.median(y))
    ext = max(
        float(np.percentile(np.abs(x - x0), percentile)),
        float(np.percentile(np.abs(y - y0), percentile)),
        crop_size / 2.0)
    if xpix is not None:
        x0 = min(max(x0, ext), xpix - ext)
    if ypix is not None:
        y0 = min(max(y0, ext), ypix - ext)
    return {'x_0': int(round(x0)), 'y_0': int(round(y0)), 'ext': int(round(ext))}


def build_cropped_hdf5(save_file, video_file, markers_file, pose_algo='dlc',
                       marker_idx=0, batch_size=128, crop_size=128,
                       likelihood_thresh=0.9, zscore=True):
    """Video + markers -> cropped BehaveNet HDF5 (images/labels/labels_masks/labels_sc).

    Frames are cropped around the tracked marker and resized to
    ``crop_size`` x ``crop_size``; labels are shifted into crop coordinates
    and scaled, then z-scored for the 'labels' group.
    """
    import cv2

    video = Video(video_file)
    labels, masks = load_markers(markers_file, pose_algo, likelihood_thresh)
    assert labels.shape[0] == video.n_frames, \
        'marker count (%i) != frame count (%i)' % (labels.shape[0], video.n_frames)

    crop = find_crop_params(labels, masks, marker_idx=marker_idx, crop_size=crop_size,
                            xpix=video.xpix, ypix=video.ypix)
    x_min = crop['x_0'] - crop['ext']
    y_min = crop['y_0'] - crop['ext']
    side = 2 * crop['ext']
    scale = crop_size / side

    # shift labels into crop coordinates + rescale
    n = labels.shape[1] // 2
    labels_sc = np.copy(labels)
    labels_sc[:, :n] = (labels[:, :n] - x_min) * scale
    labels_sc[:, n:] = (labels[:, n:] - y_min) * scale

    if zscore:
        means = np.nanmean(labels_sc, axis=0)
        stds = np.nanstd(labels_sc, axis=0)
    n_trials = int(np.ceil(video.n_frames / batch_size))

    if not os.path.exists(os.path.dirname(save_file)):
        os.makedirs(os.path.dirname(save_file))
    with h5py.File(save_file, 'w', libver='latest', swmr=True) as f:
        f.swmr_mode = True
        group_i = f.create_group('images')
        group_l = f.create_group('labels')
        group_m = f.create_group('labels_masks')
        group_ls = f.create_group('labels_sc')
        for trial in range(n_trials):
            beg = trial * batch_size
            end = min((trial + 1) * batch_size, video.n_frames)
            idxs = np.arange(beg, end)
            frames = video.get_frames_from_idxs(idxs)  # (T, 1, Y, X)
            cropped = np.zeros((len(idxs), 1, crop_size, crop_size), dtype='uint8')
            for t in range(len(idxs)):
                win = frames[t, 0, max(y_min, 0):y_min + side, max(x_min, 0):x_min + side]
                cropped[t, 0] = cv2.resize(win, (crop_size, crop_size))
            group_i.create_dataset('trial_%04i' % trial, data=cropped, dtype='uint8')

            group_m.create_dataset('trial_%04i' % trial, data=masks[idxs], dtype='float32')
            lt = np.copy(labels_sc[idxs])
            if zscore:
                lz = (lt - means) / stds
            else:
                lz = lt
            lz[masks[idxs] == 0] = 0
            group_l.create_dataset('trial_%04i' % trial, data=lz, dtype='float32')
            lt[masks[idxs] == 0] = 0
            group_ls.create_dataset('trial_%04i' % trial, data=lt, dtype='float32')
    return crop
