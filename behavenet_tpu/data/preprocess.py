"""Raw video/label ingestion into the BehaveNet HDF5 trial store.

Behavioral contract follows the reference (behavenet/data/preprocess.py):
uint8 grayscale frames chunked into equal-size trials, z-scored 'labels',
'labels_masks' from pose likelihoods, scaled 'labels_sc', SWMR mode so
concurrent grid-search readers are safe. DLC/DGP csv/h5 label formats.
"""

import os

import h5py
import numpy as np

__all__ = ['build_hdf5', 'load_raw_labels', 'resize_labels', 'get_frames_from_idxs']


def build_hdf5(save_file, video_file, label_file=None, pose_algo=None, batch_size=128,
               xpix=None, ypix=None, label_likelihood_thresh=0.9, zscore=True):
    """Convert a raw video (+ optional pose labels) into a BehaveNet HDF5 store.

    Equally-sized trial batches are created (no trial structure assumed);
    adapt for more complex data. (reference preprocess.py:13-137)
    """
    import cv2

    video_cap = cv2.VideoCapture(video_file)
    n_total_frames = video_cap.get(cv2.CAP_PROP_FRAME_COUNT)
    xpix_og = int(video_cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    ypix_og = int(video_cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    if label_file is not None:
        labels, masks = load_raw_labels(
            label_file, pose_algo=pose_algo, likelihood_thresh=label_likelihood_thresh)
        assert n_total_frames == labels.shape[0], \
            'Number of frames does not match number of labels'
    else:
        labels = None

    n_trials = int(np.ceil(n_total_frames / batch_size))
    timestamps = np.arange(n_total_frames)

    if label_file is not None and zscore:
        means = np.nanmean(labels, axis=0)
        stds = np.nanstd(labels, axis=0)
    else:
        means, stds = None, None

    if not os.path.exists(os.path.dirname(save_file)):
        os.makedirs(os.path.dirname(save_file))

    with h5py.File(save_file, 'w', libver='latest') as f:
        f.swmr_mode = True  # single write multi-read

        group_i = f.create_group('images')
        if label_file is not None:
            group_l = f.create_group('labels')
            group_m = f.create_group('labels_masks')
            group_ls = f.create_group('labels_sc')

        for trial in range(n_trials):
            trial_beg = trial * batch_size
            trial_end = (trial + 1) * batch_size
            ts_idxs = np.where((timestamps >= trial_beg) & (timestamps < trial_end))[0]

            # image data (downsampled if requested)
            frames_tmp = get_frames_from_idxs(video_cap, ts_idxs)
            if xpix is not None and ypix is not None:
                frames_tmp = [cv2.resize(fr[0], (xpix, ypix))[None, None, ...]
                              for fr in frames_tmp]
            else:
                frames_tmp = [fr[None, ...] for fr in frames_tmp]
            group_i.create_dataset(
                'trial_%04i' % trial, data=np.vstack(frames_tmp), dtype='uint8')

            if label_file is not None:
                # masks
                group_m.create_dataset(
                    'trial_%04i' % trial, data=masks[ts_idxs], dtype='float32')
                # z-scored labels, bad values zeroed
                labels_tmp = (labels[ts_idxs] - means) / stds
                labels_tmp[masks[ts_idxs] == 0] = 0
                assert not np.any(np.isnan(labels_tmp))
                group_l.create_dataset(
                    'trial_%04i' % trial, data=labels_tmp, dtype='float32')
                # pixel-space labels, rescaled to the stored image size
                labels_tmp = labels[ts_idxs]
                labels_tmp = resize_labels(labels_tmp, xpix, ypix, xpix_og, ypix_og)
                labels_tmp[masks[ts_idxs] == 0] = 0
                group_ls.create_dataset(
                    'trial_%04i' % trial, data=labels_tmp, dtype='float32')


def load_raw_labels(file_path, pose_algo, likelihood_thresh=0.9):
    """Load DLC/DGP labels + likelihood masks (reference preprocess.py:140-189).

    Returns (labels, masks): labels are all x-values then all y-values;
    entries below the likelihood threshold are NaN with mask 0.
    """
    if pose_algo in ('dlc', 'dgp'):
        file_ext = file_path.split('.')[-1]
        if file_ext == 'csv':
            labels_tmp = np.genfromtxt(file_path, delimiter=',', dtype=None, encoding=None)
            labels_tmp = labels_tmp[3:, 1:].astype('float')  # drop headers/index
        elif file_ext == 'h5':
            with h5py.File(file_path, 'r') as f:
                t = f['df_with_missing']['table'][()]
            labels_tmp = np.concatenate([t[i][1][None, :] for i in range(len(t))])
        else:
            raise NotImplementedError(
                '"%s" is an unsupported file extension for %s' % (file_ext, pose_algo))
        xvals = labels_tmp[:, 0::3]
        yvals = labels_tmp[:, 1::3]
        likes = labels_tmp[:, 2::3]
        labels = np.hstack([xvals, yvals])
        likes = np.hstack([likes, likes])
        masks = 1.0 * (likes >= likelihood_thresh)
        labels[masks != 1] = np.nan
    elif pose_algo in ('dpk', 'leap'):
        raise NotImplementedError
    else:
        raise NotImplementedError(
            'the pose algorithm "%s" is currently unsupported' % pose_algo)
    return labels, masks


def resize_labels(labels, xpix_new, ypix_new, xpix_old, ypix_old):
    """Rescale pixel-space labels to a new image size (reference preprocess.py:192-223)."""
    if xpix_new is None or ypix_new is None:
        return labels
    n_labels = labels.shape[1] // 2
    old = np.array([xpix_old] * n_labels + [ypix_old] * n_labels)
    new = np.array([xpix_new] * n_labels + [ypix_new] * n_labels)
    return (labels / old) * new


def get_frames_from_idxs(cap, idxs):
    """Grayscale frames (n, 1, y, x) uint8 from a cv2 capture (reference :226-257)."""
    import cv2

    is_contiguous = np.sum(np.diff(idxs)) == (len(idxs) - 1)
    n_frames = len(idxs)
    frames = None
    for fr, i in enumerate(idxs):
        if fr == 0 or not is_contiguous:
            cap.set(1, i)
        ret, frame = cap.read()
        if ret:
            if fr == 0:
                height, width, _ = frame.shape
                frames = np.zeros((n_frames, 1, height, width), dtype='uint8')
            frames[fr, 0, :, :] = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        else:
            print('warning! reached end of video; returning blank frames for remainder of '
                  'requested indices')
            break
    return frames
