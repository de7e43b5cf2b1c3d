"""Analysis/plotting layer: shared utilities.

Behavioral contract follows the reference (behavenet/plotting/__init__.py):
latent loading, metrics-csv -> tidy dataframe, movie saving, multi-view
image concatenation and cropping.
"""

import os
import pickle

import numpy as np
import pandas as pd

__all__ = ['concat', 'get_crop', 'load_latents', 'load_metrics_csv_as_df', 'save_movie']


def concat(ims, axis=1):
    """Concatenate two channels along x or y (multi-view data) (reference :23)."""
    return np.concatenate([ims[0, :, :], ims[1, :, :]], axis=axis)


def get_crop(im, y_0, y_ext, x_0, x_ext):
    """Crop of image centered at (y_0, x_0), zero-filled at borders (reference :41)."""
    y_min = y_0 - y_ext
    y_max = y_0 + y_ext
    y_pix = y_max - y_min
    x_min = x_0 - x_ext
    x_max = x_0 + x_ext
    x_pix = x_max - x_min
    im_crop = np.copy(im[y_min:y_max, x_min:x_max])
    y_pix_, x_pix_ = im_crop.shape
    im_tmp = np.zeros((y_pix, x_pix))
    im_tmp[:y_pix_, :x_pix_] = im_crop
    return im_tmp


def load_latents(hparams, version, dtype='val'):
    """Concatenate all exported latents of one dtype (reference :77-108)."""
    sess_id = '%s_%s_%s_%s_latents.pkl' % (
        hparams['lab'], hparams['expt'], hparams['animal'], hparams['session'])
    filename = os.path.join(hparams['expt_dir'], 'version_%i' % version, sess_id)
    if not os.path.exists(filename):
        raise FileNotFoundError('latents located at %s do not exist' % filename)
    with open(filename, 'rb') as f:
        latent_dict = pickle.load(f)
    print('loaded latents from %s' % filename)
    latents = [latent_dict['latents'][trial] for trial in latent_dict['trials'][dtype]]
    return np.concatenate(latents)


def load_metrics_csv_as_df(hparams, lab, expt, metrics_list, test=False, version='best',
                           version_dir=None):
    """metrics.csv -> tidy long-format dataframe (reference :111-198)."""
    from behavenet_tpu.fitting.experiment import (
        experiment_exists, get_best_model_version, get_expt_dir, get_lab_example,
        get_session_dir, read_session_info_from_csv)

    if version_dir is None:
        get_lab_example(hparams, lab, expt)
        hparams['session_dir'], sess_ids = get_session_dir(
            hparams, session_source=hparams.get('all_source', 'save'))
        hparams['expt_dir'] = get_expt_dir(hparams)
        if version == 'best':
            version = get_best_model_version(hparams['expt_dir'])[0]
        elif isinstance(version, int):
            pass
        else:
            _, version = experiment_exists(hparams, which_version=True)
        version_dir = os.path.join(hparams['expt_dir'], 'version_%i' % version)

    metric_file = os.path.join(version_dir, 'metrics.csv')
    metrics = pd.read_csv(metric_file)

    sess_ids = read_session_info_from_csv(os.path.join(version_dir, 'session_info.csv'))
    sess_ids_strs = ['%s/%s' % (s['animal'], s['session']) for s in sess_ids]
    rows = []
    for _, row in metrics.iterrows():
        dataset = 'all' if row['dataset'] == -1 else sess_ids_strs[int(row['dataset'])]
        if test:
            for metric in metrics_list:
                col = 'test_%s' % metric
                if col in row:
                    rows.append({'dataset': dataset, 'epoch': row['epoch'],
                                 'dtype': 'test', 'loss': metric, 'val': row[col]})
        else:
            for dtype, prefix in (('val', 'val'), ('train', 'tr')):
                for metric in metrics_list:
                    col = '%s_%s' % (prefix, metric)
                    if col in row:
                        rows.append({'dataset': dataset, 'epoch': row['epoch'],
                                     'dtype': dtype, 'loss': metric, 'val': row[col]})
    return pd.DataFrame(rows)


def save_movie(save_file, ani, frame_rate=15):
    """Save a matplotlib animation as mp4/gif (reference :201).

    mp4 requires ffmpeg; without it (or imagemagick for gifs) the writer
    falls back to matplotlib's built-in PillowWriter and a .gif container,
    so movie exports work on bare images.
    """
    if save_file is None:
        return
    import matplotlib.animation as mpl_anim

    from behavenet_tpu import make_dir_if_not_exists
    make_dir_if_not_exists(save_file)

    if save_file[-3:] == 'gif':
        print('saving video to %s...' % save_file, end='')
        if mpl_anim.ImageMagickWriter.isAvailable():
            ani.save(save_file, writer='imagemagick', fps=frame_rate)
        else:
            ani.save(save_file, writer=mpl_anim.PillowWriter(fps=frame_rate))
    elif mpl_anim.FFMpegWriter.isAvailable():
        if save_file[-3:] != 'mp4':
            save_file += '.mp4'
        writer = mpl_anim.FFMpegWriter(fps=frame_rate, bitrate=-1)
        print('saving video to %s...' % save_file, end='')
        ani.save(save_file, writer=writer)
    else:
        save_file = (save_file[:-4] if save_file[-4:] == '.mp4' else save_file) + '.gif'
        print('ffmpeg unavailable; saving gif to %s...' % save_file, end='')
        ani.save(save_file, writer=mpl_anim.PillowWriter(fps=frame_rate))
    print('done')
