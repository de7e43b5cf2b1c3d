"""Latent-traversal machinery and PS-VAE analysis plots.

Behavioral contract follows the reference (behavenet/plotting/cond_ae_utils.py):
input-range computation from exported artifacts, 1d/2d interpolation through
latent/label space, frame-array plots, traversal movies, PS-VAE training
curves and hyperparameter-search plots, label reconstructions, and the
session classifier for MSPS-VAE background subspaces.

The model API here is functional: plotting entry points take ``(model,
params)`` pairs as produced by
:func:`behavenet_tpu.fitting.experiment.get_best_model_and_data`.
Images are NHWC in the pipeline; this module converts to NCHW at the
boundary to keep the reference's plotting conventions.
"""

import copy
import os
import pickle

import numpy as np

from behavenet_tpu import make_dir_if_not_exists
from behavenet_tpu.data.utils import load_labels_like_latents
from behavenet_tpu.fitting.eval import get_reconstruction
from behavenet_tpu.plotting import concat, get_crop, load_metrics_csv_as_df, save_movie

__all__ = [
    'get_input_range', 'compute_range', 'get_labels_2d_for_trial', 'get_model_input',
    'interpolate_2d', 'interpolate_1d',
    'interpolate_point_path', 'plot_2d_frame_array', 'plot_1d_frame_array',
    'make_interpolated', 'make_interpolated_multipanel', 'apply_masks',
    'get_label_r2', 'collect_data',
    'plot_psvae_training_curves', 'plot_hyperparameter_search_results',
    'plot_label_reconstructions', 'plot_latent_traversals', 'make_latent_traversal_movie',
    'fit_classifier', 'plot_mspsvae_training_curves',
    'plot_mspsvae_hyperparameter_search_results', 'make_session_swap_movie',
]


# ----------------------------------------
# low-level helpers
# ----------------------------------------

def _nchw(ims):
    """NHWC -> NCHW for plotting-layer conventions."""
    ims = np.asarray(ims)
    return np.transpose(ims, (0, 3, 1, 2))


def _recon(model, params, inputs, **kwargs):
    """get_reconstruction returning NCHW arrays."""
    out = get_reconstruction(model, params, inputs, **kwargs)
    return _nchw(out)


def compute_range(values_list, min_p=5, max_p=95):
    """Percentile range over stacked arrays (reference cond_ae_utils.py:150-181)."""
    values_ = [arr for arr in values_list if len(arr) != 0]
    values = np.vstack(values_)
    return {
        'min': np.nanpercentile(values, min_p, axis=0),
        'max': np.nanpercentile(values, max_p, axis=0),
        'med': np.nanpercentile(values, 50, axis=0)}


def _session_latents_file(hparams, sess, version):
    """Path to a session's exported latents pickle inside a model version."""
    name = '%s_%s_%s_%s_latents.pkl' % (
        sess['lab'], sess['expt'], sess['animal'], sess['session'])
    return os.path.join(hparams['expt_dir'], 'version_%i' % version, name)


def _collect_trial_arrays(input_type, hparams, sess_ids, idxs, model, params,
                          data_gen, version, export_if_missing):
    """All trial arrays of one signal across the requested sessions."""
    if input_type == 'latents':
        trials = []
        for s_idx in idxs:
            sess = sess_ids[s_idx] if (sess_ids is not None and s_idx is not None) \
                else hparams
            path = _session_latents_file(hparams, sess, version)
            if not os.path.exists(path) and export_if_missing:
                from behavenet_tpu.fitting.eval import export_latents
                print('latents file not found at %s' % path)
                print('exporting latents...', end='')
                path = export_latents(data_gen, model, params)[0]
                print('done')
            with open(path, 'rb') as f:
                trials += pickle.load(f)['latents']
        return trials
    if input_type == 'labels':
        return [arr for s_idx in idxs for arr in
                load_labels_like_latents(hparams, sess_ids, sess_idx=s_idx)['latents']]
    if input_type == 'labels_sc':
        # labels_sc only resolves for conditional-encoder configs
        hp = copy.deepcopy(hparams)
        hp['conditional_encoder'] = True
        return [arr for s_idx in idxs for arr in
                load_labels_like_latents(
                    hp, sess_ids, sess_idx=s_idx, data_key='labels_sc')['latents']]
    raise NotImplementedError


def get_input_range(input_type, hparams, sess_ids=None, sess_idx=0, model=None,
                    params=None, data_gen=None, version=0, min_p=5, max_p=95,
                    apply_label_masks=False):
    """Percentile range of latents / labels / labels_sc across sessions.

    (reference cond_ae_utils.py:43-146 contract: per-dimension min/max/med
    percentiles over the stacked trial arrays of the requested signal;
    single-session latents are exported on demand when the pickle is
    missing; label masks optionally NaN out untracked entries first.)
    """
    multi = isinstance(sess_idx, (list, np.ndarray))
    idxs = list(sess_idx) if multi else [sess_idx]
    inputs = _collect_trial_arrays(
        input_type, hparams, sess_ids, idxs, model, params, data_gen, version,
        export_if_missing=not multi)

    if apply_label_masks and input_type == 'labels':
        try:
            masks = [arr for s_idx in idxs for arr in
                     load_labels_like_latents(
                         hparams, sess_ids, sess_idx=s_idx,
                         data_key='labels_masks')['latents']]
        except KeyError:
            print('no label masks!')
            masks = []
        for arr, m in zip(inputs, masks):
            arr[m == 0] = np.nan

    return compute_range(inputs, min_p=min_p, max_p=max_p)


def apply_masks(data, masks):
    """Rows of ``data`` where ``masks == 1`` (reference :1230-1231)."""
    return data[masks == 1]


def get_labels_2d_for_trial(hparams, sess_ids, trial=None, trial_idx=None, sess_idx=0,
                            dtype='test', data_gen=None):
    """Scaled (pixel-space) 2d labels for one trial (reference :181-231).

    Returns ``(labels_2d, labels_2d)`` — the reference returns a
    (torch, numpy) pair; here both slots hold the same NHWC numpy array so
    positional unpacking in ported analysis code keeps working.
    """
    if (trial_idx is not None) and (trial is not None):
        raise ValueError('only one of "trial" or "trial_idx" can be specified')

    if data_gen is None:
        from behavenet_tpu.data.utils import build_data_generator
        hparams_new = copy.deepcopy(hparams)
        hparams_new['conditional_encoder'] = True  # ensure scaled labels load
        hparams_new['device'] = 'cpu'
        hparams_new['as_numpy'] = True
        hparams_new['batch_load'] = True
        data_gen = build_data_generator(hparams_new, sess_ids, export_csv=False)

    if trial is None:
        trial = data_gen.datasets[sess_idx].batch_idxs[dtype][trial_idx]
    batch = data_gen.datasets[sess_idx][trial]
    labels_2d = np.asarray(batch['labels_sc'])
    return labels_2d, labels_2d


def get_model_input(data_generator, hparams, model, params=None, trial=None,
                    trial_idx=None, sess_idx=0, max_frames=200, compute_latents=False,
                    compute_2d_labels=True, compute_scaled_labels=False,
                    mask_labels=False, dtype='test'):
    """Images, latents, and labels for a given trial (reference :233-345).

    Returns the reference's 7-tuple
    ``(ims, ims, latents, labels, labels, labels_2d, labels_2d)`` — torch/numpy
    slots are collapsed to the same numpy arrays (images NHWC uint8).
    """
    if (trial_idx is not None) and (trial is not None):
        raise ValueError('only one of "trial" or "trial_idx" can be specified')
    if (trial_idx is None) and (trial is None):
        raise ValueError('one of "trial" or "trial_idx" must be specified')

    if trial is None:
        trial = data_generator.datasets[sess_idx].batch_idxs[dtype][trial_idx]
    batch = data_generator.datasets[sess_idx][int(trial)]
    ims = np.asarray(batch['images'][:max_frames])

    mc = hparams['model_class']
    if mc in ('ae', 'vae', 'beta-tcvae'):
        labels = None
    elif mc in ('cond-ae', 'cond-vae', 'cond-ae-msp', 'ps-vae', 'msps-vae',
                'labels-images'):
        labels = np.asarray(batch['labels'][:max_frames])
        if mask_labels and 'labels_masks' in batch:
            masks = np.asarray(batch['labels_masks'][:max_frames])
            labels = labels.copy()
            labels[masks == 0] = np.nan
    else:
        raise NotImplementedError(mc)

    if hparams.get('conditional_encoder'):
        labels_2d = np.asarray(batch['labels_sc'][:max_frames])
    elif compute_2d_labels:
        from behavenet_tpu.fitting.experiment import get_session_dir
        hparams['session_dir'], sess_ids = get_session_dir(hparams)
        labels_2d, _ = get_labels_2d_for_trial(hparams, sess_ids, trial=int(trial))
        labels_2d = labels_2d[:max_frames]
    elif compute_scaled_labels:
        import h5py
        hdf5_file = data_generator.datasets[sess_idx].paths['labels']
        with h5py.File(hdf5_file, 'r', libver='latest', swmr=True) as f:
            labels_2d = f['labels_sc']['trial_%04i' % trial][()].astype(
                'float32')[:max_frames]
    else:
        labels_2d = None

    if compute_latents:
        x = ims.astype('float32') / 255.0 if ims.dtype == np.uint8 else ims
        if mc in ('cond-ae-msp', 'ps-vae', 'msps-vae'):
            latents = np.asarray(
                model.get_transformed_latents(params, x, dataset=sess_idx))
        else:
            _, latents = get_reconstruction(
                model, params, x, dataset=sess_idx, labels=labels,
                labels_2d=labels_2d, return_latents=True)
            latents = np.asarray(latents)
    else:
        latents = None

    return ims, ims, latents, labels, labels, labels_2d, labels_2d


def _get_updated_scaled_labels(labels_og, idxs=None, vals=None):
    """Pixel-space labels with selected entries overwritten (reference :846-874)."""
    if labels_og is None:
        return None
    if len(np.asarray(labels_og).shape) == 4:
        tmp = np.copy(labels_og)
        t, y, x = np.where(tmp[0] == 1)
        labels_sc = np.hstack([x, y])[None, :]
    else:
        labels_sc = np.copy(labels_og)
    if idxs is not None:
        if isinstance(idxs, int):
            idxs, vals = [idxs], [vals]
        for idx, val in zip(idxs, vals):
            labels_sc[0, idx] = val
    return labels_sc


# ----------------------------------------
# interpolation
# ----------------------------------------

def _interp_frame(interp_type, model, params, ims_0, latents, labels_0, labels_2d):
    """One reconstructed frame for a given (latents or labels) setting."""
    mc = model.hparams['model_class']
    if interp_type == 'latents':
        if mc == 'cond-ae-msp':
            return _recon(model, params, latents, apply_inverse_transform=True)
        labels = labels_0 if mc in ('cond-ae', 'cond-vae') else None
        return _recon(model, params, latents, labels=labels)
    # labels interpolation
    if mc in ('cond-ae-msp', 'ps-vae', 'msps-vae'):
        return _recon(model, params, latents, apply_inverse_transform=True)
    return _recon(model, params, ims_0, labels=latents, labels_2d=labels_2d)


def _make_one_hot_2d(interp_type, ims_0):
    if interp_type != 'labels' or ims_0 is None:
        return None
    from behavenet_tpu.data.transforms import MakeOneHot2D
    _, _, y_pix, x_pix = _nchw(ims_0).shape
    return MakeOneHot2D(y_pix, x_pix)


def _traversal_grid(interp_type, mins, maxes, mins_sc, maxes_sc, input_idxs, n_frames):
    """Per-dim linspace values in latent/label space and scaled-label space."""
    vals = {d: np.linspace(mins[d], maxes[d], n_frames) for d in input_idxs}
    if mins_sc is not None and maxes_sc is not None:
        vals_sc = {d: np.linspace(mins_sc[d], maxes_sc[d], n_frames) for d in input_idxs}
    elif interp_type == 'labels':
        raise NotImplementedError
    else:
        vals_sc = None
    return vals, vals_sc


def _traversal_cell(interp_type, model, params, ims_0, latents_0, labels_0,
                    labels_sc_0, one_hot_2d, assign, assign_sc):
    """Reconstruct one traversal cell.

    ``assign``: {dim: value} applied to the interpolated vector (latents for
    'latents' interpolation and for models whose labels live in the latent
    space, labels otherwise); ``assign_sc``: same in scaled-label units for
    the marker overlay / one-hot conditional-encoder map.

    Returns (im (N,C,H,W), labels_sc).
    """
    def _with(vec_0, updates):
        vec = np.copy(vec_0)
        for d, v in updates.items():
            vec[0, d] = v
        return vec

    if interp_type == 'latents':
        labels_sc = _get_updated_scaled_labels(labels_sc_0)
        im = _interp_frame('latents', model, params, ims_0,
                           _with(latents_0, assign), labels_0, None)
        return im, labels_sc

    labels_sc = _get_updated_scaled_labels(
        labels_sc_0, list(assign_sc.keys()), list(assign_sc.values()))
    labels_2d = None
    if labels_sc_0 is not None and np.asarray(labels_sc_0).ndim == 4:
        labels_2d = np.transpose(one_hot_2d(labels_sc), (0, 2, 3, 1))
    in_latent_space = model.hparams['model_class'] in (
        'cond-ae-msp', 'ps-vae', 'msps-vae')
    vec = _with(latents_0 if in_latent_space else labels_0, assign)
    im = _interp_frame('labels', model, params, ims_0, vec, labels_0, labels_2d)
    return im, labels_sc


def _crop_offsets(crop_type, crop_kwargs):
    if not crop_type:
        return 0, 0
    return (crop_kwargs['y_0'] - crop_kwargs['y_ext'],
            crop_kwargs['x_0'] - crop_kwargs['x_ext'])


def interpolate_2d(interp_type, model, params, ims_0, latents_0, labels_0, labels_sc_0,
                   mins, maxes, input_idxs, n_frames, crop_type=None, mins_sc=None,
                   maxes_sc=None, crop_kwargs=None, marker_idxs=None, ch=0):
    """2-D grid of reconstructions interpolating two latent/label dims.

    (reference cond_ae_utils.py:346-540 contract: returns
    (ims_list, labels_list, ims_crop_list) as n_frames x n_frames lists of
    lists; marker coordinates come from the interpolated dims for 'labels'
    traversals and from ``marker_idxs`` for 'latents' traversals, shifted by
    the crop origin. The cell reconstruction is shared with
    :func:`interpolate_1d` via :func:`_traversal_cell`.)
    """
    assert len(input_idxs) == 2
    one_hot_2d = _make_one_hot_2d(interp_type, ims_0)
    vals, vals_sc = _traversal_grid(
        interp_type, mins, maxes, mins_sc, maxes_sc, input_idxs, n_frames)
    y_min, x_min = _crop_offsets(crop_type, crop_kwargs)
    d0, d1 = input_idxs

    ims_list, ims_crop_list, labels_list = [], [], []
    for i0 in range(n_frames):
        row_ims, row_crops, row_markers = [], [], []
        for i1 in range(n_frames):
            assign = {d0: vals[d0][i0], d1: vals[d1][i1]}
            assign_sc = None if vals_sc is None else \
                {d0: vals_sc[d0][i0], d1: vals_sc[d1][i1]}
            im, labels_sc = _traversal_cell(
                interp_type, model, params, ims_0, latents_0, labels_0,
                labels_sc_0, one_hot_2d, assign, assign_sc)
            row_ims.append(np.copy(im[0, ch]))
            if interp_type == 'labels':
                marker_dims = (d0, d1)
            elif labels_sc_0 is not None:
                marker_dims = (marker_idxs[0], marker_idxs[1])
            else:
                marker_dims = None
            if marker_dims is None:
                row_markers.append([np.nan, np.nan])
            else:
                row_markers.append([
                    np.copy(labels_sc[0, marker_dims[0]]) - y_min,
                    np.copy(labels_sc[0, marker_dims[1]]) - x_min])
            row_crops.append(get_crop(
                im[0, 0], crop_kwargs['y_0'], crop_kwargs['y_ext'],
                crop_kwargs['x_0'], crop_kwargs['x_ext']) if crop_type else [])
        ims_list.append(row_ims)
        ims_crop_list.append(row_crops)
        labels_list.append(row_markers)

    return ims_list, labels_list, ims_crop_list


def interpolate_1d(interp_type, model, params, ims_0, latents_0, labels_0, labels_sc_0,
                   mins, maxes, input_idxs, n_frames, crop_type=None, mins_sc=None,
                   maxes_sc=None, crop_kwargs=None, marker_idxs=None, ch=0):
    """Per-dim 1-D traversals, one row per entry of ``input_idxs``.

    (reference cond_ae_utils.py:543-730 contract: same return format as
    :func:`interpolate_2d`; markers always come from ``marker_idxs`` here.)
    """
    one_hot_2d = _make_one_hot_2d(interp_type, ims_0)
    vals, vals_sc = _traversal_grid(
        interp_type, mins, maxes, mins_sc, maxes_sc, input_idxs, n_frames)
    y_min, x_min = _crop_offsets(crop_type, crop_kwargs)

    ims_list, ims_crop_list, labels_list = [], [], []
    for d in input_idxs:
        row_ims, row_crops, row_markers = [], [], []
        for i0 in range(n_frames):
            assign = {d: vals[d][i0]}
            assign_sc = None if vals_sc is None else {d: float(vals_sc[d][i0])}
            im, labels_sc = _traversal_cell(
                interp_type, model, params, ims_0, latents_0, labels_0,
                labels_sc_0, one_hot_2d, assign, assign_sc)
            row_ims.append(np.copy(im[0, ch]))
            row_crops.append(get_crop(
                im[0, 0], crop_kwargs['y_0'], crop_kwargs['y_ext'],
                crop_kwargs['x_0'], crop_kwargs['x_ext']) if crop_type else [])
            if labels_sc is not None and marker_idxs is not None:
                row_markers.append([
                    np.copy(labels_sc[0, marker_idxs[0]]) - y_min,
                    np.copy(labels_sc[0, marker_idxs[1]]) - x_min])
            else:
                row_markers.append([np.nan, np.nan])
        ims_list.append(row_ims)
        ims_crop_list.append(row_crops)
        labels_list.append(row_markers)

    return ims_list, labels_list, ims_crop_list


def interpolate_point_path(interp_type, model, params, ims_0, labels_0, points,
                           n_frames=10, ch=0, crop_kwargs=None,
                           apply_inverse_transform=True):
    """Reconstructions along a piecewise-linear path through latent/label space
    (reference :733-845). Returns (ims_list, inputs_list)."""
    if model.hparams.get('conditional_encoder', False):
        raise NotImplementedError

    points = np.asarray(points)
    n_points = len(points)
    if isinstance(n_frames, int):
        n_frames = [n_frames] * (n_points - 1)
    assert len(n_frames) == (n_points - 1)

    ims_list, inputs_list = [], []
    for p in range(n_points - 1):
        p0 = points[None, p]
        p1 = points[None, p + 1]
        p_vec = (p1 - p0) / n_frames[p]
        for pn in range(n_frames[p] + 1):
            vec = p0 + pn * p_vec
            mc = model.hparams['model_class']
            if interp_type == 'latents':
                if mc in ('cond-ae', 'cond-vae'):
                    im_tmp = _recon(model, params, vec,
                                    apply_inverse_transform=apply_inverse_transform,
                                    labels=labels_0)
                else:
                    im_tmp = _recon(model, params, vec,
                                    apply_inverse_transform=apply_inverse_transform)
            elif interp_type == 'labels':
                if mc in ('cond-ae-msp', 'ps-vae', 'msps-vae'):
                    im_tmp = _recon(model, params, vec, apply_inverse_transform=True)
                else:
                    im_tmp = _recon(model, params, ims_0, labels=vec)
            else:
                raise NotImplementedError

            if crop_kwargs is not None:
                if not isinstance(ch, int):
                    raise ValueError('"ch" must be an integer to use crop_kwargs')
                ims_list.append(get_crop(
                    im_tmp[0, ch], crop_kwargs['y_0'], crop_kwargs['y_ext'],
                    crop_kwargs['x_0'], crop_kwargs['x_ext']))
            else:
                if isinstance(ch, int):
                    ims_list.append(np.copy(im_tmp[0, ch]))
                else:
                    ims_list.append(np.copy(concat(im_tmp[0])))
            inputs_list.append(vec)

    return ims_list, inputs_list


# ----------------------------------------
# mid-level plotting
# ----------------------------------------

def plot_2d_frame_array(ims_list, markers=None, im_kwargs=None, marker_kwargs=None,
                        figsize=None, save_file=None, format='pdf'):
    """2-D grid of interpolated frames (reference :881-933)."""
    import matplotlib.pyplot as plt

    n_y = len(ims_list)
    n_x = len(ims_list[0])
    if figsize is None:
        y_pix, x_pix = ims_list[0][0].shape
        in_per_pix = 15 / (x_pix * n_x)
        figsize = (15, in_per_pix * y_pix * n_y)
    fig, axes = plt.subplots(n_y, n_x, figsize=figsize, squeeze=False)

    if im_kwargs is None:
        im_kwargs = {'vmin': 0, 'vmax': 1, 'cmap': 'gray'}
    if marker_kwargs is None:
        marker_kwargs = {'markersize': 20, 'markeredgewidth': 3}

    for r, ims_list_y in enumerate(ims_list):
        for c, im in enumerate(ims_list_y):
            axes[r, c].imshow(im, **im_kwargs)
            axes[r, c].set_xticks([])
            axes[r, c].set_yticks([])
            if markers is not None:
                axes[r, c].plot(markers[r][c][1], markers[r][c][0], 'o', **marker_kwargs)
    plt.subplots_adjust(wspace=0, hspace=0, bottom=0, left=0, top=1, right=1)
    if save_file is not None:
        make_dir_if_not_exists(save_file)
        plt.savefig(save_file + '.' + format, dpi=300, bbox_inches='tight')
    return fig


def plot_1d_frame_array(ims_list, markers=None, im_kwargs=None, marker_kwargs=None,
                        plot_ims=True, plot_diffs=True, figsize=None, save_file=None,
                        format='pdf'):
    """Rows of 1-D traversals, optionally with difference images (reference :935-1011)."""
    import matplotlib.pyplot as plt

    if not (plot_ims or plot_diffs):
        raise ValueError('Must plot at least one of ims or diffs')

    offset = 2 if (plot_ims and plot_diffs) else 1
    n_y = len(ims_list) * offset
    n_x = len(ims_list[0])
    if figsize is None:
        y_pix, x_pix = ims_list[0][0].shape
        in_per_pix = 15 / (x_pix * n_x)
        figsize = (15, in_per_pix * y_pix * n_y)
    fig, axes = plt.subplots(n_y, n_x, figsize=figsize, squeeze=False)

    if im_kwargs is None:
        im_kwargs = {'vmin': 0, 'vmax': 1, 'cmap': 'gray'}
    if marker_kwargs is None:
        marker_kwargs = {'markersize': 20, 'markeredgewidth': 3}

    for r, ims_list_y in enumerate(ims_list):
        base_im = ims_list_y[0]
        for c, im in enumerate(ims_list_y):
            if plot_ims:
                axes[offset * r, c].imshow(im, **im_kwargs)
                axes[offset * r, c].set_xticks([])
                axes[offset * r, c].set_yticks([])
                if markers is not None:
                    axes[offset * r, c].plot(
                        markers[r][c][1], markers[r][c][0], 'o', **marker_kwargs)
            if plot_diffs and plot_ims:
                axes[offset * r + 1, c].imshow(0.5 + (im - base_im), **im_kwargs)
                axes[offset * r + 1, c].set_xticks([])
                axes[offset * r + 1, c].set_yticks([])
            elif plot_diffs:
                axes[offset * r, c].imshow(0.5 + (im - base_im), **im_kwargs)
                axes[offset * r, c].set_xticks([])
                axes[offset * r, c].set_yticks([])
    plt.subplots_adjust(wspace=0, hspace=0, bottom=0, left=0, top=1, right=1)
    if save_file is not None:
        make_dir_if_not_exists(save_file)
        plt.savefig(save_file + '.' + format, dpi=300, bbox_inches='tight')
    return fig


def make_interpolated(ims, save_file, markers=None, text=None, text_title=None,
                      text_color=[1, 1, 1], frame_rate=20, scale=3, markersize=10,
                      markeredgecolor='w', markeredgewidth=1, ax=None):
    """Movie of a single interpolation sequence (reference :1014-1102)."""
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    y_pix, x_pix = ims[0].shape

    if ax is None:
        fig_width = scale / 2
        fig_height = y_pix / x_pix * scale / 2
        fig = plt.figure(figsize=(fig_width, fig_height), dpi=300)
        ax = plt.gca()
        return_ims = False
    else:
        fig = ax.figure
        return_ims = True

    ax.set_xticks([])
    ax.set_yticks([])

    default_kwargs = {'animated': True, 'cmap': 'gray', 'vmin': 0, 'vmax': 1}
    txt_kwargs = {
        'fontsize': 4, 'color': text_color, 'fontname': 'monospace',
        'horizontalalignment': 'left', 'verticalalignment': 'center',
        'transform': ax.transAxes}

    ims_ani = []
    for i, im in enumerate(ims):
        im_tmp = ax.imshow(im, **default_kwargs)
        ims_curr = [im_tmp]
        if markers is not None:
            markers_tmp = ax.plot(
                markers[i][1], markers[i][0], '.r', markersize=markersize,
                markeredgecolor=markeredgecolor, markeredgewidth=markeredgewidth)[0]
            ims_curr.append(markers_tmp)
        if text is not None:
            text_tmp = ax.text(0.02, 0.06, text[i], **txt_kwargs)
            ims_curr.append(text_tmp)
        if text_title is not None:
            text_title_tmp = ax.text(0.02, 0.92, text_title[i], **txt_kwargs)
            ims_curr.append(text_title_tmp)
        ims_ani.append(ims_curr)

    if return_ims:
        return ims_ani
    plt.tight_layout(pad=0)
    ani = animation.ArtistAnimation(fig, ims_ani, blit=True, repeat=True)
    save_movie(save_file, ani, frame_rate=frame_rate)
    return ani


def make_interpolated_multipanel(ims, save_file, markers=None, text=None, text_title=None,
                                 n_cols=3, frame_rate=15, scale=1, **kwargs):
    """Grid movie of multiple interpolation sequences (reference :1105-1172)."""
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    n_panels = len(ims)
    markers = [None] * n_panels if markers is None else markers
    text = [None] * n_panels if text is None else text

    y_pix, x_pix = ims[0][0].shape
    n_rows = int(np.ceil(n_panels / n_cols))
    fig_width = scale / 2 * n_cols
    fig_height = y_pix / x_pix * scale / 2 * n_rows
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(fig_width, fig_height), dpi=300,
                             squeeze=False)
    plt.subplots_adjust(wspace=0, hspace=0, left=0, bottom=0, right=1, top=1)

    ims_ani = []
    for i, (ims_curr, markers_curr, text_curr) in enumerate(zip(ims, markers, text)):
        row = i // n_cols
        col = i % n_cols
        ims_ani_curr = make_interpolated(
            ims=ims_curr, markers=markers_curr, text=text_curr, text_title=text_title,
            ax=axes[row, col], save_file=None, **kwargs)
        ims_ani.append(ims_ani_curr)

    # rearrange: one list of artists per frame
    ims_ani = [[a for sublist in frames for a in sublist] for frames in zip(*ims_ani)]

    ani = animation.ArtistAnimation(fig, ims_ani, blit=True, repeat=True)
    save_movie(save_file, ani, frame_rate=frame_rate)
    return ani


# ----------------------------------------
# high-level PS-VAE analysis
# ----------------------------------------

def plot_psvae_training_curves(hparams, alphas, betas, rng_seeds_model, n_ae_latents,
                               save_file=None, batch_size=None, format='png', **kwargs):
    """PS-VAE training curves across alpha/beta/seed settings (reference :1376-1513)."""
    import matplotlib.pyplot as plt
    import pandas as pd
    import seaborn as sns

    metrics_list = ['loss', 'loss_data_ll', 'loss_zu_mi', 'loss_zu_tc', 'loss_zu_dwkl',
                    'loss_zs_kl', 'label_r2']
    metrics_dfs = []
    for alpha in alphas:
        for beta in betas:
            for rng in rng_seeds_model:
                hparams_ = copy.deepcopy(hparams)
                hparams_['ps_vae.alpha'] = alpha
                hparams_['ps_vae.beta'] = beta
                hparams_['rng_seed_model'] = rng
                hparams_['n_ae_latents'] = n_ae_latents
                try:
                    df = load_metrics_csv_as_df(
                        hparams_, hparams_['lab'], hparams_['expt'], metrics_list,
                        version=None)
                    df['alpha'] = alpha
                    df['beta'] = beta
                    df['rng'] = rng
                    metrics_dfs.append(df)
                except (FileNotFoundError, TypeError):
                    print('skipping alpha=%s beta=%s rng=%s (not found)' % (alpha, beta, rng))
    metrics_df = pd.concat(metrics_dfs, sort=False)

    sns.set_style('white')
    data_queried = metrics_df[(metrics_df.epoch > 0) & ~pd.isna(metrics_df.val)]
    g = sns.FacetGrid(
        data_queried, col='loss', hue='dtype', sharey=False, col_wrap=3, **kwargs)
    g = g.map(plt.plot, 'epoch', 'val').add_legend()
    if save_file is not None:
        make_dir_if_not_exists(save_file)
        g.savefig(save_file + '.' + format, dpi=300)
    return g


def plot_hyperparameter_search_results(lab, expt, animal, session, n_ae_latents, label_names,
                                       alpha_weights, alpha_n_ae_latents, alpha_expt_name,
                                       beta_weights, beta_expt_name, save_file,
                                       batch_size=None, format='png', **kwargs):
    """Summary plot of the PS-VAE alpha/beta search (reference :1516-1849).

    Left: label R^2 as a function of alpha (alpha search stage); right:
    mean latent MSE and TC as functions of beta (beta search stage).
    """
    import matplotlib.pyplot as plt
    import pandas as pd
    import seaborn as sns

    from behavenet_tpu.fitting.experiment import get_expt_dir, get_session_dir

    base = {
        'lab': lab, 'expt': expt, 'animal': animal, 'session': session,
        'sessions_csv': '', 'n_ae_latents': None, 'model_class': 'ps-vae',
        'model_type': 'conv',
    }

    def _collect(expt_name, weights, key, n_latents):
        dfs = []
        for w in weights:
            hp = dict(base)
            hp['experiment_name'] = expt_name
            hp['n_ae_latents'] = n_latents
            try:
                hp['session_dir'], _ = get_session_dir(hp)
                hp['expt_dir'] = get_expt_dir(hp)
                df = load_metrics_csv_as_df(
                    hp, lab, expt, ['loss_data_mse', 'loss_zu_tc', 'label_r2'],
                    version='best')
                df[key] = w
                dfs.append(df)
            except Exception as e:
                print('skipping %s=%s: %s' % (key, w, e))
        return pd.concat(dfs, sort=False) if dfs else pd.DataFrame()

    alpha_df = _collect(alpha_expt_name, alpha_weights, 'alpha', alpha_n_ae_latents)
    beta_df = _collect(beta_expt_name, beta_weights, 'beta', n_ae_latents)

    sns.set_style('white')
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    if len(alpha_df):
        d = alpha_df[(alpha_df.loss == 'label_r2') & (alpha_df.dtype == 'val')]
        sns.lineplot(data=d, x='alpha', y='val', ax=axes[0], marker='o')
        axes[0].set_xlabel('alpha')
        axes[0].set_ylabel('label R^2')
        axes[0].set_title('alpha search')
    if len(beta_df):
        d = beta_df[(beta_df.loss == 'loss_zu_tc') & (beta_df.dtype == 'val')]
        sns.lineplot(data=d, x='beta', y='val', ax=axes[1], marker='o')
        axes[1].set_xlabel('beta')
        axes[1].set_ylabel('total correlation')
        axes[1].set_title('beta search')
    plt.tight_layout()
    if save_file is not None:
        make_dir_if_not_exists(save_file)
        plt.savefig(save_file + '.' + format, dpi=300)
    return fig


def plot_label_reconstructions(model, params, data_generator, trials, sess_idx=0,
                               label_names=None, save_file=None, format='png', **kwargs):
    """True vs PS-VAE-reconstructed labels for given trials (reference :1852-1967)."""
    import matplotlib.pyplot as plt

    import jax

    ys, y_hats = [], []
    for trial in trials:
        batch = data_generator.datasets[sess_idx][int(trial)]
        x = batch['images'].astype('float32') / 255.0
        y = batch['labels']
        y_hat = np.asarray(model.get_predicted_labels(
            params, x, dataset=sess_idx, rng=jax.random.PRNGKey(0)))
        ys.append(y)
        y_hats.append(y_hat)
    y = np.vstack(ys)
    y_hat = np.vstack(y_hats)

    n_labels = y.shape[1]
    if label_names is None:
        label_names = ['label %i' % i for i in range(n_labels)]
    fig, axes = plt.subplots(n_labels, 1, figsize=(10, 2 * n_labels), squeeze=False)
    for i in range(n_labels):
        axes[i, 0].plot(y[:, i], label='true')
        axes[i, 0].plot(y_hat[:, i], label='predicted')
        axes[i, 0].set_ylabel(label_names[i])
        if i == 0:
            axes[i, 0].legend()
    axes[-1, 0].set_xlabel('frame')
    plt.tight_layout()
    if save_file is not None:
        make_dir_if_not_exists(save_file)
        plt.savefig(save_file + '.' + format, dpi=300)
    return fig


def plot_latent_traversals(model, params, ims_0, latents_0, labels_0=None, labels_sc_0=None,
                           latent_range=None, label_range=None, latent_idxs=None,
                           label_idxs=None, n_frames=8, save_file=None, format='png', **kwargs):
    """Static grid of per-dim latent (and label) traversals (reference :1970-2201)."""
    ims_all = []
    if label_idxs is not None and label_range is not None:
        ims_lab, _, _ = interpolate_1d(
            'labels', model, params, ims_0, latents_0, labels_0, labels_sc_0,
            label_range['min'], label_range['max'], label_idxs, n_frames)
        ims_all += ims_lab
    if latent_idxs is not None and latent_range is not None:
        ims_lat, _, _ = interpolate_1d(
            'latents', model, params, ims_0, latents_0, labels_0, labels_sc_0,
            latent_range['min'], latent_range['max'], latent_idxs, n_frames)
        ims_all += ims_lat
    return plot_1d_frame_array(
        ims_all, plot_ims=True, plot_diffs=False, save_file=save_file, format=format)


def make_latent_traversal_movie(model, params, ims_0, latents_0, labels_0=None,
                                latent_range=None, latent_idxs=None, n_frames=10,
                                n_buffer=5, save_file=None, frame_rate=15, ch=0, **kwargs):
    """Movie traversing each latent dim in sequence (reference :2204-2513)."""
    latent_idxs = np.arange(latents_0.shape[1]) if latent_idxs is None else latent_idxs
    ims_seq = []
    text = []
    for d in latent_idxs:
        points = []
        base = latents_0[0].copy()
        lo = latent_range['min'][d]
        hi = latent_range['max'][d]
        mid = base[d]
        for val in (mid, lo, hi, mid):
            p = base.copy()
            p[d] = val
            points.append(p)
        ims_list, _ = interpolate_point_path(
            'latents', model, params, ims_0, labels_0, points, n_frames=n_frames, ch=ch)
        ims_seq += ims_list
        text += ['latent %i' % d] * len(ims_list)
        # buffer frames between dims
        if n_buffer > 0:
            ims_seq += [ims_list[-1]] * n_buffer
            text += [''] * n_buffer
    return make_interpolated(
        ims=ims_seq, text=None, text_title=text, save_file=save_file,
        frame_rate=frame_rate)


def collect_data(data_generator, model, params, dtype, fit_full=False):
    """Latents (+labels/masks) for every batch of ``dtype`` (reference :1282-1320).

    Returns ``(ys, zs, masks, trials, sessions)`` lists; ``zs`` holds the
    model-appropriate latents: unsupervised latents for ps-vae (all latents
    when ``fit_full``), background latents for msps-vae, full latent vector
    otherwise.
    """
    ys, zs, masks, trials, sessions = [], [], [], [], []
    mc = model.hparams['model_class']
    data_generator.reset_iterators(dtype)
    for _ in range(data_generator.n_tot_batches[dtype]):
        data, sess = data_generator.next_batch(dtype)
        x = np.asarray(data['images'])
        if x.dtype == np.uint8:
            x = x.astype('float32') / 255.0
        y = np.asarray(data['labels']) if 'labels' in data else None
        n = np.asarray(data['labels_masks']) if 'labels_masks' in data else None
        if mc == 'ae':
            z = model.encode(params, x, dataset=sess)
        elif mc in ('vae', 'cond-vae', 'beta-tcvae'):
            z, _, _ = model.encoding.apply(params['encoder'], x, dataset=sess)
        elif mc == 'ps-vae':
            yhat, w, _, _ = model.encode(params, x, dataset=sess)
            z = np.concatenate([np.asarray(yhat), np.asarray(w)], axis=1) \
                if fit_full else w
        elif mc == 'msps-vae':
            _, z_b, _, _, _ = model.encode(params, x, dataset=sess)
            z = z_b
        else:
            raise NotImplementedError(mc)
        z = np.asarray(z)
        if y is not None:
            ys.append(y)
        zs.append(z)
        if n is not None:
            masks.append(n)
        elif y is not None:
            masks.append(np.ones_like(y))
        else:
            masks.append(None)
        trials.append(int(data['batch_idx']))
        sessions.append(sess * np.ones(z.shape[0], dtype=int))
    return ys, zs, masks, trials, sessions


def get_label_r2(hparams, model, params, data_generator, version, label_names,
                 dtype='val', overwrite=False):
    """Per-label R^2 of the supervised subspace, cached as
    ``r2_supervised.csv`` in the version dir (reference :1234-1279)."""
    import pandas as pd
    from sklearn.metrics import r2_score

    n_labels = len(label_names)
    save_file = os.path.join(
        hparams['expt_dir'], 'version_%i' % version, 'r2_supervised.csv')
    if os.path.exists(save_file) and not overwrite:
        print('loading results from %s' % save_file)
        return pd.read_csv(save_file)

    rows = []
    data_generator.reset_iterators(dtype)
    for _ in range(data_generator.n_tot_batches[dtype]):
        data, sess = data_generator.next_batch(dtype)
        x = np.asarray(data['images'])
        if x.dtype == np.uint8:
            x = x.astype('float32') / 255.0
        y = np.asarray(data['labels'])
        n = np.asarray(data['labels_masks']) if 'labels_masks' in data \
            else np.ones_like(y)
        z = np.asarray(model.get_transformed_latents(params, x, dataset=sess))
        for i in range(n_labels):
            y_true = apply_masks(y[:, i], n[:, i])
            y_pred = apply_masks(z[:, i], n[:, i])
            if len(y_true) > 10:
                r2 = r2_score(y_true, y_pred, multioutput='variance_weighted')
                mse = float(np.mean(np.square(y_true - y_pred)))
            else:
                r2, mse = np.nan, np.nan
            rows.append({
                'Trial': int(data['batch_idx']), 'Label': label_names[i],
                'R2': r2, 'MSE': mse, 'Model': hparams['model_class'].upper()})
    metrics_df = pd.DataFrame(rows)
    print('saving results to %s' % save_file)
    metrics_df.to_csv(save_file, index=False, header=True)
    return metrics_df


def fit_classifier(model_or_latents, datasets_or_labels, **kwargs):
    """Logistic-regression session classifier on background latents (reference :1323-1373).

    Accepts (latents (N, d), session_ids (N,)); returns (classifier, accuracy)
    via cross-validation.
    """
    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import cross_val_score

    latents = np.asarray(model_or_latents)
    labels = np.asarray(datasets_or_labels)
    clf = LogisticRegression(max_iter=1000, **kwargs)
    scores = cross_val_score(clf, latents, labels, cv=5)
    clf.fit(latents, labels)
    return clf, float(np.mean(scores))


def plot_mspsvae_training_curves(hparams, alpha, beta, delta, rng_seed_model, n_latents,
                                 n_background, n_labels, lab=None, expt=None, dtype='val',
                                 version_dir=None, save_file=None, format='pdf', **kwargs):
    """MSPS-VAE training curves for every objective term (reference :2516-2612).

    Plots total loss, pixel MSE, label R^2, supervised-KL, unsupervised
    MI/TC/DWKL and the triplet term as a function of epoch.
    """
    import matplotlib.pyplot as plt
    import pandas as pd
    import seaborn as sns

    metrics_list = ['loss', 'loss_data_mse', 'label_r2', 'loss_zs_kl',
                    'loss_zu_mi', 'loss_zu_tc', 'loss_zu_dwkl', 'loss_triplet']

    hparams_ = copy.deepcopy(hparams)
    hparams_.update(kwargs)
    hparams_['ps_vae.alpha'] = alpha
    hparams_['ps_vae.beta'] = beta
    hparams_['ps_vae.delta'] = delta
    hparams_['rng_seed_model'] = rng_seed_model
    hparams_['n_ae_latents'] = n_latents + n_background + n_labels
    hparams_['n_background'] = n_background

    df = load_metrics_csv_as_df(
        hparams_, lab or hparams_.get('lab'), expt or hparams_.get('expt'),
        metrics_list, version=None, version_dir=version_dir)

    sns.set_style('white')
    data_queried = df[(df.epoch > 0) & ~pd.isna(df.val) & (df.dtype == dtype)]
    g = sns.FacetGrid(data_queried, col='loss', hue='dataset', sharey=False, col_wrap=3)
    g = g.map(plt.plot, 'epoch', 'val').add_legend()
    if save_file is not None:
        make_dir_if_not_exists(save_file)
        g.savefig(save_file + '.' + format, dpi=300)
    return g


def plot_mspsvae_hyperparameter_search_results(
        hparams, sess_ids, label_names, n_background, alpha_weights, alpha_n_ae_latents,
        alpha_expt_name, beta_weights, delta_weights, beta_delta_n_ae_latents,
        beta_delta_expt_name, alpha, beta, delta, save_file, batch_size=None,
        format='png', **kwargs):
    """Diagnostic panels for the MSPS-VAE two-stage hyperparameter search
    (reference :2615-3027).

    Stage 1 (alpha search, fixed beta/delta): pixel MSE and label MSE as
    functions of alpha x n_latents. Stage 2 (beta/delta search, fixed
    alpha/n_latents): pixel MSE, label MSE, and the unsupervised KL
    decomposition (MI / TC / DWKL) as functions of beta x delta.
    """
    import matplotlib.pyplot as plt
    import pandas as pd
    import seaborn as sns

    n_labels = len(label_names)

    def _collect(expt_name, n_latents, sweep, metrics):
        """sweep: list of (column, value) dicts to stamp per model."""
        dfs = []
        for setting in sweep:
            hp = copy.deepcopy(hparams)
            hp['experiment_name'] = expt_name
            hp['n_ae_latents'] = n_latents + n_background + n_labels
            hp['n_background'] = n_background
            for key, val in setting.items():
                hp['ps_vae.%s' % key] = val
            for key, val in kwargs.items():
                hp[key] = val
            try:
                df = load_metrics_csv_as_df(
                    hp, hp.get('lab'), hp.get('expt'), metrics, version='best')
                for key, val in setting.items():
                    df[key] = val
                df['n_latents'] = n_latents
                dfs.append(df)
            except Exception as e:
                print('skipping %s %s: %s' % (expt_name, setting, e))
        return pd.concat(dfs, sort=False) if dfs else pd.DataFrame()

    alpha_metrics = ['loss_data_mse', 'label_r2']
    bd_metrics = ['loss_data_mse', 'label_r2', 'loss_zu_mi', 'loss_zu_tc',
                  'loss_zu_dwkl', 'loss_triplet']

    alpha_dfs = []
    for n_lat in np.atleast_1d(alpha_n_ae_latents):
        sweep = [{'alpha': a, 'beta': beta, 'delta': delta} for a in alpha_weights]
        alpha_dfs.append(_collect(alpha_expt_name, int(n_lat), sweep, alpha_metrics))
    alpha_df = pd.concat([d for d in alpha_dfs if len(d)], sort=False) \
        if any(len(d) for d in alpha_dfs) else pd.DataFrame()

    sweep = [{'alpha': alpha, 'beta': b, 'delta': d}
             for b in beta_weights for d in delta_weights]
    bd_df = _collect(beta_delta_expt_name, int(beta_delta_n_ae_latents), sweep,
                     bd_metrics)

    sns.set_style('white')
    fig, axes = plt.subplots(2, 3, figsize=(15, 8))

    def _panel(ax, df, x, metric, hue=None, title=None):
        if not len(df):
            ax.set_axis_off()
            return
        d = df[(df.loss == metric) & (df.dtype == 'val')]
        if not len(d):
            ax.set_axis_off()
            return
        sns.lineplot(data=d, x=x, y='val', hue=hue, ax=ax, marker='o')
        ax.set_xscale('symlog')
        ax.set_title(title or metric)

    _panel(axes[0, 0], alpha_df, 'alpha', 'loss_data_mse', hue='n_latents',
           title='pixel MSE vs alpha')
    _panel(axes[0, 1], alpha_df, 'alpha', 'label_r2', hue='n_latents',
           title='label R^2 vs alpha')
    _panel(axes[0, 2], bd_df, 'beta', 'loss_data_mse', hue='delta',
           title='pixel MSE vs beta/delta')
    _panel(axes[1, 0], bd_df, 'beta', 'loss_zu_mi', hue='delta',
           title='index-code MI vs beta/delta')
    _panel(axes[1, 1], bd_df, 'beta', 'loss_zu_tc', hue='delta',
           title='total correlation vs beta/delta')
    _panel(axes[1, 2], bd_df, 'beta', 'loss_zu_dwkl', hue='delta',
           title='dimension-wise KL vs beta/delta')
    plt.tight_layout()
    if save_file is not None:
        make_dir_if_not_exists(save_file)
        plt.savefig(save_file + '.' + format, dpi=300)
    return fig


def make_session_swap_movie(sess_ids, hparams, version, n_labels, n_background, sess_idx,
                            trials, trial_idxs=None, n_buffer_frames=5, frame_rate=15,
                            layout_pattern=None, save_file=None, **kwargs):
    """Panel movie reconstructing one session's frames with other sessions'
    background context (reference :3030-3156).

    For each panel s, the background subspace of the transformed latents is
    replaced by session s's median background embedding before inverse
    transform + decoding — visualizing what the MSPS-VAE attributes to
    session identity.
    """
    import jax

    from behavenet_tpu.fitting.experiment import get_best_model_and_data
    from behavenet_tpu.plotting.ae_utils import make_reconstruction_movie

    panel_titles = ['Original'] + ['Transfer %i' % i for i in range(len(sess_ids) - 1)]

    hp = copy.deepcopy(hparams)
    hp.update(kwargs)
    hp['n_sessions_per_batch'] = 1
    model, params, data_generator = get_best_model_and_data(hp, Model=None, version=version)

    background_idxs = np.arange(n_labels, n_labels + n_background)
    background_medians = []
    for s in range(len(sess_ids)):
        latent_range = get_input_range(
            'latents', hp, sess_ids=sess_ids, sess_idx=s, model=model, params=params,
            data_gen=data_generator, min_p=15, max_p=85, version=version)
        background_medians.append(latent_range['med'][background_idxs])

    if trial_idxs is None:
        trial_idxs = [None] * len(trials)

    ims_panels = [[] for _ in range(len(sess_ids) + 1)]
    for trial_idx, trial in zip(trial_idxs, trials):
        if trial is None:
            trial = int(data_generator.datasets[sess_idx].batch_idxs['test'][trial_idx or 0])
        batch = data_generator.datasets[sess_idx][int(trial)]
        ims_orig = batch['images'][:400].astype('float32') / 255.0  # NHWC
        latents_tr = np.asarray(model.get_transformed_latents(
            params, ims_orig, dataset=sess_idx))

        ims_panels[0].append(np.transpose(ims_orig, (0, 3, 1, 2)))
        for s in range(len(sess_ids)):
            lat_s = np.copy(latents_tr)
            lat_s[:, background_idxs] = background_medians[s]
            recon = get_reconstruction(
                model, params, lat_s, apply_inverse_transform=True, dataset=sess_idx)
            ims_panels[s + 1].append(np.transpose(np.asarray(recon), (0, 3, 1, 2)))

        # blank buffer frames between trials
        shape = ims_panels[0][-1].shape
        blank = np.zeros((n_buffer_frames,) + shape[1:], dtype='float32')
        for p in range(len(ims_panels)):
            ims_panels[p].append(blank.copy())

    ims = [np.concatenate(p, axis=0) for p in ims_panels]
    n_panels = len(ims)
    n_cols = int(np.ceil(np.sqrt(n_panels)))
    n_rows = int(np.ceil(n_panels / n_cols))
    titles = ['Original'] + ['Session %i background' % s for s in range(len(sess_ids))]
    return make_reconstruction_movie(
        ims=ims, titles=titles[:n_panels], n_rows=n_rows, n_cols=n_cols,
        save_file=save_file, frame_rate=frame_rate)
