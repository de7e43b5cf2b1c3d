"""Plotting and movie utilities for autoencoders.

Behavioral contract follows the reference (behavenet/plotting/ae_utils.py):
grid movies of original / reconstructed / residual frames. Images are
handled NCHW in the plotting layer (matching the reference's conventions);
the wrapper converts from the pipeline's NHWC.
"""

import numpy as np

from behavenet_tpu.plotting import concat, save_movie

__all__ = ['make_ae_reconstruction_movie_wrapper', 'make_reconstruction_movie']


def make_reconstruction_movie(ims, titles=None, n_rows=0, n_cols=0, save_file=None,
                              frame_rate=15, dpi=100):
    """Grid movie of image stacks (reference ae_utils.py:14-97).

    ``ims``: list of (n_frames, n_channels, y_pix, x_pix) arrays (empty
    entries skip that grid cell).
    """
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt
    from matplotlib.gridspec import GridSpec

    for im in ims:
        if len(im) != 0:
            n_frames, n_channels, y_pix, x_pix = im.shape
            break
    scale_ = 5
    fig_width = scale_ * n_cols * n_channels / 2
    fig_height = y_pix / x_pix * scale_ * n_rows / 2
    offset = 0.5 if n_rows == 1 else 0
    fig = plt.figure(figsize=(fig_width, fig_height + offset), dpi=dpi)

    gs = GridSpec(n_rows, n_cols, figure=fig)
    axs = []
    ax_count = 0
    for i in range(n_rows):
        for j in range(n_cols):
            if ax_count < len(ims):
                axs.append(fig.add_subplot(gs[i, j]))
                ax_count += 1
            else:
                break
    for ax_i, ax in enumerate(axs):
        ax.set_xticks([])
        ax.set_yticks([])
        if len(ims[ax_i]) == 0:
            ax.set_axis_off()

    titles = ['' for _ in range(n_cols * n_rows)] if titles is None else titles
    for ax_i, ax in enumerate(axs):
        if len(ims[ax_i]) != 0:
            ax.set_title(titles[ax_i], fontsize=12)

    default_kwargs = {'animated': True, 'cmap': 'gray', 'vmin': 0, 'vmax': 1}

    ims_ani = []
    for i in range(n_frames):
        ims_curr = []
        for ax_i, ax in enumerate(axs):
            if len(ims[ax_i]) != 0:
                ims_tmp = ims[ax_i][i, 0] if n_channels == 1 else concat(ims[ax_i][i])
                im = ax.imshow(ims_tmp, **default_kwargs)
                for s in ax.spines.values():
                    s.set_visible(False)
                ims_curr.append(im)
        ims_ani.append(ims_curr)

    plt.tight_layout(pad=0)
    ani = animation.ArtistAnimation(fig, ims_ani, blit=True, repeat_delay=1000)
    save_movie(save_file, ani, frame_rate=frame_rate)
    return ani


def make_ae_reconstruction_movie_wrapper(hparams, save_file, trial=None, sess_idx=0,
                                         version='best', include_linear=False,
                                         max_frames=400, frame_rate=15):
    """Original vs reconstruction vs residual movie (reference ae_utils.py:100-186)."""
    from behavenet_tpu.fitting.eval import get_reconstruction
    from behavenet_tpu.fitting.experiment import get_best_model_and_data

    if hparams['model_class'] == 'ae':
        from behavenet_tpu.models import AE as Model
    elif hparams['model_class'] == 'cond-ae':
        from behavenet_tpu.models import ConditionalAE as Model
    else:
        raise NotImplementedError('"%s" is an invalid model class' % hparams['model_class'])
    model_ae, params_ae, data_generator = get_best_model_and_data(
        hparams, Model, version=version)

    if include_linear:
        import copy
        hparams_lin = copy.copy(hparams)
        hparams_lin['model_type'] = 'linear'
        if 'lin_experiment_name' in hparams:
            hparams_lin['experiment_name'] = hparams['lin_experiment_name']
        model_lin, params_lin, _ = get_best_model_and_data(
            hparams_lin, Model, load_data=False, version=version)

    if trial is None:
        trial = int(data_generator.datasets[sess_idx].batch_idxs['test'][0])
    batch = data_generator.datasets[sess_idx][trial]
    ims_orig = batch['images'][:max_frames]  # NHWC uint8
    labels = batch['labels'][:max_frames] if hparams['model_class'] == 'cond-ae' else None

    ims_recon_ae = get_reconstruction(model_ae, params_ae, ims_orig, labels=labels)
    if include_linear:
        ims_recon_lin = get_reconstruction(model_lin, params_lin, ims_orig, labels=labels)

    ims_orig_f = ims_orig.astype('float32') / 255.0
    if hparams.get('use_output_mask', False) and 'masks' in batch:
        ims_orig_f = ims_orig_f * batch['masks'][:max_frames]

    def to_nchw(x):
        return np.transpose(np.asarray(x), (0, 3, 1, 2))

    ims_orig_n = to_nchw(ims_orig_f)
    ims_recon_n = to_nchw(ims_recon_ae)
    ims = [ims_orig_n, ims_recon_n, 0.5 + (ims_orig_n - ims_recon_n)]
    titles = ['Original', 'Conv AE reconstructed', 'Conv AE residual']
    if include_linear:
        ims_lin_n = to_nchw(ims_recon_lin)
        ims += [[], ims_lin_n, 0.5 + (ims_orig_n - ims_lin_n)]
        titles += ['', 'Linear AE reconstructed', 'Linear AE residual']
        n_rows, n_cols = 2, 3
    else:
        n_rows, n_cols = 1, 3

    return make_reconstruction_movie(
        ims=ims, titles=titles, n_rows=n_rows, n_cols=n_cols, save_file=save_file,
        frame_rate=frame_rate)
