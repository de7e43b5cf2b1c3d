"""ARHMM analysis utilities: state-run extraction, durations, model loading.

Behavioral contract follows the reference (behavenet/plotting/arhmm_utils.py);
``get_latent_arrays_by_dtype`` is also used by the ARHMM fitting path
(reference arhmm_grid_search.py:58-68). Movie/plot functions live further
down and consume matplotlib only at call time.
"""

import os
import pickle

import numpy as np

__all__ = ['get_discrete_chunks', 'get_state_durations', 'get_latent_arrays_by_dtype',
           'get_model_latents_states', 'make_syllable_movies_wrapper',
           'make_syllable_movies', 'real_vs_sampled_wrapper',
           'make_real_vs_sampled_movies', 'plot_real_vs_sampled',
           'plot_states_overlaid_with_latents', 'plot_state_transition_matrix',
           'plot_dynamics_matrices', 'plot_obs_biases', 'plot_obs_covariance_matrices']


def get_discrete_chunks(states, include_edges=True):
    """Find occurrences of each discrete state (reference arhmm_utils.py:24-69
    output contract).

    Returns a list of length n_states; entry k is an array of
    [trial, start_idx, end_idx] rows (end exclusive) for each run of state
    k. With ``include_edges=False``, runs touching either end of a trial
    are dropped.
    """
    n_states = max(int(np.max(seq)) for seq in states) + 1
    chunks = [[] for _ in range(n_states)]
    for trial, seq in enumerate(states):
        seq = np.asarray(seq)
        # run-length encode the state sequence
        starts = np.flatnonzero(np.r_[True, seq[1:] != seq[:-1]])
        ends = np.r_[starts[1:], len(seq)]
        if not include_edges:
            keep = (starts != 0) & (ends != len(seq))
            starts, ends = starts[keep], ends[keep]
        for s, e in zip(starts, ends):
            chunks[seq[s]].append([trial, s, e])
    return [np.asarray(c) for c in chunks]


def get_state_durations(latents, hmm, include_edges=True):
    """Frame count of every state run (reference arhmm_utils.py:71-100
    contract: per-state arrays of run lengths over the Viterbi paths)."""
    if hmm.K == 1:
        return []
    states = [np.asarray(hmm.most_likely_states(x)) for x in latents if len(x) > 0]
    return [runs[:, 2] - runs[:, 1] if len(runs) else np.array([])
            for runs in get_discrete_chunks(states, include_edges=include_edges)]


def get_latent_arrays_by_dtype(data_generator, sess_idxs=0, data_key='ae_latents'):
    """Collect per-dtype trial arrays from the data generator (reference :102-132)."""
    if isinstance(sess_idxs, int):
        sess_idxs = [sess_idxs]
    dtypes = ['train', 'val', 'test']
    latents = {key: [] for key in dtypes}
    trial_idxs = {key: [] for key in dtypes}
    for sess_idx in sess_idxs:
        dataset = data_generator.datasets[sess_idx]
        for data_type in dtypes:
            curr_idxs = dataset.batch_idxs[data_type]
            trial_idxs[data_type] += list(curr_idxs)
            latents[data_type] += [
                np.asarray(dataset[int(i_trial)][data_key]) for i_trial in curr_idxs]
    return latents, trial_idxs


def _resolve_arhmm_artifacts(hparams, version, sess_idx):
    """Locate a fitted ARHMM version and its input arrays on disk.

    Side effect (reference contract): fills ``hparams['session_dir']`` /
    ``hparams['expt_dir']``. Returns (hmm, trials_by_dtype, all_trial_arrays)
    where ``all_trial_arrays`` is the full per-trial list the dtype-indexed
    trial ids index into.
    """
    from behavenet_tpu.data.utils import get_transforms_paths
    from behavenet_tpu.fitting.experiment import (
        experiment_exists, get_best_model_version, get_expt_dir, get_session_dir)

    hparams['session_dir'], sess_ids = get_session_dir(
        hparams, session_source=hparams.get('all_source', 'save'))
    hparams['expt_dir'] = get_expt_dir(hparams)

    if version == 'best':
        version = get_best_model_version(hparams['expt_dir'], 'val_loss', best_def='min')[0]
    else:
        _, version = experiment_exists(hparams, which_version=True)

    with open(os.path.join(hparams['expt_dir'], 'version_%i' % version,
                           'best_val_model.pt'), 'rb') as f:
        hmm = pickle.load(f)

    # ARHMM inputs are either AE latents or (for *-labels classes) labels
    # served through the same pickle schema
    if 'labels' in hparams['model_class']:
        from behavenet_tpu.data.utils import load_labels_like_latents
        arrays = load_labels_like_latents(hparams, sess_ids, sess_idx)
    else:
        _, latents_file = get_transforms_paths(
            'ae_latents', hparams, sess_ids[sess_idx], check_splits=False)
        with open(latents_file, 'rb') as f:
            arrays = pickle.load(f)
    return hmm, arrays['trials'], arrays['latents']


def get_model_latents_states(hparams, version, sess_idx=0, return_samples=0,
                             cond_sampling=False, dtype='test', dtypes=('train', 'val', 'test'),
                             rng_seed=0):
    """Load an ARHMM + its latents and compute states/samples (reference
    arhmm_utils.py:134-251 contract).

    Returns dict with keys 'model', 'latents_dict', 'states_dict',
    'trial_idxs_dict', 'states_gen'/'latents_gen' (conditional samples
    follow the inferred state sequences; unconditional samples draw fresh
    ones — here via the in-repo ARHMM's jax sampler).
    """
    hmm, trials_by_dtype, all_arrays = _resolve_arhmm_artifacts(hparams, version, sess_idx)

    trial_idxs = {dt: np.asarray(trials_by_dtype[dt]) for dt in dtypes}
    latents = {dt: [all_arrays[i] for i in trial_idxs[dt]] for dt in dtypes}
    states = {dt: [np.asarray(hmm.most_likely_states(x)) for x in latents[dt]]
              for dt in dtypes}

    states_gen, latents_gen = [], []
    if return_samples > 0:
        import jax
        keys = jax.random.split(jax.random.PRNGKey(rng_seed), return_samples)
        if cond_sampling:
            # sample observations along the inferred state paths of ``dtype``
            pool = states[dtype]
            states_gen = [pool[i % len(pool)] for i in range(return_samples)]
            latents_gen = [hmm.sample_x(z, key=k) for z, k in zip(states_gen, keys)]
        else:
            T = len(states[dtype][0])
            for k in keys:
                z_smp, x_smp = hmm.sample(T, key=k)
                states_gen.append(z_smp)
                latents_gen.append(x_smp)

    return {
        'model': hmm,
        'latents_dict': latents,
        'states_dict': states,
        'trial_idxs_dict': trial_idxs,
        'states_gen': states_gen,
        'latents_gen': latents_gen,
    }


# ----------------------------------------
# movies
# ----------------------------------------

def make_syllable_movies_wrapper(hparams, save_file, sess_idx=0, dtype='test',
                                 max_frames=400, frame_rate=10, min_threshold=0, n_buffer=5,
                                 n_pre_frames=3, n_rows=None, single_syllable=None):
    """Load ARHMM + videos and produce per-syllable movie panels (reference :254-358)."""
    from behavenet_tpu.data.generator import ConcatSessionsGenerator
    from behavenet_tpu.data.utils import get_data_generator_inputs, get_transforms_paths
    from behavenet_tpu.fitting.experiment import (
        experiment_exists, get_expt_dir, get_session_dir)

    hparams['session_dir'], sess_ids = get_session_dir(
        hparams, session_source=hparams.get('all_source', 'save'))
    hparams['expt_dir'] = get_expt_dir(hparams)
    hparams['load_videos'] = True
    hparams, signals, transforms, paths = get_data_generator_inputs(hparams, sess_ids)
    data_generator = ConcatSessionsGenerator(
        hparams['data_dir'], [sess_ids[sess_idx]],
        signals_list=[signals[sess_idx]], transforms_list=[transforms[sess_idx]],
        paths_list=[paths[sess_idx]], batch_load=False,
        rng_seed=hparams['rng_seed_data'])
    ds = data_generator.datasets[0]
    # NHWC uint8 -> NCHW float [0, 1] per trial
    ims_orig = [np.transpose(ds[i]['images'], (0, 3, 1, 2)).astype('float32') / 255.0
                for i in range(ds.n_trials)]
    del data_generator

    _, version = experiment_exists(hparams, which_version=True)
    print('producing syllable videos for arhmm %s' % version)
    if hparams['model_class'].find('labels') > -1:
        from behavenet_tpu.data.utils import load_labels_like_latents
        latents = load_labels_like_latents(hparams, sess_ids, sess_idx)
    else:
        _, latents_file = get_transforms_paths('ae_latents', hparams, sess_ids[sess_idx])
        with open(latents_file, 'rb') as f:
            latents = pickle.load(f)
    trial_idxs = latents['trials'][dtype]
    model_file = os.path.join(hparams['expt_dir'], 'version_%i' % version, 'best_val_model.pt')
    with open(model_file, 'rb') as f:
        hmm = pickle.load(f)
    states = [np.asarray(hmm.most_likely_states(latents['latents'][s]))
              for s in latents['trials'][dtype]]
    if len(states) == 0:
        raise ValueError('No latents for dtype=%s' % dtype)

    state_indices = get_discrete_chunks(states, include_edges=True)
    K = len(state_indices)

    over_threshold_instances = [[] for _ in range(K)]
    for i_state in range(K):
        if state_indices[i_state].shape[0] > 0:
            state_lens = np.diff(state_indices[i_state][:, 1:3], axis=1)
            over_idxs = state_lens > min_threshold
            over_threshold_instances[i_state] = state_indices[i_state][over_idxs[:, 0]]
            np.random.shuffle(over_threshold_instances[i_state])

    return make_syllable_movies(
        ims_orig=ims_orig, state_list=over_threshold_instances, trial_idxs=trial_idxs,
        save_file=save_file, max_frames=max_frames, frame_rate=frame_rate,
        n_buffer=n_buffer, n_pre_frames=n_pre_frames, n_rows=n_rows,
        single_syllable=single_syllable)


def make_syllable_movies(ims_orig, state_list, trial_idxs, save_file=None, max_frames=400,
                         frame_rate=10, n_buffer=5, n_pre_frames=3, n_rows=None,
                         single_syllable=None):
    """Panel movie of example clips per discrete state (reference :360-511)."""
    import matplotlib
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    from behavenet_tpu.plotting import save_movie

    K = len(state_list)
    if single_syllable is not None:
        K = 1
        fig_width = 5
        n_rows = 1
    else:
        fig_width = 10
    bs, n_channels, y_dim, x_dim = ims_orig[0].shape
    movie_dim1 = n_channels * y_dim
    movie_dim2 = x_dim
    if n_rows is None:
        n_rows = int(np.floor(np.sqrt(K)))
    n_cols = int(np.ceil(K / n_rows))

    fig_dim_div = movie_dim2 * n_cols / fig_width
    fig_width = (movie_dim2 * n_cols) / fig_dim_div
    fig_height = (movie_dim1 * n_rows) / fig_dim_div
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(fig_width, fig_height), squeeze=False)

    for i, ax in enumerate(fig.axes):
        ax.set_yticks([])
        ax.set_xticks([])
        if i >= K:
            ax.set_axis_off()
        elif single_syllable is not None:
            ax.set_title('Syllable %i' % single_syllable, fontsize=16)
        else:
            ax.set_title('Syllable %i' % i, fontsize=16)
    fig.tight_layout(pad=0, h_pad=1.005)

    imshow_kwargs = {'animated': True, 'cmap': 'gray', 'vmin': 0, 'vmax': 1}
    ims = [[] for _ in range(max_frames + bs + 200)]

    for i_k, ax in enumerate(fig.axes):
        if i_k >= K:
            continue
        print('processing syllable %i/%i' % (i_k + 1, K))
        if len(state_list[i_k]) == 0:
            continue
        if single_syllable is not None:
            i_k = single_syllable

        i_chunk = 0
        i_frame = 0
        while i_frame < max_frames:
            if i_chunk >= len(state_list[i_k]):
                im = ax.imshow(np.zeros((movie_dim1, movie_dim2)), **imshow_kwargs)
                ims[i_frame].append(im)
                i_frame += 1
            else:
                chunk_idx = state_list[i_k][i_chunk, 0]
                which_trial = trial_idxs[chunk_idx]
                tr_beg = state_list[i_k][i_chunk, 1]
                tr_end = state_list[i_k][i_chunk, 2]
                batch = ims_orig[which_trial]
                movie_chunk = batch[max(tr_beg - n_pre_frames, 0):tr_end]
                movie_chunk = np.concatenate(
                    [movie_chunk[:, j] for j in range(movie_chunk.shape[1])], axis=1)

                for i in range(movie_chunk.shape[0]):
                    im = ax.imshow(movie_chunk[i], **imshow_kwargs)
                    ims[i_frame].append(im)
                    syllable_start = n_pre_frames if tr_beg >= n_pre_frames else tr_beg
                    if syllable_start <= i < (syllable_start + 2):
                        rect = matplotlib.patches.Rectangle(
                            (5, 5), 10, 10, linewidth=1, edgecolor='r', facecolor='r')
                        im = ax.add_patch(rect)
                        ims[i_frame].append(im)
                    i_frame += 1

                for _ in range(n_buffer):
                    im = ax.imshow(np.zeros((movie_dim1, movie_dim2)), **imshow_kwargs)
                    ims[i_frame].append(im)
                    i_frame += 1
                i_chunk += 1

    print('creating animation...', end='')
    ani = animation.ArtistAnimation(
        fig, [f for f in ims if f != []], interval=20, blit=True, repeat=False)
    print('done')

    if save_file is not None:
        if save_file[-4:] == '.mp4':
            save_file = save_file[:-4]
        if single_syllable is not None:
            save_file += '_syllable-%02i' % single_syllable
        save_file += '.mp4'
        save_movie(save_file, ani, frame_rate=frame_rate)
    return ani


def real_vs_sampled_wrapper(output_type, hparams, save_file, sess_idx, dtype='test',
                            conditional=True, max_frames=400, frame_rate=20, n_buffer=5,
                            xtick_locs=None, frame_rate_beh=None, format='png'):
    """AE reconstructions vs generative (conditionally) sampled reconstructions
    (reference :514-647). output_type: 'plot' | 'movie' | 'both'."""
    from behavenet_tpu.fitting.experiment import get_best_model_and_data
    from behavenet_tpu.fitting.eval import get_reconstruction
    from behavenet_tpu.models import AE

    # load ARHMM with latents/states and generate samples
    n_samples = 1
    model_output = get_model_latents_states(
        hparams, '', sess_idx=sess_idx, return_samples=n_samples,
        cond_sampling=conditional, dtype=dtype)
    hmm = model_output['model']
    latents = model_output['latents_dict'][dtype][0][:max_frames]
    states = model_output['states_dict'][dtype][0][:max_frames]
    latents_samp = np.asarray(model_output['latents_gen'][0])[:max_frames]
    states_samp = np.asarray(model_output['states_gen'][0])[:max_frames] \
        if not conditional else np.array([])

    fig = None
    if output_type in ('plot', 'both'):
        fig = plot_real_vs_sampled(
            latents, latents_samp, states, states_samp, save_file=save_file,
            xtick_locs=xtick_locs, frame_rate=frame_rate_beh, format=format)

    if output_type in ('movie', 'both'):
        # push latents through AE decoder
        hparams_ae = dict(
            hparams, model_class=hparams['ae_model_class'],
            model_type=hparams['ae_model_type'],
            experiment_name=hparams['ae_experiment_name'])
        model_ae, params_ae, _ = get_best_model_and_data(
            hparams_ae, AE, load_data=False,
            version=hparams.get('ae_version', 'best'))
        recon_real = get_reconstruction(model_ae, params_ae, latents)
        recon_samp = get_reconstruction(model_ae, params_ae, latents_samp)
        make_real_vs_sampled_movies(
            np.transpose(recon_real, (0, 3, 1, 2))[:, 0],
            np.transpose(recon_samp, (0, 3, 1, 2))[:, 0],
            conditional=conditional, save_file=save_file, frame_rate=frame_rate)

    return fig


def make_real_vs_sampled_movies(ims_recon, ims_recon_samp, conditional, save_file=None,
                                frame_rate=15):
    """Two-panel real vs generative reconstruction movie (reference :649-701)."""
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    from behavenet_tpu.plotting import save_movie

    n_frames = ims_recon.shape[0]
    n_plots = 2
    y_pix, x_pix = ims_recon[0].shape
    fig_dim_div = x_pix * n_plots / 10
    x_dim = x_pix * n_plots / fig_dim_div
    y_dim = y_pix / fig_dim_div
    fig, axes = plt.subplots(1, n_plots, figsize=(x_dim, y_dim))
    for j in range(2):
        axes[j].set_xticks([])
        axes[j].set_yticks([])
    axes[0].set_title('Real Reconstructions\n', fontsize=16)
    title_str = 'Generative Reconstructions\n(%s)' % (
        'Conditional' if conditional else 'Unconditional')
    axes[1].set_title(title_str, fontsize=16)
    fig.tight_layout(pad=0)

    im_kwargs = {'cmap': 'gray', 'vmin': 0, 'vmax': 1, 'animated': True}
    ims = []
    for i in range(n_frames):
        ims.append([
            axes[0].imshow(ims_recon[i], **im_kwargs),
            axes[1].imshow(ims_recon_samp[i], **im_kwargs)])
    ani = animation.ArtistAnimation(fig, ims, blit=True, repeat_delay=1000)
    save_movie(save_file, ani, frame_rate=frame_rate)
    return ani


# ----------------------------------------
# static plots
# ----------------------------------------

def plot_real_vs_sampled(latents, latents_samp, states, states_samp, save_file=None,
                         xtick_locs=None, frame_rate=None, format='png'):
    """Real + sampled latents overlaid on state maps (reference :703-760)."""
    import matplotlib.pyplot as plt

    from behavenet_tpu import make_dir_if_not_exists

    fig, axes = plt.subplots(2, 1, figsize=(10, 8))
    axes[0] = plot_states_overlaid_with_latents(
        latents, states, ax=axes[0], xtick_locs=xtick_locs, frame_rate=frame_rate)
    axes[0].set_xticks([])
    axes[0].set_xlabel('')
    axes[0].set_title('Inferred latents')

    if len(states_samp) == 0:
        plot_states = states
        title_str = 'Sampled latents'
    else:
        plot_states = states_samp
        title_str = 'Sampled states and latents'
    axes[1] = plot_states_overlaid_with_latents(
        latents_samp, plot_states, ax=axes[1], xtick_locs=xtick_locs, frame_rate=frame_rate)
    axes[1].set_title(title_str)

    if save_file is not None:
        make_dir_if_not_exists(save_file)
        plt.savefig(save_file + '.' + format, dpi=300, format=format)
    return fig


def plot_states_overlaid_with_latents(latents, states, save_file=None, ax=None,
                                      xtick_locs=None, frame_rate=None, cmap='tab20b',
                                      format='png'):
    """Latent traces over a discrete-state background image (reference :763-828)."""
    import matplotlib.pyplot as plt

    from behavenet_tpu import make_dir_if_not_exists

    if ax is None:
        fig = plt.figure(figsize=(8, 4))
        ax = fig.gca()
    else:
        fig = None
    latents = np.asarray(latents)
    states = np.asarray(states)
    spc = 1.1 * abs(latents.max())
    n_latents = latents.shape[1]
    plotting_latents = latents + spc * np.arange(n_latents)
    ymin = min(-spc, np.min(plotting_latents))
    ymax = max(spc * n_latents, np.max(plotting_latents))
    ax.imshow(states[None, :], aspect='auto', extent=(0, len(latents), ymin, ymax),
              cmap=cmap, alpha=1.0)
    ax.plot(plotting_latents, '-k', lw=3)
    ax.set_ylim([ymin, ymax])
    ax.set_yticks([])
    ax.set_xlabel('Time (bins)')
    if xtick_locs is not None:
        ax.set_xticks(xtick_locs)
        if frame_rate is not None:
            ax.set_xticklabels((np.asarray(xtick_locs) / frame_rate).astype('int'))
            ax.set_xlabel('Time (sec)')
    if save_file is not None:
        make_dir_if_not_exists(save_file)
        plt.savefig(save_file + '.' + format, dpi=300, format=format)
    return ax if fig is None else fig


def plot_state_transition_matrix(model, deridge=False):
    """Markov transition matrix heat map (reference :831-861)."""
    import matplotlib.pyplot as plt

    trans = np.copy(model.transition_matrix)
    if deridge:
        for i in range(trans.shape[0]):
            trans[i, i] = np.nan
        clim = np.nanmax(np.abs(trans))
    else:
        clim = 1
    fig = plt.figure()
    plt.imshow(trans, clim=[-clim, clim], cmap='RdBu_r')
    plt.colorbar()
    plt.ylabel('State (t)')
    plt.xlabel('State (t+1)')
    plt.title('State transition matrix')
    return fig


def plot_dynamics_matrices(model, deridge=False):
    """Per-state AR dynamics matrices (reference :864-927)."""
    import matplotlib.pyplot as plt

    K = model.K
    D = model.D
    n_lags = model.lags
    if n_lags == 1:
        n_cols, fac = 3, 1
    elif n_lags == 2:
        n_cols, fac = 3, 1 / n_lags
    elif n_lags == 3:
        n_cols, fac = 3, 1.25 / n_lags
    elif n_lags == 4:
        n_cols, fac = 3, 1.50 / n_lags
    elif n_lags == 5:
        n_cols, fac = 2, 1.75 / n_lags
    else:
        n_cols, fac = 1, 1
    n_rows = int(np.ceil(K / n_cols))
    fig = plt.figure(figsize=(4 * n_cols, 4 * n_rows * fac))

    mats = np.copy(model.As)
    if deridge:
        for k in range(K):
            for d in range(D):
                mats[k, d, d] = np.nan
        clim = np.nanmax(np.abs(mats))
    else:
        clim = np.max(np.abs(mats))

    for k in range(K):
        plt.subplot(n_rows, n_cols, k + 1)
        im = plt.imshow(mats[k], cmap='RdBu_r', clim=[-clim, clim])
        for lag in range(n_lags - 1):
            plt.axvline((lag + 1) * D - 0.5, ymin=0, ymax=K, color=[0, 0, 0])
        plt.xticks([])
        plt.yticks([])
        plt.title('State %i' % k)
    plt.tight_layout()
    fig.subplots_adjust(right=0.8)
    cbar_ax = fig.add_axes([0.85, 0.4, 0.03, 0.2])
    fig.colorbar(im, cax=cbar_ax)
    return fig


def plot_obs_biases(model):
    """Per-state observation bias vectors (reference :930-954)."""
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 4))
    mats = np.copy(model.bs.T)
    clim = np.max(np.abs(mats))
    plt.imshow(mats, cmap='RdBu_r', clim=[-clim, clim], aspect='auto')
    plt.xlabel('State')
    plt.yticks([])
    plt.ylabel('Observation dimension')
    plt.tight_layout()
    plt.colorbar()
    plt.title('State biases')
    return fig


def plot_obs_covariance_matrices(model):
    """Per-state observation covariance matrices (reference :957-990)."""
    import matplotlib.pyplot as plt

    K = model.K
    n_cols = int(np.sqrt(K))
    n_rows = int(np.ceil(K / n_cols))
    fig = plt.figure(figsize=(3 * n_cols, 3 * n_rows))
    mats = np.copy(model.Sigmas)
    clim = np.quantile(np.abs(mats), 0.95)
    for k in range(K):
        plt.subplot(n_rows, n_cols, k + 1)
        im = plt.imshow(mats[k], cmap='RdBu_r', clim=[-clim, clim])
        plt.xticks([])
        plt.yticks([])
        plt.title('State %i' % k)
    plt.tight_layout()
    fig.subplots_adjust(right=0.8)
    cbar_ax = fig.add_axes([0.85, 0.4, 0.03, 0.2])
    fig.colorbar(im, cax=cbar_ax)
    return fig
