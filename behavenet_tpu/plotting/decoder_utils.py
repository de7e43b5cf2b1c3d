"""Decoder analysis: R^2 collection, neural reconstruction movies and traces.

Behavioral contract follows the reference (behavenet/plotting/decoder_utils.py).
"""

import os
import pickle

import numpy as np
import pandas as pd

from behavenet_tpu.data.utils import get_region_list
from behavenet_tpu.fitting.experiment import get_expt_dir, get_session_dir, get_subdirs
from behavenet_tpu.plotting import concat, save_movie

__all__ = [
    'get_r2s_by_trial', 'get_best_models', 'get_r2s_across_trials',
    'make_neural_reconstruction_movie_wrapper', 'make_neural_reconstruction_movie',
    'plot_neural_reconstruction_traces_wrapper', 'plot_neural_reconstruction_traces']


def _get_dataset_str(hparams):
    return os.path.join(hparams['expt'], hparams['animal'], hparams['session'])


def _load_version_metrics(expt_dir, version_name):
    """metrics.csv rows + scalar meta tags for one version dir, or None."""
    vdir = os.path.join(expt_dir, version_name)
    csv_path = os.path.join(vdir, 'metrics.csv')
    if not os.path.isfile(csv_path):
        return None
    df = pd.read_csv(csv_path)
    with open(os.path.join(vdir, 'meta_tags.pkl'), 'rb') as f:
        meta = pickle.load(f)
    for key, val in meta.items():
        if isinstance(val, (str, int, float)):
            df[key] = val
    return df


def get_r2s_by_trial(hparams, model_types):
    """Load validation metrics from all decoders of a session.

    (reference decoder_utils.py:32-100 contract: one metrics.csv worth of
    rows per trained version across every region x model_type experiment,
    tagged with dataset/region/model_type columns, scalar meta tags as
    columns, and a 'version' column made globally unique by giving each
    region x model_type group its own 10000-aligned block — parsed back
    with `% 10000` by get_r2s_across_trials.)
    """
    dataset = _get_dataset_str(hparams)
    groups = [(region, mt) for region in get_region_list(hparams)
              for mt in model_types]

    frames = []
    for group_idx, (region, model_type) in enumerate(groups):
        hp = dict(hparams, region=region)
        hp['session_dir'], _ = get_session_dir(
            hp, session_source=hp.get('all_source', 'save'))
        expt_dir = get_expt_dir(
            hp, model_type=model_type, model_class=hp['model_class'],
            expt_name=hp['experiment_name'])
        try:
            versions = get_subdirs(expt_dir)
        except Exception:
            print('No models in %s; skipping' % expt_dir)
            continue
        for version_name in versions:
            df = _load_version_metrics(expt_dir, version_name)
            if df is None:
                continue
            df['version'] = 'version_%i%s' % (
                10000 * group_idx, version_name.split('version_')[-1])
            df['region'] = region
            df['dataset'] = dataset
            df['model_type'] = model_type
            frames.append(df)
    return pd.concat(frames, sort=False)


def get_best_models(metrics_df):
    """Best decoder per (dataset, region, n_lags, n_hid_layers) cell (reference :102-152)."""
    data_queried = metrics_df[pd.notna(metrics_df.test_loss)]
    best_models_list = []
    loss_mins = metrics_df.groupby(
        ['dataset', 'n_lags', 'n_hid_layers', 'learning_rate', 'l2_reg', 'version',
         'region']).min().reset_index()
    for dataset in sorted(metrics_df.dataset.unique()):
        for region in sorted(metrics_df.region.unique()):
            for lag in sorted(metrics_df.n_lags.unique()):
                for layer in sorted(metrics_df.n_hid_layers.unique()):
                    single_hp = loss_mins[
                        (loss_mins.n_lags == lag)
                        & (loss_mins.n_hid_layers == layer)
                        & (loss_mins.region == region)
                        & (loss_mins.dataset == dataset)]
                    if not len(single_hp):
                        continue
                    best_version = loss_mins.iloc[single_hp.val_loss.idxmin()].version
                    best_models_list.append(
                        data_queried[data_queried.version == best_version])
    return pd.concat(best_models_list)


def get_r2s_across_trials(hparams, best_models_df):
    """R^2 computed across all test trials for each best model (reference :154-192)."""
    from behavenet_tpu.fitting.eval import get_test_metric

    dataset = _get_dataset_str(hparams)
    all_test_r2s = []
    for version in best_models_df.version.unique():
        # version may be an int or a 'version_%i' string
        model_version = str(int(str(version).split('_')[-1]) % 10000)
        hparams['model_type'] = best_models_df[
            best_models_df.version == version].model_type.unique()[0]
        hparams['region'] = best_models_df[
            best_models_df.version == version].region.unique()[0]
        hparams_, r2, _, _ = get_test_metric(hparams, model_version)
        all_test_r2s.append(pd.DataFrame({
            'dataset': dataset,
            'region': hparams['region'],
            'n_hid_layers': hparams_['n_hid_layers'],
            'n_lags': hparams_['n_lags'],
            'model_type': hparams['model_type'],
            'r2': r2}, index=[0]))
    return pd.concat(all_test_r2s)


def make_neural_reconstruction_movie_wrapper(
        hparams, save_file, trials=None, sess_idx=0, max_frames=400, max_latents=8,
        zscore_by_dim=False, colored_predictions=False, xtick_locs=None, frame_rate=15,
        add_traces=True):
    """Original vs AE-recon vs neural-decoded recon movie (reference :195-337).

    Loads the AE and the neural->latent decoder, pushes decoder predictions
    through the AE decoder, and animates the three image streams (plus
    latent traces if requested).
    """
    import jax

    from behavenet_tpu.fitting.experiment import get_best_model_and_data
    from behavenet_tpu.models import AE, Decoder

    # load AE
    hparams_ae = dict(
        hparams, model_class=hparams['ae_model_class'],
        model_type=hparams['ae_model_type'],
        experiment_name=hparams['ae_experiment_name'])
    model_ae, params_ae, data_gen_ae = get_best_model_and_data(
        hparams_ae, AE, version=hparams.get('ae_version', 'best'))

    # load decoder
    hparams_dec = dict(
        hparams, model_class=hparams.get('decoder_model_class', 'neural-ae'),
        model_type=hparams.get('decoder_model_type', 'mlp'),
        experiment_name=hparams['decoder_experiment_name'])
    model_dec, params_dec, data_gen_dec = get_best_model_and_data(
        hparams_dec, Decoder, version=hparams.get('decoder_version', 'best'))

    if trials is None:
        trials = [int(data_gen_dec.datasets[sess_idx].batch_idxs['test'][0])]

    ims_orig_all, ims_ae_all, ims_dec_all, lat_ae_all, lat_dec_all = [], [], [], [], []
    for trial in trials:
        batch_dec = data_gen_dec.datasets[sess_idx][int(trial)]
        batch_ae = data_gen_ae.datasets[sess_idx][int(trial)]
        ims_orig = batch_ae['images'][:max_frames].astype('float32') / 255.0  # NHWC
        neural = batch_dec['neural'][:max_frames]

        # AE reconstruction
        import jax.numpy as jnp
        x = jnp.asarray(ims_orig)
        recon_ae, lat_ae = model_ae.forward(params_ae, x)
        # neural decoding -> latents -> images
        lat_dec, _ = model_dec.forward(params_dec, jnp.asarray(neural))
        recon_dec = model_ae.decoding.apply(params_ae['decoder'], lat_dec, None)

        ims_orig_all.append(np.transpose(ims_orig, (0, 3, 1, 2)))
        ims_ae_all.append(np.transpose(np.asarray(recon_ae), (0, 3, 1, 2)))
        ims_dec_all.append(np.transpose(np.asarray(recon_dec), (0, 3, 1, 2)))
        lat_ae_all.append(np.asarray(lat_ae))
        lat_dec_all.append(np.asarray(lat_dec))

    ims_orig = np.concatenate(ims_orig_all)
    ims_ae = np.concatenate(ims_ae_all)
    ims_dec = np.concatenate(ims_dec_all)
    latents_ae = np.concatenate(lat_ae_all)[:, :max_latents]
    latents_dec = np.concatenate(lat_dec_all)[:, :max_latents]
    if zscore_by_dim:
        latents_ae = (latents_ae - latents_ae.mean(0)) / (latents_ae.std(0) + 1e-8)
        latents_dec = (latents_dec - latents_dec.mean(0)) / (latents_dec.std(0) + 1e-8)

    return make_neural_reconstruction_movie(
        ims_orig=ims_orig, ims_recon_ae=ims_ae, ims_recon_neural=ims_dec,
        latents_ae=latents_ae if add_traces else None,
        latents_neural=latents_dec if add_traces else None,
        save_file=save_file, frame_rate=frame_rate)


def make_neural_reconstruction_movie(ims_orig, ims_recon_ae, ims_recon_neural,
                                     latents_ae=None, latents_neural=None, save_file=None,
                                     frame_rate=15, dpi=100):
    """Three-panel movie: original / AE recon / neural recon (+ traces) (reference :340-535)."""
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt
    from matplotlib.gridspec import GridSpec

    n_frames, n_channels, y_pix, x_pix = ims_orig.shape
    with_traces = latents_ae is not None and latents_neural is not None

    n_cols = 3
    n_rows = 2 if with_traces else 1
    fig = plt.figure(figsize=(n_cols * 3, n_rows * 3 * y_pix / x_pix + 1), dpi=dpi)
    gs = GridSpec(n_rows, n_cols, figure=fig)
    axs = [fig.add_subplot(gs[0, j]) for j in range(3)]
    titles = ['Original', 'AE reconstruction', 'Neural reconstruction']
    for ax, title in zip(axs, titles):
        ax.set_xticks([])
        ax.set_yticks([])
        ax.set_title(title, fontsize=10)
    if with_traces:
        ax_tr = fig.add_subplot(gs[1, :])
        ax_tr.set_xlabel('frame')
        ax_tr.set_ylabel('latents')
        n_latents = latents_ae.shape[1]
        spacing = 4
        for d in range(n_latents):
            ax_tr.plot(latents_ae[:, d] + spacing * d, 'k', lw=0.5)
            ax_tr.plot(latents_neural[:, d] + spacing * d, 'b', lw=0.5, alpha=0.7)

    kwargs = {'animated': True, 'cmap': 'gray', 'vmin': 0, 'vmax': 1}
    ims_ani = []
    for i in range(n_frames):
        frame_artists = []
        for ax, stack in zip(axs, [ims_orig, ims_recon_ae, ims_recon_neural]):
            im = stack[i, 0] if n_channels == 1 else concat(stack[i])
            frame_artists.append(ax.imshow(im, **kwargs))
        if with_traces:
            ln = ax_tr.axvline(i, color='r', lw=1, animated=True)
            frame_artists.append(ln)
        ims_ani.append(frame_artists)

    plt.tight_layout(pad=0.5)
    ani = animation.ArtistAnimation(fig, ims_ani, blit=True, repeat_delay=1000)
    save_movie(save_file, ani, frame_rate=frame_rate)
    return ani


def plot_neural_reconstruction_traces_wrapper(hparams, save_file=None, trial=None,
                                              xtick_locs=None, frame_rate=None, format='png',
                                              **kwargs):
    """Load AE latents + decoder predictions and plot traces (reference :538-614)."""
    # load from export pickles recorded in decoder meta
    with open(hparams['ae_model_latents_file'], 'rb') as f:
        latents_dict = pickle.load(f)
    with open(hparams['decoder_predictions_file'], 'rb') as f:
        pred_dict = pickle.load(f)
    if trial is None:
        trial = int(latents_dict['trials']['test'][0])
    traces_ae = latents_dict['latents'][trial]
    traces_neural = pred_dict['predictions'][trial]
    return plot_neural_reconstruction_traces(
        traces_ae, traces_neural, save_file=save_file, xtick_locs=xtick_locs,
        frame_rate=frame_rate, format=format, **kwargs)


def plot_neural_reconstruction_traces(traces_ae, traces_neural, save_file=None,
                                      xtick_locs=None, frame_rate=None, format='png',
                                      scale=0.5, max_traces=8, add_r2=True, add_legend=True,
                                      colored_predictions=True):
    """Overlay AE latents with neural-decoded latents (reference :617-728)."""
    import matplotlib.pyplot as plt
    import seaborn as sns

    sns.set_style('white')

    traces_ae = np.asarray(traces_ae)
    traces_neural = np.asarray(traces_neural)
    n_traces = min(max_traces, traces_ae.shape[1])

    # scale for visual separation
    means = np.nanmean(traces_ae, axis=0)
    stds = np.nanstd(traces_ae, axis=0) / scale
    traces_ae_sc = (traces_ae - means) / (stds + 1e-8)
    traces_neural_sc = (traces_neural - means) / (stds + 1e-8)

    fig = plt.figure(figsize=(12, 8))
    for d in range(n_traces):
        if colored_predictions:
            plt.plot(traces_neural_sc[:, d] + d * 2, lw=1)
        else:
            plt.plot(traces_neural_sc[:, d] + d * 2, 'b', lw=1)
        plt.plot(traces_ae_sc[:, d] + d * 2, 'k', lw=0.5)
    if add_r2:
        from sklearn.metrics import r2_score
        good = ~np.any(np.isnan(traces_neural), axis=1)
        if good.sum() > 1:
            r2 = r2_score(traces_ae[good], traces_neural[good],
                          multioutput='variance_weighted')
            plt.title('$R^2$ = %.3f' % r2)
    if add_legend:
        import matplotlib.lines as mlines
        h1 = mlines.Line2D([], [], color='k', label='AE latents')
        h2 = mlines.Line2D([], [], color='b', label='neural predictions')
        plt.legend(handles=[h1, h2])
    if xtick_locs is not None and frame_rate is not None:
        plt.xticks(xtick_locs, np.asarray(xtick_locs) / frame_rate)
        plt.xlabel('time (s)')
    else:
        plt.xlabel('frame')
    plt.yticks([])
    sns.despine()
    if save_file is not None:
        from behavenet_tpu import make_dir_if_not_exists
        make_dir_if_not_exists(save_file)
        plt.savefig(save_file + '.' + format, dpi=300)
    return fig
