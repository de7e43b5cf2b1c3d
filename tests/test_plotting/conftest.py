"""Session-scoped experiment-store fixture for the plotting/movie layer.

Builds a tiny structured dataset (two sessions of a bouncing-dot video with
linearly-related 'neural' activity), then fits one model of every class the
plotting layer consumes — AE, ARHMM, neural-AE decoder, PS-VAE, MSPS-VAE —
through the real CLIs into a real experiment store. The wrapper tests then
drive every public plotting/movie function headlessly against that store
(reference test gap: SURVEY §4 "all plotting untested").
"""

import json
import os
from importlib import import_module

import h5py
import numpy as np
import pytest

LAB, EXPT, ANIMAL = 'plab', 'pexpt', 'panimal'
SESSIONS = ['sess-00', 'sess-01']
Y_PIX = X_PIX = 32
TRIAL_LEN = 40
N_TRIALS = 22
N_NEURONS = 10
N_LATENTS = 5
N_LABELS = 2
N_STATES = 2
MSPS_LATENTS = 6
N_BACKGROUND = 2

AE_EXPT, ARHMM_EXPT, DEC_EXPT, PSVAE_EXPT, MSPS_EXPT = (
    'ae-px', 'arhmm-px', 'dec-px', 'psvae-px', 'msps-px')

AE_ARCH = {
    'ae_network_type': 'strides_only', 'ae_padding_type': 'same',
    'ae_batch_norm': 0, 'ae_batch_norm_momentum': None, 'symmetric_arch': 1,
    'ae_encoding_n_channels': [8, 16],
    'ae_encoding_kernel_size': [5, 5],
    'ae_encoding_stride_size': [2, 2],
    'ae_encoding_layer_type': ['conv', 'conv'],
    'ae_decoding_last_FF_layer': 0,
}


def _simulate_session(data_dir, session, seed):
    """Bouncing-dot video + linear neural readout (structured, learnable)."""
    rng = np.random.RandomState(seed)
    path = os.path.join(data_dir, LAB, EXPT, ANIMAL, session, 'data.hdf5')
    os.makedirs(os.path.dirname(path), exist_ok=True)
    yy, xx = np.mgrid[:Y_PIX, :X_PIX]
    W = rng.randn(2, N_NEURONS) * 0.8
    with h5py.File(path, 'w', libver='latest') as f:
        f.swmr_mode = True
        g_i = f.create_group('images')
        g_n = f.create_group('neural')
        g_l = f.create_group('labels')
        g_r = f.create_group('regions').create_group('indxs')
        g_r.create_dataset('region-0', data=np.arange(N_NEURONS // 2))
        g_r.create_dataset('region-1', data=np.arange(N_NEURONS // 2, N_NEURONS))
        for i in range(N_TRIALS):
            x = np.zeros((TRIAL_LEN, 2))
            for t in range(1, TRIAL_LEN):
                x[t] = 0.92 * x[t - 1] + 0.3 * rng.randn(2)
            pos = np.clip((x * 4 + Y_PIX // 2).astype(int), 3, Y_PIX - 4)
            frames = np.zeros((TRIAL_LEN, 1, Y_PIX, X_PIX), dtype=np.uint8)
            for t in range(TRIAL_LEN):
                blob = np.exp(-((yy - pos[t, 0]) ** 2 + (xx - pos[t, 1]) ** 2) / 10.0)
                frames[t, 0] = (blob * 255).astype(np.uint8)
            g_i.create_dataset('trial_%04i' % i, data=frames, dtype='uint8')
            g_n.create_dataset('trial_%04i' % i,
                               data=(x @ W + 0.3 * rng.randn(TRIAL_LEN, N_NEURONS))
                               .astype('float32'))
            g_l.create_dataset('trial_%04i' % i, data=x.astype('float32'))
    return path


def _write(cfg_dir, name, cfg):
    os.makedirs(cfg_dir, exist_ok=True)
    path = os.path.join(cfg_dir, name)
    with open(path, 'w') as f:
        json.dump(cfg, f, indent=2)
    return path


def _run_cli(module_name, configs):
    from behavenet_tpu.fitting.hyperparams import get_all_params, run_grid_search
    mod = import_module('behavenet_tpu.fitting.%s' % module_name)
    args = []
    for key, path in configs.items():
        args += ['--%s' % key, path]
    hp = get_all_params('grid_search', args=args)
    run_grid_search(mod.main, hp)


def _base_data_cfg(data_dir, save_dir, session=SESSIONS[0], **extra):
    cfg = {
        'lab': LAB, 'expt': EXPT, 'animal': ANIMAL, 'session': session,
        'sessions_csv': '', 'all_source': 'data',
        'n_input_channels': 1, 'y_pixels': Y_PIX, 'x_pixels': X_PIX,
        'use_output_mask': False, 'use_label_mask': False,
        'neural_bin_size': 25, 'neural_type': 'ca', 'neural_thresh': 1.0,
        'subsample_idxs_group_0': None, 'subsample_idxs_group_1': None,
        'subsample_idxs_dataset': None, 'subsample_method': 'none',
        'approx_batch_size': 200, 'n_labels': N_LABELS,
        'data_dir': data_dir, 'save_dir': save_dir,
    }
    cfg.update(extra)
    return cfg


def _training_cfg(**extra):
    cfg = {
        'export_train_plots': False, 'export_latents': True,
        'pretrained_weights_path': None, 'val_check_interval': 1,
        'learning_rate': 1e-3, 'max_n_epochs': 2, 'min_n_epochs': 1,
        'enable_early_stop': False, 'early_stop_history': 10,
        'rng_seed_train': 0, 'as_numpy': True, 'batch_load': True,
        'rng_seed_data': 0, 'train_frac': 1.0, 'trial_splits': '8;1;1;0',
    }
    cfg.update(extra)
    return cfg


def _ae_model_cfg(arch_path, **extra):
    cfg = {
        'experiment_name': AE_EXPT, 'model_class': 'ae', 'model_type': 'conv',
        'n_ae_latents': N_LATENTS, 'l2_reg': 0.0, 'rng_seed_model': 0,
        'fit_sess_io_layers': False, 'ae_arch_json': arch_path,
        'conditional_encoder': False, 'msp.alpha': None,
        'vae.beta': 1, 'vae.beta_anneal_epochs': 100,
        'beta_tcvae.beta': 1, 'beta_tcvae.beta_anneal_epochs': 100,
        'ps_vae.alpha': 100, 'ps_vae.beta': 1, 'ps_vae.delta': 1,
        'ps_vae.anneal_epochs': 10, 'n_background': N_BACKGROUND,
        'n_sessions_per_batch': 1, 'mem_limit_gb': 8.0,
    }
    cfg.update(extra)
    return cfg


@pytest.fixture(scope='session')
def store(tmp_path_factory):
    """Fit ae / arhmm / decoder / ps-vae / msps-vae into one experiment store."""
    root = tmp_path_factory.mktemp('plot_store')
    data_dir = str(root / 'data')
    save_dir = str(root / 'save')
    cfg_dir = str(root / 'cfg')
    os.makedirs(save_dir, exist_ok=True)
    for i, sess in enumerate(SESSIONS):
        _simulate_session(data_dir, sess, seed=i)

    # dataset params dotfile (get_lab_example resolves it for analysis fns)
    params_dir = str(root / 'dotbehavenet')
    os.environ['BEHAVENET_DIR'] = params_dir
    _write(params_dir, '%s_%s_params.json' % (LAB, EXPT),
           {k: v for k, v in _base_data_cfg(data_dir, save_dir).items()
            if k not in ('data_dir', 'save_dir')})

    arch_path = _write(cfg_dir, 'arch.json', AE_ARCH)
    data_cfg = _write(cfg_dir, 'data.json', _base_data_cfg(data_dir, save_dir))
    compute_cfg = _write(cfg_dir, 'compute.json', {'device': 'cpu'})

    # 1. conv AE (+ latent export)
    _run_cli('ae_grid_search', {
        'data_config': data_cfg,
        'model_config': _write(cfg_dir, 'ae_model.json', _ae_model_cfg(arch_path)),
        'training_config': _write(cfg_dir, 'ae_training.json', _training_cfg()),
        'compute_config': compute_cfg})

    # 2. ARHMM on the AE latents (+ state export)
    _run_cli('arhmm_grid_search', {
        'data_config': data_cfg,
        'model_config': _write(cfg_dir, 'arhmm_model.json', {
            'experiment_name': ARHMM_EXPT, 'n_arhmm_states': N_STATES,
            'rng_seed_model': 0, 'n_arhmm_lags': 1, 'kappa': 0,
            'noise_type': 'gaussian', 'transitions': 'stationary',
            'ae_experiment_name': AE_EXPT, 'ae_version': 'best',
            'ae_model_class': 'ae', 'ae_model_type': 'conv',
            'n_ae_latents': N_LATENTS, 'model_class': 'arhmm',
            'model_type': None}),
        'training_config': _write(cfg_dir, 'arhmm_training.json', {
            'export_train_plots': False, 'export_states': True, 'n_iters': 3,
            'rng_seed_train': 0, 'arhmm_es_tol': 0, 'as_numpy': True,
            'batch_load': False, 'rng_seed_data': 0, 'train_frac': 1.0,
            'trial_splits': '8;1;1;0'}),
        'compute_config': compute_cfg})

    # 3. neural -> AE-latents decoder (+ prediction export)
    _run_cli('decoder_grid_search', {
        'data_config': data_cfg,
        'model_config': _write(cfg_dir, 'dec_model.json', {
            'experiment_name': DEC_EXPT, 'model_class': 'neural-ae',
            'n_lags': 2, 'n_max_lags': 4, 'l2_reg': 1e-4, 'rng_seed_model': 0,
            'ae_experiment_name': AE_EXPT, 'ae_version': 'best',
            'ae_model_class': 'ae', 'ae_model_type': 'conv',
            'n_ae_latents': N_LATENTS, 'ae_multisession': None,
            'model_type': 'mlp', 'n_hid_layers': 1, 'n_hid_units': 16,
            'activation': 'relu'}),
        'training_config': _write(cfg_dir, 'dec_training.json', _training_cfg(
            export_latents=False, export_predictions=True)),
        'compute_config': compute_cfg})

    # 4. PS-VAE (+ latent export)
    _run_cli('ae_grid_search', {
        'data_config': data_cfg,
        'model_config': _write(cfg_dir, 'psvae_model.json', _ae_model_cfg(
            arch_path, experiment_name=PSVAE_EXPT, model_class='ps-vae')),
        'training_config': _write(cfg_dir, 'psvae_training.json', _training_cfg()),
        'compute_config': compute_cfg})

    # 5. MSPS-VAE across both sessions (+ latent export)
    _run_cli('ae_grid_search', {
        'data_config': _write(cfg_dir, 'msps_data.json', _base_data_cfg(
            data_dir, save_dir, session='all')),
        'model_config': _write(cfg_dir, 'msps_model.json', _ae_model_cfg(
            arch_path, experiment_name=MSPS_EXPT, model_class='msps-vae',
            n_ae_latents=MSPS_LATENTS, n_sessions_per_batch=2,
            **{'ps_vae.delta': 10})),
        'training_config': _write(cfg_dir, 'msps_training.json', _training_cfg()),
        'compute_config': compute_cfg})

    def hparams_for(model_class):
        """Analysis-side hparams dict for loading from the store.

        Carries the training identity keys (as a user's analysis hparams
        would — reference notebooks copy them from the fit configs) so
        version resolution via ``experiment_exists`` works.
        """
        hp = _base_data_cfg(data_dir, save_dir)
        hp.update({
            'model_class': model_class, 'model_type': 'conv',
            'n_ae_latents': N_LATENTS, 'experiment_name': AE_EXPT,
            'rng_seed_data': 0, 'trial_splits': '8;1;1;0', 'train_frac': 1.0,
            'rng_seed_model': 0, 'fit_sess_io_layers': False,
            'learning_rate': 1e-3, 'l2_reg': 0.0,
            'as_numpy': True, 'batch_load': True,
        })
        if model_class == 'ae':
            pass
        elif model_class == 'arhmm':
            hp.update({
                'experiment_name': ARHMM_EXPT, 'model_type': None,
                'n_arhmm_states': N_STATES, 'n_arhmm_lags': 1, 'kappa': 0,
                'noise_type': 'gaussian', 'transitions': 'stationary',
                'ae_experiment_name': AE_EXPT, 'ae_version': 'best',
                'ae_model_class': 'ae', 'ae_model_type': 'conv'})
        elif model_class == 'neural-ae':
            hp.update({
                'experiment_name': DEC_EXPT, 'model_type': 'mlp',
                'n_lags': 2, 'n_max_lags': 4, 'l2_reg': 1e-4,
                'ae_experiment_name': AE_EXPT, 'ae_version': 'best',
                'ae_model_class': 'ae', 'ae_model_type': 'conv',
                'ae_multisession': None,
                'n_hid_layers': 1, 'n_hid_units': 16, 'activation': 'relu',
                'region': 'all', 'subsample_method': 'none'})
        elif model_class == 'ps-vae':
            hp.update({
                'experiment_name': PSVAE_EXPT,
                'ps_vae.alpha': 100, 'ps_vae.beta': 1,
                'ps_vae.anneal_epochs': 10, 'rng_seed_model': 0})
        elif model_class == 'msps-vae':
            hp.update({
                'experiment_name': MSPS_EXPT, 'session': 'all',
                'n_ae_latents': MSPS_LATENTS, 'n_background': N_BACKGROUND,
                'n_sessions_per_batch': 2,
                'ps_vae.alpha': 100, 'ps_vae.beta': 1, 'ps_vae.delta': 10,
                'ps_vae.anneal_epochs': 10, 'rng_seed_model': 0})
        return hp

    return {
        'data_dir': data_dir, 'save_dir': save_dir,
        'hparams_for': hparams_for,
    }
