"""Integration test: synthetic HDF5 -> every CLI -> experiment-store checks.

Modeled on the reference tests/integration.py (:46-61 lists the 14 model
configs): builds 2 synthetic sessions, launches the real grid-search CLIs
via subprocess with rewritten config JSONs, and asserts success as
``experiment_exists(...) == True``.

Run manually from the repo root:

    python tests/integration.py            # CPU (fast)
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import h5py
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from behavenet_tpu.fitting.experiment import experiment_exists  # noqa: E402
from behavenet_tpu.utils import jsonc  # noqa: E402

BOLD, CEND = '\033[1m', '\33[0m'
CGREEN, CRED = '\33[32m', '\33[31m'

DATA_DICT = {
    'lab': 'lab', 'expt': 'expt', 'animal': 'animal',
    'all_source': 'data',
    'n_input_channels': 1, 'y_pixels': 64, 'x_pixels': 48,
    'use_output_mask': False,
    'neural_bin_size': 25, 'neural_type': 'ca',
    'approx_batch_size': 200,
}

TEMP_DATA = {'n_batches': 22, 'batch_lens': [20, 100], 'n_labels': 2, 'n_neurons': 25}

SESSIONS = ['sess-0', 'sess-1']

MODELS_TO_FIT = [
    {'model_class': 'ae', 'model_file': 'ae', 'sessions': SESSIONS[0]},
    # tensor-parallel AE: conv channels sharded over a (2, 2) dp x tp mesh
    # (4 virtual CPU devices); exercises fit()'s tp_devices branch end to end
    {'model_class': 'ae', 'model_file': 'ae', 'sessions': SESSIONS[0],
     'overrides': {'tp_devices': 2, 'experiment_name': 'ae-tp-expt'},
     'env': {'XLA_FLAGS': '--xla_force_host_platform_device_count=4'}},
    {'model_class': 'arhmm', 'model_file': 'arhmm', 'sessions': SESSIONS[0]},
    # sticky transitions (kappa-boosted self-transitions) and the recurrent
    # GLM transition M-step, through the real CLI (engine unit tests:
    # test_models/test_arhmm.py); arhmm-labels fits the HMM directly on
    # pose labels with no AE dependency (data/utils.py arhmm-labels branch)
    {'model_class': 'arhmm', 'model_file': 'arhmm', 'sessions': SESSIONS[0],
     'overrides': {'transitions': 'sticky', 'kappa': 10.0,
                   'experiment_name': 'arhmm-sticky-expt'}},
    {'model_class': 'arhmm', 'model_file': 'arhmm', 'sessions': SESSIONS[0],
     'overrides': {'transitions': 'recurrent',
                   'experiment_name': 'arhmm-recurrent-expt'}},
    {'model_class': 'arhmm-labels', 'model_file': 'arhmm', 'sessions': SESSIONS[0]},
    {'model_class': 'neural-ae', 'model_file': 'decoder', 'sessions': SESSIONS[0]},
    # mv = gaussian-full noise (learned per-frame full precision); exercises
    # the batched precision head under the default shape bucketing
    {'model_class': 'neural-ae', 'model_file': 'decoder', 'sessions': SESSIONS[0],
     'overrides': {'model_type': 'mlp-mv'}},
    # lstm decoder: implemented + unit-tested here, an unimplemented stub in
    # the reference (decoders.py:329-353)
    {'model_class': 'neural-ae', 'model_file': 'decoder', 'sessions': SESSIONS[0],
     'overrides': {'model_type': 'lstm'}},
    {'model_class': 'neural-ae-me', 'model_file': 'decoder', 'sessions': SESSIONS[0]},
    {'model_class': 'neural-labels', 'model_file': 'decoder', 'sessions': SESSIONS[0]},
    {'model_class': 'neural-arhmm', 'model_file': 'decoder', 'sessions': SESSIONS[0]},
    # fuses the ae/arhmm/neural-ae/neural-arhmm artifacts fit above
    {'model_class': 'bayesian-decoding', 'model_file': 'bayesian_decoder',
     'sessions': SESSIONS[0]},
    {'model_class': 'ae', 'model_file': 'ae', 'sessions': 'all'},
    {'model_class': 'vae', 'model_file': 'ae', 'sessions': SESSIONS[0]},
    {'model_class': 'beta-tcvae', 'model_file': 'ae', 'sessions': SESSIONS[0]},
    {'model_class': 'cond-ae-msp', 'model_file': 'ae', 'sessions': SESSIONS[0]},
    {'model_class': 'cond-vae', 'model_file': 'ae', 'sessions': SESSIONS[0]},
    {'model_class': 'ps-vae', 'model_file': 'ae', 'sessions': SESSIONS[0]},
    # vmapped alpha grid: two ps-vae trials fitted in ONE jitted program
    # sharing the data stream (fitting/vmap_grid.py via vmap_trials)
    {'model_class': 'ps-vae', 'model_file': 'ae', 'sessions': SESSIONS[0],
     'overrides': {'ps_vae.alpha': [1, 5], 'vmap_trials': 2,
                   'experiment_name': 'psvae-vmap-expt'}},
    {'model_class': 'msps-vae', 'model_file': 'ae', 'sessions': 'all'},
    # vmapped multisession alpha/delta grid: two msps-vae trials in ONE
    # program over shared seg_lens batches (the documented PS-VAE hparam
    # search, reference docs/source/adv_user_guide.psvae_hparam_search.rst)
    {'model_class': 'msps-vae', 'model_file': 'ae', 'sessions': 'all',
     'overrides': {'ps_vae.alpha': [1, 5], 'ps_vae.delta': 5,
                   'vmap_trials': 2, 'experiment_name': 'mspsvae-vmap-expt'}},
    {'model_class': 'labels-images', 'model_file': 'label_decoder', 'sessions': SESSIONS[0]},
]


def make_tmp_data(data_dir):
    """Write 2 sessions of random images + ca traces + labels + region idxs."""
    np.random.seed(4)
    for session in SESSIONS:
        hdf5_file = os.path.join(
            data_dir, DATA_DICT['lab'], DATA_DICT['expt'], DATA_DICT['animal'], session,
            'data.hdf5')
        os.makedirs(os.path.dirname(hdf5_file))
        with h5py.File(hdf5_file, 'w', libver='latest') as f:
            f.swmr_mode = True
            group_i = f.create_group('images')
            group_n = f.create_group('neural')
            group_l = f.create_group('labels')
            # pixel-space scaled labels (build_hdf5 writes these for real
            # data; the conditional-encoder path one-hots them via
            # MakeOneHot2D) — x values first, then y (transforms.py:111-139)
            group_ls = f.create_group('labels_sc')
            group_r = f.create_group('regions')
            group_ri = group_r.create_group('indxs')
            group_ri.create_dataset('region-0', data=np.arange(10))
            group_ri.create_dataset('region-1', data=10 + np.arange(15))
            for i in range(TEMP_DATA['n_batches']):
                batch_len = np.random.randint(*TEMP_DATA['batch_lens'])
                image_size = (batch_len, DATA_DICT['n_input_channels'],
                              DATA_DICT['y_pixels'], DATA_DICT['x_pixels'])
                group_i.create_dataset(
                    'trial_%04i' % i,
                    data=np.random.randint(0, 255, size=image_size), dtype='uint8')
                group_n.create_dataset(
                    'trial_%04i' % i,
                    data=np.random.randn(batch_len, TEMP_DATA['n_neurons']), dtype='float32')
                group_l.create_dataset(
                    'trial_%04i' % i,
                    data=np.random.randn(batch_len, TEMP_DATA['n_labels']), dtype='float32')
                n_pts = TEMP_DATA['n_labels'] // 2
                group_ls.create_dataset(
                    'trial_%04i' % i,
                    data=np.random.rand(batch_len, TEMP_DATA['n_labels'])
                    * np.array([[DATA_DICT['x_pixels']] * n_pts
                                + [DATA_DICT['y_pixels']] * n_pts]),
                    dtype='float32')


def get_model_config_files(model, json_dir):
    if model in ('ae', 'vae', 'cond-vae', 'beta-tcvae', 'cond-ae-msp', 'ps-vae',
                 'msps-vae', 'labels-images', 'arhmm', 'arhmm-labels'):
        m = 'arhmm' if model in ('arhmm', 'arhmm-labels') else 'ae'
        model_json_dir = os.path.join(json_dir, '%s_jsons' % m)
        model_json = 'arhmm_labels_model.json' if model == 'arhmm-labels' \
            else '%s_model.json' % m
        return {
            'data': os.path.join(json_dir, 'data_default.json'),
            'model': os.path.join(model_json_dir, model_json),
            'training': os.path.join(model_json_dir, '%s_training.json' % m),
            'compute': os.path.join(model_json_dir, '%s_compute.json' % m)}
    elif model in ('neural-ae', 'neural-ae-me', 'neural-arhmm', 'neural-labels'):
        m = 'decoding'
        s = model.split('-')[1]
        model_json_dir = os.path.join(json_dir, '%s_jsons' % m)
        return {
            'data': os.path.join(model_json_dir, '%s_data.json' % m),
            'model': os.path.join(model_json_dir, '%s_%s_model.json' % (m, s)),
            'training': os.path.join(model_json_dir, '%s_training.json' % m),
            'compute': os.path.join(model_json_dir, '%s_compute.json' % m)}
    elif model == 'bayesian-decoding':
        model_json_dir = os.path.join(json_dir, 'bayesian_jsons')
        return {
            'data': os.path.join(model_json_dir, 'bayesian_data.json'),
            'model': os.path.join(model_json_dir, 'bayesian_model.json'),
            'training': os.path.join(model_json_dir, 'bayesian_training.json'),
            'compute': os.path.join(model_json_dir, 'bayesian_compute.json')}
    raise NotImplementedError


def define_new_config_values(model, session='sess-0', device='cpu'):
    data_dict = {'session': session, 'all_source': 'data',
                 'n_labels': TEMP_DATA['n_labels'], **DATA_DICT}
    train_frac = 0.5
    trial_splits = '8;1;1;1'
    training_dict = {
        'export_train_plots': False, 'export_latents': True, 'export_predictions': True,
        'min_n_epochs': 1, 'max_n_epochs': 1, 'enable_early_stop': False,
        'train_frac': train_frac, 'trial_splits': trial_splits}
    compute_dict = {'device': device, 'tt_n_cpu_workers': 1}

    ae_expt_name = 'ae-expt'
    ae_model_class, ae_model_type = 'ae', 'conv'
    n_ae_latents = 6
    l2_reg = 0.0
    arhmm_expt_name = 'arhmm-expt'
    n_arhmm_states = [2, 4]
    n_arhmm_lags = 1

    if model in ('ae', 'vae', 'beta-tcvae', 'ps-vae', 'msps-vae'):
        return {
            'data': data_dict,
            'model': {'experiment_name': ae_expt_name, 'model_class': model,
                      'model_type': ae_model_type, 'n_ae_latents': n_ae_latents,
                      'n_sessions_per_batch': 2 if model == 'msps-vae' else 1,
                      'l2_reg': l2_reg},
            'training': training_dict, 'compute': compute_dict}
    if model == 'cond-ae-msp':
        return {
            'data': data_dict,
            'model': {'experiment_name': ae_expt_name, 'model_class': model,
                      'model_type': ae_model_type,
                      'n_ae_latents': n_ae_latents + TEMP_DATA['n_labels'],
                      'l2_reg': l2_reg, 'msp.alpha': 1e-5},
            'training': training_dict, 'compute': compute_dict}
    if model == 'cond-vae':
        return {
            'data': data_dict,
            'model': {'experiment_name': ae_expt_name, 'model_class': model,
                      'model_type': ae_model_type, 'n_ae_latents': n_ae_latents,
                      # True exercises the one-hot-2D label-map input path
                      # (labels_sc via MakeOneHot2D + widened first conv) —
                      # a combination the reference advertises but crashes on
                      'l2_reg': l2_reg, 'conditional_encoder': True},
            'training': training_dict, 'compute': compute_dict}
    if model == 'arhmm-labels':
        return {
            'data': data_dict,
            'model': {'experiment_name': 'arhmm-labels-expt',
                      'n_arhmm_states': n_arhmm_states,
                      'n_arhmm_lags': n_arhmm_lags, 'transitions': 'stationary',
                      'noise_type': 'gaussian'},
            'training': {'export_train_plots': False, 'export_states': True, 'n_iters': 2,
                         'train_frac': train_frac, 'trial_splits': trial_splits},
            'compute': compute_dict}
    if model == 'arhmm':
        return {
            'data': data_dict,
            'model': {'experiment_name': arhmm_expt_name, 'n_arhmm_states': n_arhmm_states,
                      'n_arhmm_lags': n_arhmm_lags, 'transitions': 'stationary',
                      'noise_type': 'gaussian', 'ae_experiment_name': ae_expt_name,
                      'ae_model_class': ae_model_class, 'ae_model_type': ae_model_type,
                      'n_ae_latents': n_ae_latents},
            'training': {'export_train_plots': False, 'export_states': True, 'n_iters': 2,
                         'train_frac': train_frac, 'trial_splits': trial_splits},
            'compute': compute_dict}
    if model in ('neural-ae', 'neural-ae-me'):
        return {
            'data': data_dict,
            'model': {'model_class': model, 'n_lags': 4, 'n_max_lags': 8, 'l2_reg': 1e-3,
                      'ae_experiment_name': ae_expt_name, 'ae_model_class': ae_model_class,
                      'ae_model_type': ae_model_type, 'n_ae_latents': n_ae_latents,
                      'model_type': 'mlp', 'n_hid_layers': 1, 'n_hid_units': 16,
                      'activation': 'relu'},
            'training': training_dict, 'compute': compute_dict}
    if model == 'neural-labels':
        return {
            'data': data_dict,
            'model': {'model_class': model, 'n_lags': 3, 'n_max_lags': 5, 'l2_reg': 1e-4,
                      'model_type': 'mlp', 'n_hid_layers': 1, 'n_hid_units': 16,
                      'activation': 'relu'},
            'training': training_dict, 'compute': compute_dict}
    if model == 'neural-arhmm':
        return {
            'data': data_dict,
            'model': {'n_lags': 2, 'n_max_lags': 8, 'l2_reg': 1e-3,
                      'ae_model_class': ae_model_class, 'ae_model_type': ae_model_type,
                      'n_ae_latents': n_ae_latents, 'arhmm_experiment_name': arhmm_expt_name,
                      'n_arhmm_states': n_arhmm_states[0], 'n_arhmm_lags': n_arhmm_lags,
                      'transitions': 'stationary', 'noise_type': 'gaussian',
                      'model_type': 'mlp', 'n_hid_layers': 1, 'n_hid_units': [8, 16],
                      'activation': 'relu'},
            'training': training_dict, 'compute': compute_dict}
    if model == 'bayesian-decoding':
        return {
            'data': data_dict,
            'model': {'model_class': model,
                      'ae_experiment_name': ae_expt_name,
                      'ae_model_class': ae_model_class,
                      'ae_model_type': ae_model_type, 'ae_version': 'best',
                      'n_ae_latents': n_ae_latents,
                      'arhmm_experiment_name': arhmm_expt_name,
                      'n_arhmm_states': n_arhmm_states[0],
                      'n_arhmm_lags': n_arhmm_lags, 'kappa': 0.0,
                      'transitions': 'stationary', 'noise_type': 'gaussian',
                      'arhmm_version': 'best',
                      'neural_ae_experiment_name': 'grid_search',
                      'neural_ae_model_type': 'mlp', 'neural_ae_version': 'best',
                      'neural_arhmm_experiment_name': 'grid_search',
                      'neural_arhmm_model_type': 'mlp',
                      'neural_arhmm_version': 'best'},
            'training': {'export_latents': True, 'export_states': True,
                         'train_frac': train_frac, 'trial_splits': trial_splits},
            'compute': compute_dict}
    if model == 'labels-images':
        return {
            'data': data_dict,
            'model': {'experiment_name': ae_expt_name, 'model_class': 'labels-images',
                      'model_type': ae_model_type, 'n_ae_latents': 0, 'l2_reg': l2_reg},
            'training': {'export_train_plots': False, 'export_predictions': False,
                         'min_n_epochs': 1, 'max_n_epochs': 1, 'enable_early_stop': False,
                         'train_frac': train_frac, 'trial_splits': trial_splits},
            'compute': compute_dict}
    raise NotImplementedError


def update_config_files(config_files, new_values, save_dir):
    new_config_dicts = {}
    new_config_files = {}
    for config_name, config_file in config_files.items():
        config_dict = jsonc.load_file(config_file)
        for key, val in new_values[config_name].items():
            config_dict[key] = val
        new_config_dicts[config_name] = config_dict
        filename = os.path.join(save_dir, os.path.basename(config_file))
        with open(filename, 'w') as f:
            json.dump(config_dict, f)
        new_config_files[config_name] = filename
    return new_config_dicts, new_config_files


def fit_model(model_file, config_files, env):
    call_str = [
        sys.executable, '-m', 'behavenet_tpu.fitting.%s_grid_search' % model_file,
        '--data_config', config_files['data'],
        '--model_config', config_files['model'],
        '--training_config', config_files['training'],
        '--compute_config', config_files['compute']]
    r = subprocess.run(call_str, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-4000:])
    return r.returncode == 0


def check_model(config_dicts, data_dir, save_dir):
    hparams = {**config_dicts['data'], **config_dicts['model'],
               **config_dicts['training'], **config_dicts['compute']}
    hparams['save_dir'] = save_dir
    hparams['data_dir'] = data_dir
    for key, val in hparams.items():
        if isinstance(val, list):
            hparams[key] = val[-1]
    return experiment_exists(hparams)


def main(device='cpu', only=None):
    t_beg = time.time()
    tmp = tempfile.mkdtemp()
    data_dir = os.path.join(tmp, 'data')
    save_dir = os.path.join(tmp, 'save')
    os.makedirs(data_dir)
    os.makedirs(save_dir)

    print('creating temp data...', end='')
    make_tmp_data(data_dir)
    print('done')

    # isolated HOME with directories.json
    home = os.path.join(tmp, 'home')
    os.makedirs(os.path.join(home, '.behavenet'))
    with open(os.path.join(home, '.behavenet', 'directories.json'), 'w') as f:
        json.dump({'data_dir': data_dir, 'save_dir': save_dir, 'fig_dir': tmp}, f)

    env = dict(os.environ, HOME=home,
               PYTHONPATH=REPO + os.pathsep + os.environ.get('PYTHONPATH', ''))
    if device == 'cpu':
        env.update(PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')

    json_dir = os.path.join(REPO, 'configs')

    results = {}
    models_to_fit = MODELS_TO_FIT
    if only:
        models_to_fit = [m for m in models_to_fit
                         if only in m['model_class']
                         or only in str(m.get('overrides', {}))]
        print('running %i/%i configs matching %r'
              % (len(models_to_fit), len(MODELS_TO_FIT), only))
    for model in models_to_fit:
        base_config_files = get_model_config_files(model['model_class'], json_dir)
        new_values = define_new_config_values(
            model['model_class'], model['sessions'], device)
        new_values['model'].update(model.get('overrides', {}))
        config_dicts, new_config_files = update_config_files(
            base_config_files, new_values, save_dir)
        print('\n---------------------------------------------------')
        print('model: %s%s (session=%s)' % (
            model['model_class'],
            ' ' + str(model['overrides']) if model.get('overrides') else '',
            model['sessions']))
        print('---------------------------------------------------')
        env_model = dict(env)
        if model.get('env') and device == 'cpu':
            env_model.update(model['env'])
        ok = fit_model(model['model_file'], new_config_files, env_model)
        if model['sessions'] == 'all':
            model_key = '%s-multisession' % model['model_class']
        else:
            model_key = model['model_class']
        if model.get('overrides', {}).get('model_type'):
            model_key += '/' + model['overrides']['model_type']
        if model.get('overrides', {}).get('tp_devices'):
            model_key += '/tp'
        if model.get('overrides', {}).get('vmap_trials'):
            model_key += '/vmap-grid'
        if model.get('overrides', {}).get('transitions'):
            model_key += '/' + model['overrides']['transitions']
        passed = ok and check_model(config_dicts, data_dir, save_dir)
        results[model_key] = passed

    shutil.rmtree(tmp)

    print('\n%s================== Integration Test Results ==================%s\n'
          % (BOLD, CEND))
    n_fail = 0
    for key, passed in results.items():
        status = (CGREEN + 'passed' + CEND) if passed else (CRED + 'failed' + CEND)
        print('%s: %s%s%s' % (key, BOLD, status, CEND))
        n_fail += 0 if passed else 1
    print('\ntotal time: %s%f sec%s\n' % (BOLD, time.time() - t_beg, CEND))
    return n_fail


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--device', default='cpu', type=str)
    parser.add_argument('--only', default=None, type=str,
                        help='substring filter on model_class/overrides')
    namespace, _ = parser.parse_known_args()
    sys.exit(main(namespace.device, namespace.only))
