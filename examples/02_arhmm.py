"""Example 02: segment AE latents with an ARHMM.

Run after 01_ae.py; reads the exported latents and fits 2- and 4-state
ARHMMs (the list value fans out as a grid).
"""

from _common import base_dirs, data_config, run_cli, write

TMP = '/tmp/bntpu/configs'


def main(n_iters=10, device='cpu'):
    data_dir, save_dir = base_dirs()
    configs = {
        'data_config': data_config(TMP, data_dir, save_dir),
        'model_config': write(TMP, 'arhmm_model.json', {
            'experiment_name': 'arhmm-demo',
            'n_arhmm_states': [2, 4], 'rng_seed_model': 0,
            'n_arhmm_lags': 1, 'kappa': 0, 'noise_type': 'gaussian',
            'transitions': 'stationary',
            'ae_experiment_name': 'ae-demo', 'ae_version': 'best',
            'ae_model_class': 'ae', 'ae_model_type': 'conv', 'n_ae_latents': 4,
            'model_class': 'arhmm', 'model_type': None}),
        'training_config': write(TMP, 'arhmm_training.json', {
            'export_train_plots': False, 'export_states': True,
            'n_iters': n_iters, 'rng_seed_train': 0, 'arhmm_es_tol': 0,
            'as_numpy': True, 'batch_load': False, 'rng_seed_data': 0,
            'train_frac': 1.0, 'trial_splits': '8;1;1;0'}),
        'compute_config': write(TMP, 'arhmm_compute.json', {'device': device}),
    }
    run_cli('arhmm_grid_search', configs)
    print('\nARHMM done; states exported under %s' % save_dir)


if __name__ == '__main__':
    main()
