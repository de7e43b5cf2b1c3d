"""Example 03: decode AE latents and ARHMM states from neural activity.

Run after 01_ae.py and 02_arhmm.py. Fits a neural->latents MLP and a
neural->states classifier; exports predictions used by example 04.
"""

from _common import base_dirs, data_config, run_cli, write

TMP = '/tmp/bntpu/configs'


def main(max_n_epochs=20, device='cpu'):
    data_dir, save_dir = base_dirs()
    training = write(TMP, 'dec_training.json', {
        'export_predictions': True, 'val_check_interval': 1,
        'learning_rate': 1e-3, 'max_n_epochs': max_n_epochs, 'min_n_epochs': 1,
        'enable_early_stop': False, 'early_stop_history': 10, 'rng_seed_train': 0,
        'as_numpy': True, 'batch_load': True, 'rng_seed_data': 0,
        'train_frac': 1.0, 'trial_splits': '8;1;1;0'})
    compute = write(TMP, 'dec_compute.json', {'device': device})

    # neural -> AE latents
    run_cli('decoder_grid_search', {
        'data_config': data_config(TMP, data_dir, save_dir),
        'model_config': write(TMP, 'dec_ae_model.json', {
            'experiment_name': 'dec-ae-demo', 'model_class': 'neural-ae',
            'n_lags': 2, 'n_max_lags': 4, 'l2_reg': 1e-4, 'rng_seed_model': 0,
            'ae_experiment_name': 'ae-demo', 'ae_version': 'best',
            'ae_model_class': 'ae', 'ae_model_type': 'conv', 'n_ae_latents': 4,
            'ae_multisession': None, 'model_type': 'mlp', 'n_hid_layers': 1,
            'n_hid_units': 16, 'activation': 'relu'}),
        'training_config': training, 'compute_config': compute})

    # neural -> ARHMM states
    run_cli('decoder_grid_search', {
        'data_config': data_config(TMP, data_dir, save_dir),
        'model_config': write(TMP, 'dec_arhmm_model.json', {
            'experiment_name': 'dec-arhmm-demo', 'model_class': 'neural-arhmm',
            'n_lags': 2, 'n_max_lags': 4, 'l2_reg': 1e-4, 'rng_seed_model': 0,
            'ae_model_class': 'ae', 'ae_model_type': 'conv', 'n_ae_latents': 4,
            'arhmm_experiment_name': 'arhmm-demo', 'n_arhmm_states': 2,
            'n_arhmm_lags': 1, 'kappa': 0.0, 'noise_type': 'gaussian',
            'transitions': 'stationary', 'arhmm_version': 'best',
            'arhmm_multisession': None, 'model_type': 'mlp', 'n_hid_layers': 1,
            'n_hid_units': 16, 'activation': 'relu'}),
        'training_config': training, 'compute_config': compute})
    print('\ndecoders done; predictions exported under %s' % save_dir)


if __name__ == '__main__':
    main()
