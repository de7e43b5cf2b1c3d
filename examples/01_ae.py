"""Example 01: train a convolutional autoencoder and export latents.

    python examples/00_make_data.py
    python examples/01_ae.py

Trains a small conv AE on the synthetic session and writes latents to the
experiment store, where example 02 (ARHMM) picks them up.
"""

import os

from _common import base_dirs, data_config, run_cli, write

TMP = '/tmp/bntpu/configs'

AE_ARCH = {
    'ae_network_type': 'strides_only', 'ae_padding_type': 'same',
    'ae_batch_norm': 0, 'ae_batch_norm_momentum': None, 'symmetric_arch': 1,
    'ae_encoding_n_channels': [16, 32, 64],
    'ae_encoding_kernel_size': [5, 5, 5],
    'ae_encoding_stride_size': [2, 2, 2],
    'ae_encoding_layer_type': ['conv', 'conv', 'conv'],
    'ae_decoding_last_FF_layer': 0,
}


def main(max_n_epochs=20, device='cpu'):
    data_dir, save_dir = base_dirs()
    arch_path = write(TMP, 'ae_arch.json', AE_ARCH)
    configs = {
        'data_config': data_config(TMP, data_dir, save_dir),
        'model_config': write(TMP, 'ae_model.json', {
            'experiment_name': 'ae-demo', 'model_class': 'ae', 'model_type': 'conv',
            'n_ae_latents': 4, 'l2_reg': 0.0, 'rng_seed_model': 0,
            'fit_sess_io_layers': False, 'ae_arch_json': arch_path,
            'conditional_encoder': False, 'msp.alpha': None,
            'vae.beta': 1, 'vae.beta_anneal_epochs': 100,
            'beta_tcvae.beta': 1, 'beta_tcvae.beta_anneal_epochs': 100,
            'ps_vae.alpha': 1, 'ps_vae.beta': 1, 'ps_vae.delta': 1,
            'ps_vae.anneal_epochs': 100, 'n_background': 3,
            'n_sessions_per_batch': 1, 'mem_limit_gb': 8.0}),
        'training_config': write(TMP, 'ae_training.json', {
            'export_train_plots': False, 'export_latents': True,
            'pretrained_weights_path': None, 'val_check_interval': 1,
            'learning_rate': 1e-3, 'max_n_epochs': max_n_epochs,
            'min_n_epochs': 1, 'enable_early_stop': False,
            'early_stop_history': 10, 'rng_seed_train': 0,
            'as_numpy': True, 'batch_load': True, 'rng_seed_data': 0,
            'train_frac': 1.0, 'trial_splits': '8;1;1;0'}),
        'compute_config': write(TMP, 'ae_compute.json', {'device': device}),
    }
    run_cli('ae_grid_search', configs)
    print('\nAE done; latents exported under %s' % save_dir)


if __name__ == '__main__':
    main()
