"""Example 05: PS-VAE — partition latents into supervised + unsupervised subspaces.

Run after 00_make_data.py. Fits a PS-VAE whose supervised subspace
reconstructs the pose labels, then reports the label R^2 from the metrics
store. For the alpha/beta hyperparameter search workflow see
docs/user_guide.md and
plotting.cond_ae_utils.plot_hyperparameter_search_results.
"""

import os

import pandas as pd

from _common import ANIMAL, EXPT, LAB, SESSION, base_dirs, data_config, run_cli, write
from importlib import import_module

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
    arch_path = write(TMP, 'psvae_arch.json', AE_ARCH)
    run_cli('ae_grid_search', {
        'data_config': data_config(TMP, data_dir, save_dir),
        'model_config': write(TMP, 'psvae_model.json', {
            'experiment_name': 'psvae-demo', 'model_class': 'ps-vae',
            'model_type': 'conv', 'n_ae_latents': 5, 'l2_reg': 0.0,
            'rng_seed_model': 0, 'fit_sess_io_layers': False,
            'ae_arch_json': arch_path, 'conditional_encoder': False,
            'msp.alpha': None, 'vae.beta': 1, 'vae.beta_anneal_epochs': 100,
            'beta_tcvae.beta': 1, 'beta_tcvae.beta_anneal_epochs': 100,
            'ps_vae.alpha': 100, 'ps_vae.beta': 1, 'ps_vae.delta': 1,
            'ps_vae.anneal_epochs': 10, 'n_background': 3,
            'n_sessions_per_batch': 1, 'mem_limit_gb': 8.0}),
        'training_config': write(TMP, 'psvae_training.json', {
            'export_train_plots': False, 'export_latents': True,
            'pretrained_weights_path': None, 'val_check_interval': 1,
            'learning_rate': 1e-3, 'max_n_epochs': max_n_epochs,
            'min_n_epochs': 1, 'enable_early_stop': False,
            'early_stop_history': 10, 'rng_seed_train': 0,
            'as_numpy': True, 'batch_load': True, 'rng_seed_data': 0,
            'train_frac': 1.0, 'trial_splits': '8;1;1;0'}),
        'compute_config': write(TMP, 'psvae_compute.json', {'device': device}),
    })

    metrics = pd.read_csv(os.path.join(
        save_dir, LAB, EXPT, ANIMAL, SESSION,
        'ps-vae/conv/05_latents/psvae-demo/version_0/metrics.csv'))
    final = metrics[metrics.val_label_r2.notna()].iloc[-1]
    print('\nfinal val label R^2: %.3f' % final.val_label_r2)


if __name__ == '__main__':
    main()
