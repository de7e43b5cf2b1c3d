"""Example 06: multi-session PS-VAE (MSPS-VAE).

Requires two sessions:

    python examples/00_make_data.py --n_sessions 2
    python examples/06_msps_vae.py

Fits one MSPS-VAE across both sessions (a multisession-00 results dir) with
a background subspace separated across sessions via the triplet loss, then
reports the session-classification accuracy of the background latents
(high accuracy = the background subspace captured session identity).
"""

import os
import pickle

import numpy as np

from _common import ANIMAL, EXPT, LAB, base_dirs, data_config, run_cli, write

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


def main(max_n_epochs=10, device='cpu'):
    data_dir, save_dir = base_dirs()
    arch_path = write(TMP, 'msps_arch.json', AE_ARCH)
    n_latents, n_labels, n_background = 8, 2, 2
    run_cli('ae_grid_search', {
        'data_config': data_config(TMP, data_dir, save_dir, session='all',
                                   all_source='data'),
        'model_config': write(TMP, 'msps_model.json', {
            'experiment_name': 'msps-demo', 'model_class': 'msps-vae',
            'model_type': 'conv', 'n_ae_latents': n_latents, 'l2_reg': 0.0,
            'rng_seed_model': 0, 'fit_sess_io_layers': False,
            'ae_arch_json': arch_path, 'conditional_encoder': False,
            'msp.alpha': None, 'vae.beta': 1, 'vae.beta_anneal_epochs': 100,
            'beta_tcvae.beta': 1, 'beta_tcvae.beta_anneal_epochs': 100,
            'ps_vae.alpha': 100, 'ps_vae.beta': 1, 'ps_vae.delta': 10,
            'ps_vae.anneal_epochs': 5, 'n_background': n_background,
            'n_sessions_per_batch': 2, 'mem_limit_gb': 8.0}),
        'training_config': write(TMP, 'msps_training.json', {
            'export_train_plots': False, 'export_latents': True,
            'pretrained_weights_path': None, 'val_check_interval': 1,
            'learning_rate': 1e-3, 'max_n_epochs': max_n_epochs,
            'min_n_epochs': 1, 'enable_early_stop': False,
            'early_stop_history': 10, 'rng_seed_train': 0,
            'as_numpy': True, 'batch_load': True, 'rng_seed_data': 0,
            'train_frac': 1.0, 'trial_splits': '8;1;1;0'}),
        'compute_config': write(TMP, 'msps_compute.json', {'device': device}),
    })

    # session classifier on the background latents
    from behavenet_tpu.plotting.cond_ae_utils import fit_classifier
    version_dir = os.path.join(
        save_dir, LAB, EXPT, ANIMAL, 'multisession-00',
        'msps-vae/conv/%02i_latents/msps-demo/version_0' % n_latents)
    latents_all, sess_ids_all = [], []
    for s_idx in range(2):
        sess = 'session-%02i' % s_idx
        with open(os.path.join(version_dir, '%s_%s_%s_%s_latents.pkl' % (
                LAB, EXPT, ANIMAL, sess)), 'rb') as f:
            d = pickle.load(f)
        lat = np.vstack([x for x in d['latents'] if np.asarray(x).size > 0])
        latents_all.append(lat[:, n_labels:n_labels + n_background])
        sess_ids_all.append(np.full(len(lat), s_idx))
    _, acc = fit_classifier(np.vstack(latents_all), np.concatenate(sess_ids_all))
    print('\nbackground-subspace session classification accuracy: %.3f' % acc)


if __name__ == '__main__':
    main()
