"""Evaluation / export helpers: latents, states, predictions, reconstructions.

Behavioral contract follows the reference (behavenet/fitting/eval.py): pickle
artifacts ``{lab}_{expt}_{animal}_{sess}_latents.pkl`` (keys 'latents',
'trials'), ``..._states.pkl`` ('states', 'trials'), ``..._predictions.pkl``
('predictions', 'trials'); gap trials appear as empty arrays; prediction
trials are NaN in the lag-trimmed border.

TPU-native: full trials are encoded in one device call (no 200-frame
chunking — HBM holds whole trials).
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['export_latents', 'export_states', 'export_predictions',
           'export_predictions_conv_decoder', 'get_reconstruction',
           'get_test_metric', 'export_train_plots']


def _img_to_device(images):
    x = jnp.asarray(images)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return x


def _encode_latents(model, params, images, labels_2d=None, dataset=0):
    """Model-class-specific latent extraction (reference eval.py:74-97)."""
    x = _img_to_device(images)
    if labels_2d is not None:
        x = jnp.concatenate([x, jnp.asarray(labels_2d)], axis=-1)
    mc = model.hparams['model_class']
    if mc == 'ps-vae':
        y, w, _, _ = model.encode(params, x, dataset=dataset)
        latents = jnp.concatenate([y, w], axis=1)
    elif mc == 'msps-vae':
        z_s, z_b, z_u, _, _ = model.encode(params, x, dataset=dataset)
        latents = jnp.concatenate([z_s, z_b, z_u], axis=1)
    elif mc == 'cond-ae-msp':
        z, _ = model.encoding.apply(params['encoder'], x, dataset=dataset)
        latents = jnp.dot(z, params['U'].T)
    elif getattr(model, 'variational', False):
        mu, _, _ = model.encoding.apply(params['encoder'], x, dataset=dataset)
        latents = mu
    else:
        latents = model.encode(params, x, dataset=dataset)
    return np.asarray(latents)


def export_latents(data_generator, model, params, filename=None, version=None,
                   expt_dir=None):
    """Export latents for all train/val/test trials (reference eval.py:6-118).

    For MSPS-VAE a standard (single-session-per-batch) generator is rebuilt
    covering every trial (reference vaes.py:1200-1273 does the same).
    """
    if model.hparams['model_class'] == 'msps-vae':
        import copy
        from behavenet_tpu.data.utils import build_data_generator
        hp_new = copy.deepcopy(model.hparams)
        hp_new['n_sessions_per_batch'] = 1
        hp_new['train_frac'] = 1
        hp_new['trial_splits'] = '1;0;0;0'
        data_generator = build_data_generator(
            hp_new, data_generator.datasets_info, export_csv=False)

    latents = [[] for _ in range(data_generator.n_datasets)]
    for sess, dataset in enumerate(data_generator.datasets):
        latents[sess] = [np.array([]) for _ in range(dataset.n_trials)]

    for dtype in ['train', 'val', 'test']:
        data_generator.reset_iterators(dtype)
        for _ in range(data_generator.n_tot_batches[dtype]):
            data, sess = data_generator.next_batch(dtype)
            # cond-vae included: its conditional encoder works here (the
            # reference's crashes, see models/aes.py conditional gate)
            labels_2d = data.get('labels_sc') if (
                model.hparams['model_class'] in ('cond-ae', 'cond-vae')
                and model.hparams.get('conditional_encoder', False)) else None
            latents[sess][data['batch_idx']] = _encode_latents(
                model, params, data['images'], labels_2d=labels_2d, dataset=sess)

    expt_dir = expt_dir if expt_dir is not None else model.hparams['expt_dir']
    version = version if version is not None else getattr(model, 'version')

    filenames = []
    for sess, dataset in enumerate(data_generator.datasets):
        if filename is None:
            sess_id = '%s_%s_%s_%s_latents.pkl' % (
                dataset.lab, dataset.expt, dataset.animal, dataset.session)
            filename_save = os.path.join(expt_dir, 'version_%i' % version, sess_id)
        else:
            filename_save = filename
        print('saving latents %i of %i:\n%s' % (
            sess + 1, data_generator.n_datasets, filename_save))
        latents_dict = {'latents': latents[sess], 'trials': dataset.batch_idxs}
        with open(filename_save, 'wb') as f:
            pickle.dump(latents_dict, f)
        filenames.append(filename_save)
    return filenames


def export_states(hparams, data_generator, model, filename=None):
    """Export most-likely ARHMM state sequences per trial (reference eval.py:121-188)."""
    states = [[] for _ in range(data_generator.n_datasets)]
    for sess, dataset in enumerate(data_generator.datasets):
        states[sess] = [np.array([]) for _ in range(dataset.n_trials)]

    for dtype in ['train', 'val', 'test']:
        data_generator.reset_iterators(dtype)
        for _ in range(data_generator.n_tot_batches[dtype]):
            data, sess = data_generator.next_batch(dtype)
            if hparams['model_class'].find('label') > -1:
                y = data['labels']
            else:
                y = data['ae_latents']
            states[sess][data['batch_idx']] = np.asarray(model.most_likely_states(y))

    filenames = []
    for sess, dataset in enumerate(data_generator.datasets):
        if filename is None:
            sess_id = '%s_%s_%s_%s_states.pkl' % (
                dataset.lab, dataset.expt, dataset.animal, dataset.session)
            filename_save = os.path.join(
                hparams['expt_dir'], 'version_%i' % hparams['version'], sess_id)
        else:
            filename_save = filename
        print('saving states %i of %i:\n%s' % (
            sess + 1, data_generator.n_datasets, filename_save))
        states_dict = {'states': states[sess], 'trials': dataset.batch_idxs}
        with open(filename_save, 'wb') as f:
            pickle.dump(states_dict, f)
        filenames.append(filename_save)
    return filenames


def export_predictions(data_generator, model, params, filename=None, version=None,
                       expt_dir=None):
    """Export decoder predictions with NaN lag borders (reference eval.py:191-283)."""
    predictions = [[] for _ in range(data_generator.n_datasets)]
    for sess, dataset in enumerate(data_generator.datasets):
        predictions[sess] = [np.array([]) for _ in range(dataset.n_trials)]

    max_lags = int(model.hparams['n_max_lags'])
    for dtype in ['train', 'val', 'test']:
        data_generator.reset_iterators(dtype)
        for _ in range(data_generator.n_tot_batches[dtype]):
            data, sess = data_generator.next_batch(dtype)
            predictors = jnp.asarray(data[model.hparams['input_signal']])
            targets = data[model.hparams['output_signal']]
            trial_len = targets.shape[0]
            pred = np.full(
                (trial_len, int(model.hparams['output_size'])), np.nan, dtype='float32')
            outputs, _ = model.forward(params, predictors)
            pred[max_lags:trial_len - max_lags, :] = \
                np.asarray(outputs)[max_lags:trial_len - max_lags]
            predictions[sess][data['batch_idx']] = pred

    expt_dir = expt_dir if expt_dir is not None else model.hparams['expt_dir']
    version = version if version is not None else getattr(model, 'version')

    filenames = []
    for sess, dataset in enumerate(data_generator.datasets):
        if filename is None:
            sess_id = '%s_%s_%s_%s_predictions.pkl' % (
                dataset.lab, dataset.expt, dataset.animal, dataset.session)
            filename_save = os.path.join(expt_dir, 'version_%i' % version, sess_id)
        else:
            filename_save = filename
        print('saving predictions %i of %i to %s' % (
            sess + 1, data_generator.n_datasets, filename_save))
        predictions_dict = {'predictions': predictions[sess], 'trials': dataset.batch_idxs}
        with open(filename_save, 'wb') as f:
            pickle.dump(predictions_dict, f)
        filenames.append(filename_save)
    return filenames


def export_predictions_conv_decoder(data_generator, model, params, filename=None,
                                    version=None, expt_dir=None):
    """Export predicted images per trial for the labels->images conv decoder.

    The reference leaves this unimplemented (training.py:459-461 prints a
    warning and skips); here every trial exports as a float32 (T, C, H, W)
    array in [0, 1] — the reference's image-layout convention (data.hdf5
    stores TCHW) — in the standard ``..._predictions.pkl`` format
    ({'predictions': [per-trial arrays], 'trials': batch_idxs}).
    """
    predictions = [[] for _ in range(data_generator.n_datasets)]
    for sess, dataset in enumerate(data_generator.datasets):
        predictions[sess] = [np.array([]) for _ in range(dataset.n_trials)]

    for dtype in ['train', 'val', 'test']:
        data_generator.reset_iterators(dtype)
        for _ in range(data_generator.n_tot_batches[dtype]):
            data, sess = data_generator.next_batch(dtype)
            y = jnp.asarray(data['labels'], dtype=jnp.float32)
            ims = np.asarray(model.forward(params, y, dataset=sess))  # NHWC
            predictions[sess][data['batch_idx']] = np.transpose(ims, (0, 3, 1, 2))

    expt_dir = expt_dir if expt_dir is not None else model.hparams['expt_dir']
    version = version if version is not None else getattr(model, 'version')

    filenames = []
    for sess, dataset in enumerate(data_generator.datasets):
        if filename is None:
            sess_id = '%s_%s_%s_%s_predictions.pkl' % (
                dataset.lab, dataset.expt, dataset.animal, dataset.session)
            filename_save = os.path.join(expt_dir, 'version_%i' % version, sess_id)
        else:
            filename_save = filename
        print('saving image predictions %i of %i to %s' % (
            sess + 1, data_generator.n_datasets, filename_save))
        predictions_dict = {'predictions': predictions[sess],
                            'trials': dataset.batch_idxs}
        with open(filename_save, 'wb') as f:
            pickle.dump(predictions_dict, f)
        filenames.append(filename_save)
    return filenames


def get_reconstruction(model, params, inputs, dataset=0, return_latents=False, labels=None,
                       labels_2d=None, apply_inverse_transform=True, use_mean=True, rng=None):
    """Reconstruct images from image or latent inputs (reference eval.py:286-374).

    Images are NHWC (or uint8 NHWC); latents are (batch, n_latents).
    """
    inputs = np.asarray(inputs)
    input_type = 'latents' if inputs.ndim == 2 else 'images'
    mc = model.hparams['model_class']
    if rng is None:
        rng = jax.random.PRNGKey(0)

    if input_type == 'images':
        x = _img_to_device(inputs)
        if mc == 'ae':
            ims_recon, latents = model.forward(params, x, dataset=dataset)
        elif mc == 'cond-ae-msp':
            ims_recon, latents, _ = model.forward(params, x, dataset=dataset)
        elif mc in ('vae', 'beta-tcvae'):
            ims_recon, latents, _, _ = model.forward(
                params, x, rng=rng, dataset=dataset, use_mean=use_mean)
        elif mc in ('ps-vae', 'msps-vae'):
            ims_recon, _, latents, _, _ = model.forward(
                params, x, rng=rng, dataset=dataset, use_mean=use_mean)
        elif mc == 'cond-ae':
            ims_recon, latents = model.forward(
                params, x, dataset=dataset, labels=jnp.asarray(labels),
                labels_2d=None if labels_2d is None else jnp.asarray(labels_2d))
        elif mc == 'cond-vae':
            ims_recon, latents, _, _ = model.forward(
                params, x, rng=rng, dataset=dataset, labels=jnp.asarray(labels),
                labels_2d=None if labels_2d is None else jnp.asarray(labels_2d),
                use_mean=use_mean)
        else:
            raise ValueError('Invalid model class %s' % mc)
    else:
        z = jnp.asarray(inputs, dtype=jnp.float32)
        if mc in ('cond-ae', 'cond-vae'):
            z = jnp.concatenate([z, jnp.asarray(labels)], axis=1)
        elif mc == 'cond-ae-msp' and apply_inverse_transform:
            z = model.get_inverse_transformed_latents(params, z)
        elif mc in ('ps-vae', 'msps-vae') and apply_inverse_transform:
            z = model.get_inverse_transformed_latents(params, z)
        ims_recon = model.decoding.apply(params['decoder'], z, None, dataset=dataset)
        latents = z

    ims_recon = np.asarray(ims_recon)
    latents = np.asarray(latents)
    if return_latents:
        return ims_recon, latents
    return ims_recon


def get_test_metric(hparams, model_version, metric='r2', dtype='test',
                    multioutput='variance_weighted', sess_idx=0):
    """Single R^2 / FC / MSE across all test trials of a decoder (reference eval.py:377)."""
    from sklearn.metrics import r2_score, accuracy_score
    from behavenet_tpu.fitting.experiment import get_best_model_and_data
    from behavenet_tpu.models import Decoder

    model, params, data_generator = get_best_model_and_data(
        hparams, Decoder, load_data=True, version=model_version)

    n_test_batches = len(data_generator.datasets[sess_idx].batch_idxs[dtype])
    # the fitted model's meta tags carry the lag config; the caller's
    # analysis hparams often don't
    max_lags = hparams.get('n_max_lags') or model.hparams['n_max_lags']
    true, pred = [], []
    data_generator.reset_iterators(dtype)
    for _ in range(n_test_batches):
        batch, _ = data_generator.next_batch(dtype)
        if metric in ('r2', 'mse'):
            if 'ae_latents' in batch:
                curr_true = np.asarray(batch['ae_latents'])
            elif 'labels' in batch:
                curr_true = np.asarray(batch['labels'])
            else:
                raise ValueError('no valid key in {}'.format(batch.keys()))
        elif metric == 'fc':
            curr_true = np.asarray(batch['arhmm_states'])
        else:
            raise ValueError('"%s" is an invalid metric type' % metric)
        curr_pred = np.asarray(model.forward(params, jnp.asarray(batch['neural']))[0])
        true.append(curr_true[max_lags:-max_lags])
        pred.append(curr_pred[max_lags:-max_lags])

    if metric == 'r2':
        metric = r2_score(
            np.concatenate(true, axis=0), np.concatenate(pred, axis=0),
            multioutput=multioutput)
    elif metric == 'mse':
        metric = np.mean(np.square(np.concatenate(true, axis=0) - np.concatenate(pred, axis=0)))
    elif metric == 'fc':
        metric = accuracy_score(
            np.concatenate(true, axis=0), np.argmax(np.concatenate(pred, axis=0), axis=1))

    return model.hparams, metric, true, pred


def export_train_plots(hparams, dtype, loss_type='mse', save_file=None, format='png'):
    """Plot train/val loss vs epoch from metrics.csv (reference eval.py:453-532)."""
    import pandas as pd
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import seaborn as sns
    from behavenet_tpu.fitting.experiment import read_session_info_from_csv

    sns.set_style('white')

    version_dir = os.path.join(hparams['expt_dir'], 'version_%i' % hparams['version'])
    metric_file = os.path.join(version_dir, 'metrics.csv')
    metrics = pd.read_csv(metric_file)

    sess_ids = read_session_info_from_csv(os.path.join(version_dir, 'session_info.csv'))
    sess_ids_strs = ['%s/%s' % (s['animal'], s['session']) for s in sess_ids]
    rows = []
    for _, row in metrics.iterrows():
        dataset = 'all' if row['dataset'] == -1 else sess_ids_strs[int(row['dataset'])]
        if 'val_loss' in row:
            rows.append({'dataset': dataset, 'epoch': row['epoch'],
                         'loss': row['val_loss'], 'dtype': 'val'})
        if 'tr_loss' in row:
            rows.append({'dataset': dataset, 'epoch': row['epoch'],
                         'loss': row['tr_loss'], 'dtype': 'train'})
    metrics_df = pd.DataFrame(rows)

    data_queried = metrics_df[
        (metrics_df.dtype == dtype) & (metrics_df.epoch > 0) & ~pd.isna(metrics_df.loss)]
    splt = sns.relplot(x='epoch', y='loss', hue='dataset', kind='line', data=data_queried)
    splt.ax.set_xlabel('Epoch')
    if loss_type == 'mse':
        splt.ax.set_yscale('log')
        splt.ax.set_ylabel('MSE per pixel')
    elif loss_type == 'll':
        splt.ax.set_ylabel('Neg log prob per datapoint')
    else:
        raise ValueError('"%s" is an invalid loss type' % loss_type)
    plt.title('%s loss' % ('Validation' if dtype == 'val' else 'Training'))

    if save_file is not None:
        plt.savefig('%s.%s' % (save_file, format), dpi=300, format=format)
        plt.close()
    return splt
