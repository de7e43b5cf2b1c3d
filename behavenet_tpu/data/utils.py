"""Signal/transform/path resolution wiring model classes to data sources.

Behavioral contract follows the reference (behavenet/data/utils.py): the big
model_class -> (signals, transforms, paths) dispatch, upstream-artifact path
resolution with best-version lookup, and training-split consistency checks.
"""

import os
import pickle

import numpy as np

__all__ = ['get_data_generator_inputs', 'build_data_generator', 'check_same_training_split',
           'get_transforms_paths', 'load_labels_like_latents', 'get_region_list']


def get_data_generator_inputs(hparams, sess_ids, check_splits=True):
    """Map model_class to per-session (signals, transforms, paths) (reference :15-339)."""
    signals_list, transforms_list, paths_list = [], [], []

    for sess_id in sess_ids:

        data_dir = os.path.join(
            hparams['data_dir'], sess_id['lab'], sess_id['expt'],
            sess_id['animal'], sess_id['session'])
        hdf5 = os.path.join(data_dir, 'data.hdf5')

        if hparams['model_class'].find('neural') > -1:
            neural_transform, neural_path = get_transforms_paths(
                'neural', hparams, sess_id=sess_id, check_splits=check_splits)
        else:
            neural_transform, neural_path = None, None

        mc = hparams['model_class']

        if mc in ('ae', 'vae', 'beta-tcvae'):
            signals = ['images']
            transforms = [None]
            paths = [hdf5]
            if hparams.get('use_output_mask', False):
                signals.append('masks')
                transforms.append(None)
                paths.append(hdf5)

        elif mc in ('cond-ae', 'cond-ae-msp', 'cond-vae', 'ps-vae', 'msps-vae'):
            signals = ['images', 'labels']
            transforms = [None, None]
            paths = [hdf5, hdf5]
            if hparams.get('use_output_mask', False):
                signals.append('masks')
                transforms.append(None)
                paths.append(hdf5)
            if hparams.get('use_label_mask', False) and mc in ('cond-ae-msp', 'ps-vae'):
                signals.append('labels_masks')
                transforms.append(None)
                paths.append(hdf5)
            if hparams.get('conditional_encoder', False):
                from behavenet_tpu.data.transforms import MakeOneHot2D
                signals.append('labels_sc')
                transforms.append(MakeOneHot2D(hparams['y_pixels'], hparams['x_pixels']))
                paths.append(hdf5)

        elif mc == 'ae_latents':
            ae_transform, ae_path = get_transforms_paths(
                'ae_latents', hparams, sess_id=sess_id, check_splits=check_splits)
            signals, transforms, paths = ['ae_latents'], [ae_transform], [ae_path]

        elif mc in ('neural-ae', 'neural-ae-me'):
            hparams['input_signal'] = 'neural'
            hparams['output_signal'] = 'ae_latents'
            hparams['output_size'] = hparams['n_ae_latents']
            hparams['noise_dist'] = 'gaussian-full' if hparams['model_type'][-2:] == 'mv' \
                else 'gaussian'
            dtype = 'ae_latents_me' if mc == 'neural-ae-me' else 'ae_latents'
            ae_transform, ae_path = get_transforms_paths(
                dtype, hparams, sess_id=sess_id, check_splits=check_splits)
            signals = ['neural', 'ae_latents']
            transforms = [neural_transform, ae_transform]
            paths = [neural_path, ae_path]

        elif mc == 'ae-neural':
            hparams['input_signal'] = 'ae_latents'
            hparams['output_signal'] = 'neural'
            hparams['output_size'] = None
            if hparams['neural_type'] == 'ca':
                hparams['noise_dist'] = 'gaussian-full' if hparams['model_type'][-2:] == 'mv' \
                    else 'gaussian'
            elif hparams['neural_type'] == 'spikes':
                hparams['noise_dist'] = 'poisson'
            ae_transform, ae_path = get_transforms_paths(
                'ae_latents', hparams, sess_id=sess_id, check_splits=check_splits)
            signals = ['neural', 'ae_latents']
            transforms = [neural_transform, ae_transform]
            paths = [neural_path, ae_path]

        elif mc == 'neural-labels':
            hparams['input_signal'] = 'neural'
            hparams['output_signal'] = 'labels'
            hparams['output_size'] = hparams['n_labels']
            hparams['noise_dist'] = 'gaussian-full' if hparams['model_type'][-2:] == 'mv' \
                else 'gaussian'
            signals = ['neural', 'labels']
            transforms = [neural_transform, None]
            paths = [neural_path, hdf5]

        elif mc == 'labels-neural':
            hparams['input_signal'] = 'labels'
            hparams['output_signal'] = 'neural'
            hparams['output_size'] = None
            if hparams['neural_type'] == 'ca':
                hparams['noise_dist'] = 'gaussian-full' if hparams['model_type'][-2:] == 'mv' \
                    else 'gaussian'
            elif hparams['neural_type'] == 'spikes':
                hparams['noise_dist'] = 'poisson'
            signals = ['neural', 'labels']
            transforms = [neural_transform, None]
            paths = [neural_path, hdf5]

        elif mc == 'neural-arhmm':
            hparams['input_signal'] = 'neural'
            hparams['output_signal'] = 'arhmm_states'
            hparams['output_size'] = hparams['n_arhmm_states']
            hparams['noise_dist'] = 'categorical'
            arhmm_transform, arhmm_path = get_transforms_paths(
                'arhmm_states', hparams, sess_id=sess_id, check_splits=check_splits)
            signals = ['neural', 'arhmm_states']
            transforms = [neural_transform, arhmm_transform]
            paths = [neural_path, arhmm_path]

        elif mc == 'arhmm-neural':
            hparams['input_signal'] = 'arhmm_states'
            hparams['output_signal'] = 'neural'
            hparams['output_size'] = None
            if hparams['neural_type'] == 'ca':
                hparams['noise_dist'] = 'gaussian-full' if hparams['model_type'][-2:] == 'mv' \
                    else 'gaussian'
            elif hparams['neural_type'] == 'spikes':
                hparams['noise_dist'] = 'poisson'
            arhmm_transform, arhmm_path = get_transforms_paths(
                'arhmm_states', hparams, sess_id=sess_id, check_splits=check_splits)
            # decoder inputs must be (time, K) one-hot: the reference ships a
            # MakeOneHot transform but never wires it in, leaving its
            # states->neural path broken on raw int states
            from behavenet_tpu.data.transforms import Compose, MakeOneHot
            onehot = MakeOneHot(n_classes=hparams.get('n_arhmm_states'))
            arhmm_transform = Compose([arhmm_transform, onehot]) \
                if arhmm_transform else onehot
            signals = ['neural', 'arhmm_states']
            transforms = [neural_transform, arhmm_transform]
            paths = [neural_path, arhmm_path]

        elif mc in ('arhmm', 'hmm'):
            ae_transform, ae_path = get_transforms_paths(
                'ae_latents', hparams, sess_id=sess_id, check_splits=check_splits)
            signals, transforms, paths = ['ae_latents'], [ae_transform], [ae_path]
            if hparams.get('load_videos', False):
                signals.append('images')
                transforms.append(None)
                paths.append(hdf5)
            if hparams.get('use_output_mask', False):
                signals.append('masks')
                transforms.append(None)
                paths.append(hdf5)

        elif mc in ('arhmm-labels', 'hmm-labels'):
            signals, transforms, paths = ['labels'], [None], [hdf5]
            if hparams.get('load_videos', False):
                signals.append('images')
                transforms.append(None)
                paths.append(hdf5)
            if hparams.get('use_output_mask', False):
                signals.append('masks')
                transforms.append(None)
                paths.append(hdf5)

        elif mc == 'bayesian-decoding':
            ae_transform, ae_path = get_transforms_paths(
                'ae_latents', hparams, sess_id=sess_id, check_splits=check_splits)
            arhmm_transform, arhmm_path = get_transforms_paths(
                'arhmm_states', hparams, sess_id=sess_id, check_splits=check_splits)
            neural_ae_transform, neural_ae_path = get_transforms_paths(
                'neural_ae_predictions', hparams, None, check_splits=check_splits)
            neural_arhmm_transform, neural_arhmm_path = get_transforms_paths(
                'neural_arhmm_predictions', hparams, None, check_splits=check_splits)
            signals = ['ae_latents', 'ae_predictions', 'arhmm_predictions', 'arhmm_states']
            transforms = [ae_transform, neural_ae_transform, neural_arhmm_transform,
                          arhmm_transform]
            paths = [ae_path, neural_ae_path, neural_arhmm_path, arhmm_path]
            if hparams.get('load_videos', False):
                signals.append('images')
                transforms.append(None)
                paths.append(hdf5)
            if hparams.get('use_output_mask', False):
                signals.append('masks')
                transforms.append(None)
                paths.append(hdf5)

        elif mc == 'labels-images':
            hparams['input_signal'] = 'labels'
            hparams['output_signal'] = 'images'
            signals = ['images', 'labels']
            transforms = [None, None]
            paths = [hdf5, hdf5]
            if hparams.get('use_output_mask', False):
                signals.append('masks')
                transforms.append(None)
                paths.append(hdf5)

        elif mc in ('labels', 'labels_sc'):
            signals, transforms, paths = [mc], [None], [hdf5]
            if hparams.get('use_label_mask', False):
                signals.append('labels_masks')
                transforms.append(None)
                paths.append(hdf5)

        elif mc == 'labels_masks':
            signals, transforms, paths = [mc], [None], [hdf5]

        else:
            raise ValueError('"%s" is an invalid model_class' % mc)

        signals_list.append(signals)
        transforms_list.append(transforms)
        paths_list.append(paths)

    return hparams, signals_list, transforms_list, paths_list


def build_data_generator(hparams, sess_ids, export_csv=True):
    """Build a (multi-)session data generator from hparams (reference :342)."""
    from behavenet_tpu.data.generator import (
        ConcatSessionsGenerator, ConcatSessionsGeneratorMulti)
    from behavenet_tpu.fitting.experiment import export_session_info_to_csv
    hparams, signals, transforms, paths = get_data_generator_inputs(hparams, sess_ids)
    if hparams.get('trial_splits', None) is not None:
        trs = [int(tr) for tr in hparams['trial_splits'].split(';')]
        trial_splits = {'train_tr': trs[0], 'val_tr': trs[1], 'test_tr': trs[2],
                        'gap_tr': trs[3]}
    else:
        trial_splits = None
    if hparams.get('n_sessions_per_batch', 1) == 1:
        data_generator = ConcatSessionsGenerator(
            hparams['data_dir'], sess_ids,
            signals_list=signals, transforms_list=transforms, paths_list=paths,
            device=hparams.get('device', 'tpu'), as_numpy=hparams.get('as_numpy', True),
            batch_load=hparams.get('batch_load', True), rng_seed=hparams['rng_seed_data'],
            trial_splits=trial_splits, train_frac=hparams.get('train_frac', 1.0))
    else:
        data_generator = ConcatSessionsGeneratorMulti(
            hparams['data_dir'], sess_ids,
            signals_list=signals, transforms_list=transforms, paths_list=paths,
            device=hparams.get('device', 'tpu'), as_numpy=hparams.get('as_numpy', True),
            batch_load=hparams.get('batch_load', True), rng_seed=hparams['rng_seed_data'],
            trial_splits=trial_splits, train_frac=hparams.get('train_frac', 1.0),
            n_sessions_per_batch=hparams['n_sessions_per_batch'])
    if export_csv:
        export_session_info_to_csv(os.path.join(
            hparams['expt_dir'], 'version_%i' % hparams['version']), sess_ids)
    return data_generator


def check_same_training_split(model_path, hparams):
    """Ensure data rng seed and trial splits match an upstream model (reference :397)."""
    import_params_file = os.path.join(os.path.dirname(model_path), 'meta_tags.pkl')
    with open(import_params_file, 'rb') as f:
        import_params = pickle.load(f)
    if import_params['rng_seed_data'] != hparams['rng_seed_data'] and \
            hparams.get('check_rng_seed_data', True):
        raise ValueError('Different data random seed from existing models')
    if import_params['trial_splits'] != hparams['trial_splits'] and \
            hparams.get('check_trial_splits', True):
        raise ValueError('Different trial split from existing models')


def get_transforms_paths(data_type, hparams, sess_id, check_splits=True):
    """Resolve session-specific transform + artifact path (reference :412-605)."""
    from behavenet_tpu.data.transforms import (
        BlockShuffle, Compose, MotionEnergy, SelectIdxs, Threshold, ZScore)
    from behavenet_tpu.fitting.experiment import get_best_model_version, get_expt_dir

    hparams_ = {key: hparams[key] for key in ['lab', 'expt', 'animal', 'session']}
    if sess_id is None:
        sess_id = hparams_

    sess_id_str = '%s_%s_%s_%s_' % (
        sess_id['lab'], sess_id['expt'], sess_id['animal'], sess_id['session'])

    if data_type == 'neural':
        check_splits = False
        path = os.path.join(
            hparams['data_dir'], sess_id['lab'], sess_id['expt'], sess_id['animal'],
            sess_id['session'], 'data.hdf5')
        transforms_ = []
        if hparams.get('subsample_method', 'none') != 'none':
            sampling = hparams['subsample_method']
            idxs_name = hparams['subsample_idxs_name']
            idxs_dict = get_region_list(hparams)
            if sampling == 'single':
                idxs = idxs_dict[idxs_name]
            elif sampling == 'loo':
                idxs = np.concatenate(
                    [v for k, v in idxs_dict.items() if k != idxs_name])
            else:
                raise ValueError('"%s" is an invalid index sampling option' % sampling)
            transforms_.append(SelectIdxs(idxs, '%s-%s' % (idxs_name, sampling)))
        if hparams['neural_type'] == 'spikes':
            if hparams['neural_thresh'] > 0:
                transforms_.append(Threshold(
                    threshold=hparams['neural_thresh'], bin_size=hparams['neural_bin_size']))
        elif hparams['neural_type'] == 'ca':
            if hparams['model_type'][-6:] != 'neural':
                transforms_.append(ZScore())
        elif hparams['neural_type'] == 'ca-zscored':
            pass
        else:
            raise ValueError('"%s" is an invalid neural type' % hparams['neural_type'])
        transform = None if len(transforms_) == 0 else Compose(transforms_)

    elif data_type in ('ae_latents', 'latents', 'ae_latents_me', 'latents_me'):
        transform = MotionEnergy() if data_type.endswith('_me') else None
        if 'ae_latents_file' in hparams:
            path = hparams['ae_latents_file']
        else:
            ae_dir = get_expt_dir(
                hparams, model_class=hparams['ae_model_class'],
                expt_name=hparams['ae_experiment_name'],
                model_type=hparams['ae_model_type'])
            if 'ae_version' in hparams and hparams['ae_version'] != 'best':
                if isinstance(hparams['ae_version'], str):
                    hparams['ae_version'] = int(hparams['ae_version'])
                ae_version = 'version_%i' % hparams['ae_version']
            else:
                ae_version = 'version_%i' % get_best_model_version(ae_dir, 'val_loss')[0]
            path = os.path.join(ae_dir, ae_version, '%slatents.pkl' % sess_id_str)

    elif data_type in ('arhmm_states', 'states'):
        if hparams.get('shuffle_rng_seed') is not None:
            transform = BlockShuffle(hparams['shuffle_rng_seed'])
        else:
            transform = None
        if 'arhmm_states_file' in hparams:
            path = hparams['arhmm_states_file']
        else:
            arhmm_dir = get_expt_dir(
                hparams, model_class='arhmm', expt_name=hparams['arhmm_experiment_name'])
            if 'arhmm_version' in hparams and isinstance(hparams['arhmm_version'], int):
                arhmm_version = 'version_%i' % hparams['arhmm_version']
            else:
                arhmm_version = 'version_%i' % get_best_model_version(
                    arhmm_dir, 'val_loss', best_def='min')[0]
            path = os.path.join(arhmm_dir, arhmm_version, '%sstates.pkl' % sess_id_str)

    elif data_type in ('neural_ae_predictions', 'ae_predictions'):
        transform = None
        if 'ae_predictions_file' in hparams:
            path = hparams['ae_predictions_file']
        else:
            neural_ae_dir = get_expt_dir(
                hparams, model_class='neural-ae',
                expt_name=hparams['neural_ae_experiment_name'],
                model_type=hparams['neural_ae_model_type'])
            if 'neural_ae_version' in hparams and isinstance(hparams['neural_ae_version'], int):
                neural_ae_version = 'version_%i' % hparams['neural_ae_version']
            else:
                neural_ae_version = 'version_%i' % get_best_model_version(
                    neural_ae_dir, 'val_loss')[0]
            path = os.path.join(
                neural_ae_dir, neural_ae_version, '%spredictions.pkl' % sess_id_str)

    elif data_type in ('neural_arhmm_predictions', 'arhmm_predictions'):
        transform = None
        if 'arhmm_predictions_file' in hparams:
            path = hparams['arhmm_predictions_file']
        else:
            neural_arhmm_dir = get_expt_dir(
                hparams, model_class='neural-arhmm',
                expt_name=hparams['neural_arhmm_experiment_name'],
                model_type=hparams['neural_arhmm_model_type'])
            if 'neural_arhmm_version' in hparams and \
                    isinstance(hparams['neural_arhmm_version'], int):
                neural_arhmm_version = 'version_%i' % hparams['neural_arhmm_version']
            else:
                neural_arhmm_version = 'version_%i' % get_best_model_version(
                    neural_arhmm_dir, 'val_loss')[0]
            path = os.path.join(
                neural_arhmm_dir, neural_arhmm_version, '%spredictions.pkl' % sess_id_str)

    else:
        raise ValueError('"%s" is an invalid data_type' % data_type)

    if check_splits:
        check_same_training_split(path, hparams)

    return transform, path


def load_labels_like_latents(hparams, sess_ids, sess_idx, data_key='labels'):
    """Load labels from hdf5 in the latents-pickle dict format (reference :608)."""
    import copy

    hparams_new = copy.deepcopy(hparams)
    hparams_new['model_class'] = data_key
    hparams_new['device'] = 'cpu'
    hparams_new['as_numpy'] = True
    hparams_new['batch_load'] = False
    hparams_new['n_sessions_per_batch'] = 1

    data_generator = build_data_generator(hparams_new, sess_ids, export_csv=False)
    dtypes = data_generator._dtypes

    labels = [np.array([]) for _ in range(data_generator.datasets[sess_idx].n_trials)]
    for dtype in dtypes:
        data_generator.reset_iterators(dtype)
        for _ in range(data_generator.n_tot_batches[dtype]):
            data, sess = data_generator.next_batch(dtype)
            if sess == sess_idx:
                labels[data['batch_idx']] = data[data_key]
    return {
        'latents': labels,  # named 'latents' to match analysis code
        'trials': data_generator.datasets[sess_idx].batch_idxs}


def get_region_list(hparams, group_0='regions', group_1='indxs'):
    """Brain-region index groups from the HDF5 store (reference :654)."""
    import h5py

    if not isinstance(hparams, dict):
        hparams = vars(hparams)

    # a None value (standard configs carry the key) falls back to the
    # defaults rather than overriding them (reference :678-679 raises here)
    group_0 = hparams.get('subsample_idxs_group_0') or group_0
    group_1 = hparams.get('subsample_idxs_group_1') or group_1

    data_file = os.path.join(
        hparams['data_dir'], hparams['lab'], hparams['expt'], hparams['animal'],
        hparams['session'], 'data.hdf5')

    with h5py.File(data_file, 'r', libver='latest', swmr=True) as f:
        groups_0 = list(f)
        if group_0 not in groups_0:
            raise ValueError('"{}" is not a group in {}; must choose from {}'.format(
                group_0, data_file, groups_0))
        groups_1 = list(f[group_0])
        if len(groups_1) == 0:
            raise ValueError('No index groups found in "%s" group of %s' % (group_0, data_file))
        if group_1 not in groups_1:
            raise ValueError('"{}" is not a group in {} group; must choose from {}'.format(
                group_1, group_0, groups_1))
        idx_keys = list(f[group_0][group_1])
        idxs = {idx: np.ravel(f[group_0][group_1][idx][()]) for idx in idx_keys}

    return idxs
