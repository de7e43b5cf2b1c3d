"""ARHMM analysis utilities: state-run extraction, durations, model loading.

Behavioral contract follows the reference (behavenet/plotting/arhmm_utils.py);
``get_latent_arrays_by_dtype`` is also used by the ARHMM fitting path
(reference arhmm_grid_search.py:58-68). Movie/plot functions live further
down and consume matplotlib only at call time.
"""

import os
import pickle

import numpy as np

__all__ = ['get_discrete_chunks', 'get_state_durations', 'get_latent_arrays_by_dtype',
           'get_model_latents_states']


def get_discrete_chunks(states, include_edges=True):
    """Find occurrences of each discrete state (reference :24-69).

    Returns a list of length n_states; entry k is an array of
    [trial, start_idx, end_idx] rows for each run of state k.
    """
    max_state = max([max(x) for x in states])
    indexing_list = [[] for _ in range(max_state + 1)]

    for i_chunk, chunk in enumerate(states):
        chunk = np.pad(chunk, (1, 1), mode='constant', constant_values=-1)
        split_indices = np.where(np.ediff1d(chunk) != 0)[0]
        for i in range(len(split_indices) - 1):
            which_state = chunk[split_indices[i] + 1]
            if not include_edges:
                if split_indices[i] != 0 and split_indices[i + 1] != (len(chunk) - 2):
                    indexing_list[which_state].append(
                        [i_chunk, split_indices[i], split_indices[i + 1]])
            else:
                indexing_list[which_state].append(
                    [i_chunk, split_indices[i], split_indices[i + 1]])

    return [np.asarray(indexing_list[i]) for i in range(max_state + 1)]


def get_state_durations(latents, hmm, include_edges=True):
    """Frame count of every state run (reference :71-100)."""
    if hmm.K == 1:
        return []
    states = [np.asarray(hmm.most_likely_states(x)) for x in latents if len(x) > 0]
    state_indices = get_discrete_chunks(states, include_edges=include_edges)
    durations = []
    for i_state in range(len(state_indices)):
        if len(state_indices[i_state]) > 0:
            durations.append(np.concatenate(np.diff(state_indices[i_state][:, 1:3], 1)))
        else:
            durations.append(np.array([]))
    return durations


def get_latent_arrays_by_dtype(data_generator, sess_idxs=0, data_key='ae_latents'):
    """Collect per-dtype trial arrays from the data generator (reference :102-132)."""
    if isinstance(sess_idxs, int):
        sess_idxs = [sess_idxs]
    dtypes = ['train', 'val', 'test']
    latents = {key: [] for key in dtypes}
    trial_idxs = {key: [] for key in dtypes}
    for sess_idx in sess_idxs:
        dataset = data_generator.datasets[sess_idx]
        for data_type in dtypes:
            curr_idxs = dataset.batch_idxs[data_type]
            trial_idxs[data_type] += list(curr_idxs)
            latents[data_type] += [
                np.asarray(dataset[int(i_trial)][data_key]) for i_trial in curr_idxs]
    return latents, trial_idxs


def get_model_latents_states(hparams, version, sess_idx=0, return_samples=0,
                             cond_sampling=False, dtype='test', dtypes=('train', 'val', 'test'),
                             rng_seed=0):
    """Load an ARHMM + its latents and compute states/samples (reference :134-251).

    Returns dict with keys 'model', 'latents_dict', 'states_dict',
    'trial_idxs_dict', 'latents_gen' (unconditional or conditional samples).
    """
    from behavenet_tpu.data.utils import get_transforms_paths
    from behavenet_tpu.fitting.experiment import (
        experiment_exists, get_best_model_version, get_expt_dir, get_session_dir)
    from behavenet_tpu.models.arhmm import ARHMM

    hparams['session_dir'], sess_ids = get_session_dir(
        hparams, session_source=hparams.get('all_source', 'save'))
    hparams['expt_dir'] = get_expt_dir(hparams)

    # default to latest version if not specified
    if version == 'best':
        version = get_best_model_version(hparams['expt_dir'], 'val_loss', best_def='min')[0]
    else:
        _, version = experiment_exists(hparams, which_version=True)

    # load model
    model_file = os.path.join(hparams['expt_dir'], 'version_%i' % version, 'best_val_model.pt')
    with open(model_file, 'rb') as f:
        hmm = pickle.load(f)

    # load latents
    if hparams['model_class'].find('labels') > -1:
        from behavenet_tpu.data.utils import load_labels_like_latents
        all_latents = load_labels_like_latents(hparams, sess_ids, sess_idx)
    else:
        _, latents_file = get_transforms_paths(
            'ae_latents', hparams, sess_ids[sess_idx], check_splits=False)
        with open(latents_file, 'rb') as f:
            all_latents = pickle.load(f)

    # collect trial indices/latents/states by dtype
    trial_idxs = {}
    latents = {}
    states = {}
    for data_type in dtypes:
        trial_idxs[data_type] = np.asarray(all_latents['trials'][data_type])
        latents[data_type] = [all_latents['latents'][i] for i in trial_idxs[data_type]]
        states[data_type] = [
            np.asarray(hmm.most_likely_states(x)) for x in latents[data_type]]

    # generate samples
    states_gen = []
    latents_gen = []
    if return_samples > 0:
        import jax
        key = jax.random.PRNGKey(rng_seed)
        if cond_sampling:
            n_latents = latents[dtype][0].shape[1]
            for i in range(return_samples):
                key, sub = jax.random.split(key)
                z = states[dtype][i % len(states[dtype])]
                latents_gen.append(hmm.sample_x(z, key=sub))
                states_gen.append(z)
        else:
            T = len(states[dtype][0])
            for i in range(return_samples):
                key, sub = jax.random.split(key)
                zs, xs = hmm.sample(T, key=sub)
                states_gen.append(zs)
                latents_gen.append(xs)

    return {
        'model': hmm,
        'latents_dict': latents,
        'states_dict': states,
        'trial_idxs_dict': trial_idxs,
        'states_gen': states_gen,
        'latents_gen': latents_gen,
    }
