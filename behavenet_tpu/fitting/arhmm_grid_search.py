"""CLI: fit (AR)HMM segmentation models over a hyperparameter grid.

Usage (identical to the reference behavenet/fitting/arhmm_grid_search.py):

    python -m behavenet_tpu.fitting.arhmm_grid_search \
        --data_config d.json --model_config m.json \
        --training_config t.json --compute_config c.json

The ssm dependency is replaced by the in-repo JAX engine
(:mod:`behavenet_tpu.models.arhmm`), with identical behavior: epoch-0 eval
of the initialized model, one-EM-iteration epochs with per-epoch train/val
negative log-likelihood logging, relative-tolerance early stopping, per-trial
test LLs, usage-sorted state permutation, and a pickled model in
``best_val_model.pt``.
"""

import os
import pickle

import numpy as np

from behavenet_tpu.data.utils import build_data_generator
from behavenet_tpu.fitting.eval import export_states, export_train_plots
from behavenet_tpu.fitting.experiment import (
    _clean_dir, create_experiment, export_hparams)
from behavenet_tpu.fitting.hyperparams import get_all_params, print_hparams, run_grid_search
from behavenet_tpu.models.arhmm import ARHMM
from behavenet_tpu.plotting.arhmm_utils import get_latent_arrays_by_dtype


def main(hparams, *args):
    """Fit one ARHMM grid trial (reference arhmm_grid_search.py:20-234)."""
    if not isinstance(hparams, dict):
        hparams = vars(hparams)

    if hparams['transitions'] == 'sticky' and hparams['kappa'] == 0:
        print('Cannot fit sticky transitions with kappa=0! Aborting fit')
        return
    if hparams['transitions'] != 'sticky' and hparams['kappa'] > 0:
        print('Cannot fit %s transitions with kappa>0! Aborting fit' % hparams['transitions'])
        return

    print_hparams(hparams)

    hparams, sess_ids, exp = create_experiment(hparams)
    if hparams is None:
        print('Experiment exists! Aborting fit')
        return

    data_generator = build_data_generator(hparams, sess_ids)

    # collect all observations into memory
    n_datasets = len(data_generator)
    print('collecting observations from data generator...', end='')
    data_key = 'ae_latents'
    if hparams['model_class'].find('labels') > -1:
        data_key = 'labels'
    latents, trial_idxs = get_latent_arrays_by_dtype(
        data_generator, sess_idxs=list(range(n_datasets)), data_key=data_key)
    obs_dim = latents['train'][0].shape[1]
    hparams['total_train_length'] = int(np.sum([z.shape[0] for z in latents['train']]))
    latents_sess = {d: None for d in range(n_datasets)}
    trial_idxs_sess = {d: None for d in range(n_datasets)}
    for d in range(n_datasets):
        latents_sess[d], trial_idxs_sess[d] = get_latent_arrays_by_dtype(
            data_generator, sess_idxs=d, data_key=data_key)
    print('done')

    if hparams['model_class'] in ('arhmm', 'hmm'):
        hparams['ae_model_path'] = os.path.dirname(
            data_generator.datasets[0].paths['ae_latents'])
        hparams['ae_model_latents_file'] = data_generator.datasets[0].paths['ae_latents']

    if hparams['n_arhmm_lags'] > 0:
        if hparams['model_class'][:5] != 'arhmm':
            raise ValueError('Must specify model_class as arhmm when using AR lags')
    else:
        if hparams['model_class'][:3] != 'hmm':
            raise ValueError('Must specify model_class as hmm when using 0 AR lags')

    # observation model string (reference :84-105)
    if hparams['noise_type'] == 'gaussian':
        obs_type = 'ar' if hparams['n_arhmm_lags'] > 0 else 'gaussian'
    elif hparams['noise_type'] == 'studentst':
        obs_type = 'robust_ar' if hparams['n_arhmm_lags'] > 0 else 'studentst'
    elif hparams['noise_type'] == 'diagonal_gaussian':
        obs_type = 'diagonal_ar' if hparams['n_arhmm_lags'] > 0 else 'diagonal_gaussian'
    elif hparams['noise_type'] == 'diagonal_studentst':
        obs_type = 'diagonal_robust_ar' if hparams['n_arhmm_lags'] > 0 \
            else 'diagonal_studentst'
    else:
        raise ValueError('%s is not a valid noise type' % hparams['noise_type'])

    if hparams['transitions'] not in ('stationary', 'standard', 'sticky', 'recurrent',
                                      'recurrent_only'):
        raise ValueError('%s is not a valid transition type' % hparams['transitions'])
    transitions = 'stationary' if hparams['transitions'] == 'standard' \
        else hparams['transitions']

    print('constructing model...', end='')
    np.random.seed(hparams['rng_seed_model'])
    hmm = ARHMM(
        hparams['n_arhmm_states'], obs_dim,
        lags=hparams['n_arhmm_lags'], observations=obs_type,
        transitions=transitions, kappa=hparams.get('kappa', 0),
        rng_seed=hparams['rng_seed_model'],
        parallel_scan=bool(hparams.get('parallel_scan', False)),
        # 'float64' runs the full EM in f64 (CPU parity studies; needs
        # JAX_ENABLE_X64=1 in the environment)
        dtype=hparams.get('em_dtype', 'float32'))
    hmm.initialize(latents['train'], localize=hparams['n_arhmm_lags'] > 0)
    hparams['training_completed'] = False
    export_hparams(hparams, exp)
    hmm.hparams = hparams
    print('done')

    # precompute normalizers
    n_datapoints = {}
    n_datapoints_sess = {}
    for dtype in ('train', 'val', 'test'):
        n_datapoints[dtype] = int(np.vstack(latents[dtype]).size)
        n_datapoints_sess[dtype] = {}
        for d in range(n_datasets):
            n_datapoints_sess[dtype][d] = int(np.vstack(latents_sess[d][dtype]).size)

    # data-parallel EM over all local devices (trials sharded, M-step
    # statistics psum over ICI); a single device degenerates to plain EM
    mesh = None
    import jax
    if len(jax.devices()) > 1:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()), ('dp',))
        print('sharding EM over %i devices' % len(jax.devices()))

    # logging scopes: aggregate row (dataset=-1) + one row per session.
    # (reference arhmm_grid_search.py:164-198 contract: epoch 0 logs the
    # initialized model; each epoch = one EM iteration followed by
    # per-datapoint-normalized train/val negative LLs; early stop on the
    # relative val-LL change after epoch 10.)
    scopes = [(-1, latents, {k: n_datapoints[k] for k in n_datapoints})]
    scopes += [(d, latents_sess[d],
                {k: n_datapoints_sess[k][d] for k in n_datapoints_sess})
               for d in range(n_datasets)]

    def neg_ll_rows(epoch):
        rows = []
        for d, arrs, norms in scopes:
            rows.append({
                'epoch': epoch, 'dataset': d, 'trial': -1,
                'tr_loss': -hmm.log_likelihood(arrs['train']) / norms['train'],
                'val_loss': -hmm.log_likelihood(arrs['val']) / norms['val']})
        return rows

    tolerance = hparams.get('arhmm_es_tol', 0)
    val_ll_hist = []
    epoch = 0
    for epoch in range(hparams['n_iters'] + 1):
        print('epoch %03i/%03i' % (epoch, hparams['n_iters']))
        if epoch > 0:
            hmm.fit(latents['train'], method='em', num_iters=1, initialize=False,
                    mesh=mesh)
        rows = neg_ll_rows(epoch)
        for row in rows:
            exp.log(row)
        val_ll_hist.append(rows[0]['val_loss'])
        if epoch > 10 and len(val_ll_hist) >= 2 and np.abs(
                (val_ll_hist[-1] - val_ll_hist[-2]) / val_ll_hist[-1]) < tolerance:
            print('relative val-LL change below tolerance=%1.2f; stopping EM'
                  % tolerance)
            break

    # per-trial test LLs
    for d in range(n_datasets):
        for i, b in enumerate(trial_idxs_sess[d]['test']):
            n = latents_sess[d]['test'][i].size
            test_ll = -hmm.log_likelihood(latents_sess[d]['test'][i]) / n
            exp.log({'epoch': epoch, 'dataset': d, 'test_loss': test_ll, 'trial': int(b)})
    exp.save()

    # usage-sort states (reference :200-204)
    zs = [hmm.most_likely_states(x) for x in latents['train']]
    usage = np.bincount(np.concatenate(zs), minlength=hmm.K)
    perm = np.argsort(usage)[::-1]
    hmm.permute(perm)

    filepath = os.path.join(
        hparams['expt_dir'], 'version_%i' % exp.version, 'best_val_model.pt')
    with open(filepath, 'wb') as f:
        pickle.dump(hmm, f)

    if hparams.get('export_states', False):
        export_states(hparams, data_generator, hmm)

    if hparams.get('export_train_plots', False):
        print('creating training plots...', end='')
        version_dir = os.path.join(hparams['expt_dir'], 'version_%i' % hparams['version'])
        save_file = os.path.join(version_dir, 'loss_training')
        export_train_plots(hparams, 'train', loss_type='ll', save_file=save_file)
        save_file = os.path.join(version_dir, 'loss_validation')
        export_train_plots(hparams, 'val', loss_type='ll', save_file=save_file)
        print('done')

    # a diverged fit (non-finite params) is not a completed experiment;
    # leaving the flag False lets a re-run replace it instead of deduping
    finite = all(np.isfinite(np.asarray(v)).all() for v in hmm.params.values())
    if not finite:
        print('WARNING: fit produced non-finite parameters; '
              'not marking experiment as completed')
    hparams['training_completed'] = bool(finite)
    export_hparams(hparams, exp)

    _clean_dir(hparams)


def cli():
    """Console entry point (``behavenet-arhmm-grid-search``)."""
    hyperparams = get_all_params('grid_search')
    run_grid_search(main, hyperparams)


if __name__ == '__main__':
    cli()
