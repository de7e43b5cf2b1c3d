"""CLI: fit autoencoder-family models over a hyperparameter grid.

Usage (identical to the reference behavenet/fitting/ae_grid_search.py):

    python -m behavenet_tpu.fitting.ae_grid_search \
        --data_config d.json --model_config m.json \
        --training_config t.json --compute_config c.json
"""

import os

from behavenet_tpu.data.utils import build_data_generator
from behavenet_tpu.fitting.eval import export_train_plots
from behavenet_tpu.fitting.experiment import (
    _clean_dir, create_experiment, export_hparams)
from behavenet_tpu.fitting.hyperparams import get_all_params, print_hparams, run_grid_search
from behavenet_tpu.fitting.training import fit
from behavenet_tpu.models.aes import load_pretrained_ae


def main(hparams, *args):
    """Fit one grid trial (reference ae_grid_search.py:20-146)."""
    if not isinstance(hparams, dict):
        hparams = vars(hparams)

    if hparams['model_type'] == 'conv':
        # blend outer hparams with architecture hparams
        hparams = {**hparams['architecture_params'], **hparams}

    print_hparams(hparams)

    if hparams['model_type'] == 'conv' and hparams['n_ae_latents'] > hparams['max_latents']:
        raise ValueError('Number of latents higher than max latents, architecture will not work')

    hparams, sess_ids, exp = create_experiment(hparams)
    if hparams is None:
        print('Experiment exists! Aborting fit')
        return

    data_generator = build_data_generator(hparams, sess_ids)

    def set_n_labels(data_generator, hparams):
        data, _ = data_generator.next_batch('val')
        if isinstance(data, list):
            data = data[0]
        hparams['n_labels'] = int(data['labels'].shape[1])
        data_generator.reset_iterators('val')

    print('constructing model...', end='')
    hparams['n_datasets'] = len(sess_ids)
    mc = hparams['model_class']
    if mc == 'ae':
        from behavenet_tpu.models import AE as Model
    elif mc == 'vae':
        from behavenet_tpu.models import VAE as Model
    elif mc == 'beta-tcvae':
        from behavenet_tpu.models import BetaTCVAE as Model
    elif mc == 'ps-vae':
        from behavenet_tpu.models import PSVAE as Model
        set_n_labels(data_generator, hparams)
    elif mc == 'msps-vae':
        from behavenet_tpu.models import MSPSVAE as Model
        set_n_labels(data_generator, hparams)
    elif mc == 'cond-vae':
        from behavenet_tpu.models import ConditionalVAE as Model
        set_n_labels(data_generator, hparams)
    elif mc == 'cond-ae':
        from behavenet_tpu.models import ConditionalAE as Model
        set_n_labels(data_generator, hparams)
    elif mc == 'cond-ae-msp':
        from behavenet_tpu.models import AEMSP as Model
        set_n_labels(data_generator, hparams)
    else:
        raise NotImplementedError(
            'The model class "%s" is not currently implemented' % mc)
    model = Model(hparams)
    model.version = exp.version

    hparams['training_completed'] = False
    # drop non-picklable/bulky entries before export
    export_hparams(hparams, exp)
    print('done')

    best_params = fit(hparams, model, data_generator, exp, method='ae',
                      warm_start=lambda params: load_pretrained_ae(params, model, hparams))

    # a diverged fit is not a completed experiment (see arhmm_grid_search)
    from behavenet_tpu.models.base import params_finite
    ok = best_params is not None and params_finite(best_params)
    if not ok:
        print('WARNING: fit produced no finite best-val parameters; '
              'not marking experiment as completed')
    hparams['training_completed'] = ok
    export_hparams(hparams, exp)

    _clean_dir(hparams)

    if hparams.get('export_train_plots', False):
        print('creating training plots...', end='')
        version_dir = os.path.join(hparams['expt_dir'], 'version_%i' % hparams['version'])
        save_file = os.path.join(version_dir, 'loss_training')
        export_train_plots(hparams, 'train', save_file=save_file)
        save_file = os.path.join(version_dir, 'loss_validation')
        export_train_plots(hparams, 'val', save_file=save_file)
        print('done')


def main_group(trial_list):
    """Fit a group of vmappable grid trials in one program (shared stream).

    Reached via ``"vmap_trials": k`` in the compute JSON when the only
    hparams varying across trials are optimizer scalars / seeds / loss
    weights (fitting/vmap_grid.py group_vmappable). Per-trial experiment
    versions, metrics, checkpoints, and exports are identical to the
    sequential path; the k trials consume one disk->host->device stream.
    """
    from behavenet_tpu.fitting.vmap_grid import (
        fit_vmap_grid, group_resume_versions)

    # the CLI's resume_version is ONE int (the first trial's version), but
    # the grouped trials each own a version dir: after the first trial
    # reopens its version, the group checkpoint's signature maps the rest
    # back to THEIR versions (else every trial would reopen — and then
    # clobber — the same dir)
    resume_versions = None
    prepped = []
    for i, hparams in enumerate(trial_list):
        if not isinstance(hparams, dict):
            hparams = vars(hparams)
        if hparams['model_type'] == 'conv':
            hparams = {**hparams['architecture_params'], **hparams}
        if hparams['model_type'] == 'conv' and \
                hparams['n_ae_latents'] > hparams['max_latents']:
            raise ValueError('Number of latents higher than max latents')
        if resume_versions is not None:
            hparams['resume_version'] = resume_versions[i]
        hparams, sess_ids, exp = create_experiment(hparams)
        if hparams is None:
            print('Experiment exists! Skipping trial in vmap group')
            continue
        if i == 0 and len(trial_list) > 1 and \
                hparams.get('resume_version') is not None:
            resume_versions = group_resume_versions(
                hparams['expt_dir'], exp.version, len(trial_list))
        prepped.append((hparams, sess_ids, exp))
    if not prepped:
        return

    hp0, sess_ids, _ = prepped[0]
    data_generator = build_data_generator(hp0, sess_ids)

    def set_n_labels(hparams):
        data, _ = data_generator.next_batch('val')
        if isinstance(data, list):
            data = data[0]
        hparams['n_labels'] = int(data['labels'].shape[1])
        data_generator.reset_iterators('val')

    mc = hp0['model_class']
    if mc == 'ae':
        from behavenet_tpu.models import AE as Model
    elif mc == 'vae':
        from behavenet_tpu.models import VAE as Model
    elif mc == 'beta-tcvae':
        from behavenet_tpu.models import BetaTCVAE as Model
    elif mc == 'ps-vae':
        from behavenet_tpu.models import PSVAE as Model
    elif mc == 'msps-vae':
        from behavenet_tpu.models import MSPSVAE as Model
    else:
        raise NotImplementedError(
            'vmap_trials does not support model class "%s"' % mc)

    models, hparams_list, exps = [], [], []
    for hparams, _, exp in prepped:
        hparams['n_datasets'] = len(sess_ids)
        if mc != 'ae':
            set_n_labels(hparams)
        model = Model(hparams)
        model.version = exp.version
        models.append(model)
        hparams['training_completed'] = False
        export_hparams(hparams, exp)
        hparams_list.append(hparams)
        exps.append(exp)
    print('fitting %i trials in one vmapped program' % len(models))

    best = fit_vmap_grid(
        hparams_list, models, data_generator, exps, method='ae',
        warm_fn=lambda p, m, h: load_pretrained_ae(p, m, h))

    from behavenet_tpu.models.base import params_finite
    for hparams, exp, bp in zip(hparams_list, exps, best):
        ok = bp is not None and params_finite(bp)
        if not ok:
            print('WARNING: trial produced no finite best-val parameters; '
                  'not marking experiment as completed')
        hparams['training_completed'] = ok
        export_hparams(hparams, exp)
        _clean_dir(hparams)
        if hparams.get('export_train_plots', False):
            version_dir = os.path.join(
                hparams['expt_dir'], 'version_%i' % hparams['version'])
            export_train_plots(hparams, 'train',
                               save_file=os.path.join(version_dir, 'loss_training'))
            export_train_plots(hparams, 'val',
                               save_file=os.path.join(version_dir, 'loss_validation'))


def cli():
    """Console entry point (``behavenet-ae-grid-search``)."""
    hyperparams = get_all_params('grid_search')
    run_grid_search(main, hyperparams, group_fn=main_group)


if __name__ == '__main__':
    cli()
