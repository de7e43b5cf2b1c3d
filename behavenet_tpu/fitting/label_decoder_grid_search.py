"""CLI: fit labels -> images conv decoders over a hyperparameter grid.

Usage (identical to the reference behavenet/fitting/label_decoder_grid_search.py):

    python -m behavenet_tpu.fitting.label_decoder_grid_search \
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
from behavenet_tpu.models import ConvDecoder


def main(hparams, *args):
    """Fit one labels-images grid trial (reference label_decoder_grid_search.py:19-92)."""
    if not isinstance(hparams, dict):
        hparams = vars(hparams)

    if hparams['model_type'] == 'conv':
        hparams = {**hparams, **hparams['architecture_params']}

    print_hparams(hparams)

    hparams, sess_ids, exp = create_experiment(hparams)
    if hparams is None:
        print('Experiment exists! Aborting fit')
        return

    data_generator = build_data_generator(hparams, sess_ids)

    print('constructing model...', end='')
    hparams['n_datasets'] = len(sess_ids)
    data, _ = data_generator.next_batch('train')
    hparams['n_labels'] = int(data['labels'].shape[1])
    data_generator.reset_iterators('train')
    model = ConvDecoder(hparams)
    model.version = exp.version

    hparams['training_completed'] = False
    export_hparams(hparams, exp)
    print('done')

    best_params = fit(hparams, model, data_generator, exp, method='conv-decoder')

    if hparams.get('export_train_plots', False):
        print('creating training plots...', end='')
        version_dir = os.path.join(hparams['expt_dir'], 'version_%i' % hparams['version'])
        save_file = os.path.join(version_dir, 'loss_training')
        export_train_plots(hparams, 'train', save_file=save_file)
        save_file = os.path.join(version_dir, 'loss_validation')
        export_train_plots(hparams, 'val', save_file=save_file)
        print('done')

    from behavenet_tpu.models.base import params_finite
    ok = best_params is not None and params_finite(best_params)
    if not ok:
        print('WARNING: fit produced no finite best-val parameters; '
              'not marking experiment as completed')
    hparams['training_completed'] = ok
    export_hparams(hparams, exp)

    _clean_dir(hparams)


def cli():
    """Console entry point (``behavenet-label-decoder-grid-search``)."""
    hyperparams = get_all_params('grid_search')
    run_grid_search(main, hyperparams)


if __name__ == '__main__':
    cli()
