"""CLI: fit neural <-> latents/states/labels decoders over a hyperparameter grid.

Usage (identical to the reference behavenet/fitting/decoder_grid_search.py):

    python -m behavenet_tpu.fitting.decoder_grid_search \
        --data_config d.json --model_config m.json \
        --training_config t.json --compute_config c.json
"""

import os
import pickle

from behavenet_tpu.data.utils import build_data_generator
from behavenet_tpu.fitting.experiment import (
    _clean_dir, create_experiment, export_hparams)
from behavenet_tpu.fitting.hyperparams import get_all_params, print_hparams, run_grid_search
from behavenet_tpu.fitting.training import fit
from behavenet_tpu.models import Decoder


def main(hparams, *args):
    """Fit one decoder grid trial (reference decoder_grid_search.py:19-111)."""
    if not isinstance(hparams, dict):
        hparams = vars(hparams)

    print_hparams(hparams)

    hparams, sess_ids, exp = create_experiment(hparams)
    if hparams is None:
        print('Experiment exists! Aborting fit')
        return

    data_generator = build_data_generator(hparams, sess_ids)

    ex_trial = int(data_generator.datasets[0].batch_idxs['train'][0])
    i_sig = hparams['input_signal']
    o_sig = hparams['output_signal']
    mc = hparams['model_class']

    if mc == 'neural-arhmm':
        hparams['input_size'] = data_generator.datasets[0][ex_trial][i_sig].shape[1]
        hparams['output_size'] = hparams['n_arhmm_states']
    elif mc == 'arhmm-neural':
        hparams['input_size'] = hparams['n_arhmm_states']
        hparams['output_size'] = data_generator.datasets[0][ex_trial][o_sig].shape[1]
    elif mc in ('neural-ae', 'neural-ae-me'):
        hparams['input_size'] = data_generator.datasets[0][ex_trial][i_sig].shape[1]
        hparams['output_size'] = hparams['n_ae_latents']
    elif mc == 'ae-neural':
        hparams['input_size'] = hparams['n_ae_latents']
        hparams['output_size'] = data_generator.datasets[0][ex_trial][o_sig].shape[1]
    elif mc == 'neural-labels':
        hparams['input_size'] = data_generator.datasets[0][ex_trial][i_sig].shape[1]
        hparams['output_size'] = hparams['n_labels']
    elif mc == 'labels-neural':
        hparams['input_size'] = hparams['n_labels']
        hparams['output_size'] = data_generator.datasets[0][ex_trial][o_sig].shape[1]
    else:
        raise ValueError('%s is an invalid model class' % mc)

    # record upstream artifact paths for downstream chaining
    if mc in ('neural-ae', 'neural-ae-me', 'ae-neural'):
        hparams['ae_model_path'] = os.path.dirname(
            data_generator.datasets[0].paths['ae_latents'])
        hparams['ae_model_latents_file'] = data_generator.datasets[0].paths['ae_latents']
    elif mc in ('neural-arhmm', 'arhmm-neural'):
        hparams['arhmm_model_path'] = os.path.dirname(
            data_generator.datasets[0].paths['arhmm_states'])
        hparams['arhmm_model_states_file'] = data_generator.datasets[0].paths['arhmm_states']
        with open(os.path.join(hparams['arhmm_model_path'], 'meta_tags.pkl'), 'rb') as f:
            tags = pickle.load(f)
        hparams['ae_model_latents_file'] = tags.get('ae_model_latents_file')

    print('constructing model...', end='')
    model = Decoder(hparams)
    model.version = exp.version

    hparams['training_completed'] = False
    export_hparams(hparams, exp)
    print('done')

    best_params = fit(hparams, model, data_generator, exp, method='nll')

    from behavenet_tpu.models.base import params_finite
    ok = best_params is not None and params_finite(best_params)
    if not ok:
        print('WARNING: fit produced no finite best-val parameters; '
              'not marking experiment as completed')
    hparams['training_completed'] = ok
    export_hparams(hparams, exp)

    _clean_dir(hparams)


def cli():
    """Console entry point (``behavenet-decoder-grid-search``)."""
    hyperparams = get_all_params('grid_search')
    run_grid_search(main, hyperparams)


if __name__ == '__main__':
    cli()
