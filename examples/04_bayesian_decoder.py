"""Example 04: Bayesian decoding — fuse ARHMM dynamics with neural decoders.

Run after 01-03. Loads the fitted ARHMM, the AE latents, and the
neural->latent predictions, estimates the observation noise on training
trials, then decodes each test trial with the switching-LDS filter/smoother
and reports the improvement over the raw neural predictions.

(The reference repository ships only the data plumbing for this stage; its
notebook is a single blank cell.)
"""

import os
import pickle

import numpy as np

from _common import ANIMAL, EXPT, LAB, SESSION, base_dirs

from behavenet_tpu.models.bayesian import BayesianDecoder


def _load(path, key):
    with open(path, 'rb') as f:
        d = pickle.load(f)
    return d


def main():
    data_dir, save_dir = base_dirs()
    sess_dir = os.path.join(save_dir, LAB, EXPT, ANIMAL, SESSION)
    sess_str = '%s_%s_%s_%s' % (LAB, EXPT, ANIMAL, SESSION)

    latents = _load(os.path.join(
        sess_dir, 'ae/conv/04_latents/ae-demo/version_0',
        '%s_latents.pkl' % sess_str), 'latents')
    preds = _load(os.path.join(
        sess_dir, 'neural-ae/04_latents/mlp/all/dec-ae-demo/version_0',
        '%s_predictions.pkl' % sess_str), 'predictions')
    arhmm_file = os.path.join(
        sess_dir, 'arhmm/04_latents/02_states/stationary/gaussian/arhmm-demo/version_0',
        'best_val_model.pt')
    with open(arhmm_file, 'rb') as f:
        hmm = pickle.load(f)

    train_trials = [int(t) for t in latents['trials']['train']]
    test_trials = [int(t) for t in latents['trials']['test']]

    dec = BayesianDecoder(hmm)
    dec.estimate_obs_noise(
        [latents['latents'][t] for t in train_trials],
        [preds['predictions'][t] for t in train_trials])

    mse_raw, mse_dec = [], []
    for t in test_trials:
        z_true = latents['latents'][t]
        y = preds['predictions'][t]
        out = dec.decode(y)
        good = ~np.any(np.isnan(y), axis=1)
        mse_raw.append(np.mean((y[good] - z_true[good]) ** 2))
        mse_dec.append(np.mean((out['latents'][good] - z_true[good]) ** 2))
    print('test-trial latent MSE: raw neural predictions %.4f -> bayesian decode %.4f'
          % (np.mean(mse_raw), np.mean(mse_dec)))


if __name__ == '__main__':
    main()
