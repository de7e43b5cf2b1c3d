"""get_data_generator_inputs dispatch + get_transforms_paths (mirrors the
reference's tests/test_data/test_utils_data.py coverage)."""

import os
import pickle

import numpy as np
import pytest

from behavenet_tpu.data import utils
from behavenet_tpu.data import transforms


def base_hparams(tmpdir, model_class, **kwargs):
    hp = {
        'data_dir': str(tmpdir), 'save_dir': str(tmpdir),
        'lab': 'lab', 'expt': 'expt', 'animal': 'animal', 'session': 'sess',
        'model_class': model_class, 'model_type': 'mlp',
        'n_ae_latents': 6, 'n_labels': 4, 'n_arhmm_states': 3,
        'n_arhmm_lags': 1, 'kappa': 0.0, 'noise_type': 'gaussian',
        'transitions': 'stationary',
        'neural_type': 'ca', 'neural_thresh': 1.0, 'neural_bin_size': 25,
        'subsample_method': 'none', 'use_output_mask': False,
        'use_label_mask': False, 'conditional_encoder': False,
        'y_pixels': 16, 'x_pixels': 12, 'n_input_channels': 1,
        'ae_experiment_name': 'ae-expt', 'ae_version': 0,
        'ae_model_class': 'ae', 'ae_model_type': 'conv',
        'arhmm_experiment_name': 'arhmm-expt', 'arhmm_version': 0,
        'experiment_name': 'expt-name',
        'session_dir': os.path.join(str(tmpdir), 'lab', 'expt', 'animal', 'sess'),
    }
    hp.update(kwargs)
    return hp


SESS = [{'lab': 'lab', 'expt': 'expt', 'animal': 'animal', 'session': 'sess'}]


class TestGetDataGeneratorInputs:

    def test_ae_family(self, tmpdir):
        for mc in ('ae', 'vae', 'beta-tcvae'):
            hp = base_hparams(tmpdir, mc, model_type='conv')
            hp, signals, transforms_, paths = utils.get_data_generator_inputs(
                hp, SESS, check_splits=False)
            assert signals[0] == ['images']
            assert transforms_[0] == [None]
            assert paths[0][0].endswith('data.hdf5')

    def test_ae_with_output_mask(self, tmpdir):
        hp = base_hparams(tmpdir, 'ae', model_type='conv', use_output_mask=True)
        _, signals, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
        assert signals[0] == ['images', 'masks']

    def test_cond_ae_family(self, tmpdir):
        for mc in ('cond-ae', 'cond-ae-msp', 'cond-vae', 'ps-vae', 'msps-vae'):
            hp = base_hparams(tmpdir, mc, model_type='conv')
            _, signals, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
            assert signals[0] == ['images', 'labels'], mc

    def test_conditional_encoder_adds_labels_sc(self, tmpdir):
        hp = base_hparams(tmpdir, 'cond-ae', model_type='conv', conditional_encoder=True)
        _, signals, transforms_, _ = utils.get_data_generator_inputs(
            hp, SESS, check_splits=False)
        assert 'labels_sc' in signals[0]
        idx = signals[0].index('labels_sc')
        assert isinstance(transforms_[0][idx], transforms.MakeOneHot2D)

    def test_label_mask_only_for_msp_and_psvae(self, tmpdir):
        for mc, expected in (('cond-ae-msp', True), ('ps-vae', True), ('cond-vae', False)):
            hp = base_hparams(tmpdir, mc, model_type='conv', use_label_mask=True)
            _, signals, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
            assert ('labels_masks' in signals[0]) == expected, mc

    def test_neural_ae(self, tmpdir):
        hp = base_hparams(tmpdir, 'neural-ae')
        hp, signals, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
        assert hp['input_signal'] == 'neural'
        assert hp['output_signal'] == 'ae_latents'
        assert hp['output_size'] == 6
        assert hp['noise_dist'] == 'gaussian'
        assert signals[0] == ['neural', 'ae_latents']

    def test_neural_ae_mv_noise(self, tmpdir):
        hp = base_hparams(tmpdir, 'neural-ae', model_type='mlp-mv')
        hp, _, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
        assert hp['noise_dist'] == 'gaussian-full'

    def test_ae_neural_noise_by_neural_type(self, tmpdir):
        hp = base_hparams(tmpdir, 'ae-neural', neural_type='ca')
        hp, _, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
        assert hp['noise_dist'] == 'gaussian'
        hp = base_hparams(tmpdir, 'ae-neural', neural_type='spikes', neural_thresh=0)
        hp, _, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
        assert hp['noise_dist'] == 'poisson'

    def test_neural_labels_and_reverse(self, tmpdir):
        hp = base_hparams(tmpdir, 'neural-labels')
        hp, signals, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
        assert hp['output_signal'] == 'labels' and hp['output_size'] == 4
        hp = base_hparams(tmpdir, 'labels-neural')
        hp, signals, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
        assert hp['input_signal'] == 'labels' and hp['output_signal'] == 'neural'

    def test_neural_arhmm(self, tmpdir):
        hp = base_hparams(tmpdir, 'neural-arhmm')
        hp, signals, transforms_, _ = utils.get_data_generator_inputs(
            hp, SESS, check_splits=False)
        assert hp['output_signal'] == 'arhmm_states'
        assert hp['output_size'] == 3
        assert hp['noise_dist'] == 'categorical'
        # target states stay categorical ints: no one-hot on this path
        idx = signals[0].index('arhmm_states')
        t = transforms_[0][idx]
        assert t is None or not isinstance(t, transforms.MakeOneHot)

    def test_arhmm_neural_onehots_input_states(self, tmpdir):
        hp = base_hparams(tmpdir, 'arhmm-neural')
        hp, signals, transforms_, _ = utils.get_data_generator_inputs(
            hp, SESS, check_splits=False)
        assert hp['input_signal'] == 'arhmm_states'
        idx = signals[0].index('arhmm_states')
        t = transforms_[0][idx]
        onehot = t if isinstance(t, transforms.MakeOneHot) else next(
            tt for tt in t.transforms if isinstance(tt, transforms.MakeOneHot))
        assert onehot.n_classes == 3
        # the one-hot produces a static (T, K) input regardless of visited states
        out = onehot(np.array([0.0, 0.0, 1.0]))
        assert out.shape == (3, 3)

    def test_arhmm_uses_latents(self, tmpdir):
        for mc in ('arhmm', 'hmm'):
            hp = base_hparams(tmpdir, mc, model_type=None)
            _, signals, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
            assert signals[0] == ['ae_latents']

    def test_arhmm_labels_uses_labels(self, tmpdir):
        for mc in ('arhmm-labels', 'hmm-labels'):
            hp = base_hparams(tmpdir, mc, model_type=None)
            _, signals, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
            assert signals[0] == ['labels']

    def test_labels_images(self, tmpdir):
        hp = base_hparams(tmpdir, 'labels-images', model_type='conv')
        hp, signals, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
        assert signals[0] == ['images', 'labels']
        assert hp['input_signal'] == 'labels'
        assert hp['output_signal'] == 'images'

    def test_bayesian_decoding_signals(self, tmpdir):
        hp = base_hparams(
            tmpdir, 'bayesian-decoding',
            neural_ae_experiment_name='dec-ae', neural_ae_model_type='mlp',
            neural_ae_version=0, neural_arhmm_experiment_name='dec-arhmm',
            neural_arhmm_model_type='mlp', neural_arhmm_version=0)
        hp, signals, _, _ = utils.get_data_generator_inputs(hp, SESS, check_splits=False)
        assert set(signals[0]) >= {'ae_latents', 'arhmm_states'}

    def test_invalid_model_class(self, tmpdir):
        hp = base_hparams(tmpdir, 'bogus-model')
        with pytest.raises(ValueError):
            utils.get_data_generator_inputs(hp, SESS, check_splits=False)


class TestGetTransformsPaths:

    def _flat(self, t):
        return list(t.transforms) if isinstance(t, transforms.Compose) else [t]

    def test_neural_ca_threshold_zscore(self, tmpdir):
        hp = base_hparams(tmpdir, 'neural-ae', neural_type='ca', neural_thresh=1.0)
        t, path = utils.get_transforms_paths('neural', hp, sess_id=None, check_splits=False)
        assert path.endswith('data.hdf5')
        assert any(isinstance(tt, transforms.ZScore) for tt in self._flat(t))

    def test_neural_spikes_threshold(self, tmpdir):
        hp = base_hparams(tmpdir, 'neural-ae', neural_type='spikes', neural_thresh=2.0)
        t, _ = utils.get_transforms_paths('neural', hp, sess_id=None, check_splits=False)
        assert any(isinstance(tt, transforms.Threshold) for tt in self._flat(t))

    def test_ae_latents_path_contains_version(self, tmpdir):
        hp = base_hparams(tmpdir, 'neural-ae')
        _, path = utils.get_transforms_paths(
            'ae_latents', hp, sess_id=None, check_splits=False)
        assert 'version_0' in path and path.endswith('latents.pkl')

    def test_ae_latents_me_motion_energy(self, tmpdir):
        hp = base_hparams(tmpdir, 'neural-ae-me')
        t, _ = utils.get_transforms_paths(
            'ae_latents_me', hp, sess_id=None, check_splits=False)
        me = t if isinstance(t, transforms.MotionEnergy) else next(
            tt for tt in t.transforms if isinstance(tt, transforms.MotionEnergy))
        assert isinstance(me, transforms.MotionEnergy)

    def test_arhmm_states_path(self, tmpdir):
        hp = base_hparams(tmpdir, 'neural-arhmm')
        _, path = utils.get_transforms_paths(
            'arhmm_states', hp, sess_id=None, check_splits=False)
        assert 'version_0' in path and path.endswith('states.pkl')

    def test_arhmm_states_shuffle(self, tmpdir):
        hp = base_hparams(tmpdir, 'neural-arhmm', shuffle_rng_seed=0)
        t, _ = utils.get_transforms_paths(
            'arhmm_states', hp, sess_id=None, check_splits=False)
        assert isinstance(t, transforms.BlockShuffle)

    def test_invalid_data_type(self, tmpdir):
        hp = base_hparams(tmpdir, 'neural-ae')
        with pytest.raises(ValueError):
            utils.get_transforms_paths('bogus', hp, sess_id=None, check_splits=False)
