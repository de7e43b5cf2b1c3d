"""Experiment-store matrix tests: multisession matching, per-class path
schemes, per-class identity keys.

Ports the reference spec (tests/test_fitting/test_utils_fitting.py:17-180
fixture tree, :247-408 session matching, :409-748 expt dirs, :840-1089
get_model_params) onto behavenet_tpu.fitting.experiment.
"""

import os

import pytest

from behavenet_tpu.fitting import experiment as ex

SESS_IDS = [
    {'lab': 'lab0', 'expt': 'expt0', 'animal': 'animal0', 'session': 'session-00'},
    {'lab': 'lab0', 'expt': 'expt0', 'animal': 'animal0', 'session': 'session-01'},
    {'lab': 'lab0', 'expt': 'expt0', 'animal': 'animal0', 'session': 'session-02'},
    {'lab': 'lab0', 'expt': 'expt0', 'animal': 'animal1', 'session': 'session-00'},
    {'lab': 'lab0', 'expt': 'expt1', 'animal': 'animal0', 'session': 'session-00'},
    {'lab': 'lab0', 'expt': 'expt1', 'animal': 'animal1', 'session': 'session-00'},
    {'lab': 'lab1', 'expt': 'expt0', 'animal': 'animal0', 'session': 'session-00'},
    {'lab': 'lab1', 'expt': 'expt0', 'animal': 'animal0', 'session': 'session-01'},
]


def _key(d):
    return '/'.join(d[k] for k in ('lab', 'expt', 'animal', 'session'))


@pytest.fixture
def tree(tmp_path):
    """The reference's temp store tree: sessions + multisession csvs at
    several hierarchy levels (test_utils_fitting.py:17-180)."""
    root = str(tmp_path)
    for s in SESS_IDS:
        os.makedirs(os.path.join(root, s['lab'], s['expt'], s['animal'], s['session']))

    def make_multi(level_path, idx, members):
        d = os.path.join(root, level_path, 'multisession-%02i' % idx)
        os.makedirs(d, exist_ok=True)
        ex.export_session_info_to_csv(d, [SESS_IDS[i] for i in members])
        return os.path.join(d, 'session_info.csv')

    csvs = {
        # animal-level
        'l0e0a0_m0': make_multi('lab0/expt0/animal0', 0, [0, 1, 2]),
        'l0e0a0_m1': make_multi('lab0/expt0/animal0', 1, [1, 2]),
        'l0e0a1_m3': make_multi('lab0/expt0/animal1', 3, [3]),
        'l0e0a1_m4': make_multi('lab0/expt0/animal1', 4, [3]),
        # expt-level
        'l0e0_m0': make_multi('lab0/expt0', 0, [0, 1, 2, 3]),
        'l0e0_m1': make_multi('lab0/expt0', 1, [0, 3]),
        # lab-level
        'l0_m0': make_multi('lab0', 0, [0, 1, 2, 3, 4, 5]),
        # store-root level (multi-lab)
        'l_m6': make_multi('', 6, [0, 1, 2, 3, 4, 5, 6]),
    }
    return root, csvs


def _hp(root, **kw):
    hp = {'data_dir': root, 'save_dir': root, 'sessions_csv': '',
          'lab': 'lab0', 'expt': 'expt0', 'animal': 'animal0',
          'session': 'session-00'}
    hp.update(kw)
    return hp


class TestSessionDirCsv:
    """sessions_csv-driven resolution (reference :247-303)."""

    def test_single_session_csv(self, tree):
        root, csvs = tree
        hp = _hp(root, animal='animal1', sessions_csv=csvs['l0e0a1_m3'])
        sess_dir, singles = ex.get_session_dir(hp, session_source='save')
        assert sess_dir == os.path.join(root, 'lab0/expt0/animal1/session-00')
        assert singles == [SESS_IDS[3]]

    def test_animal_level_csv(self, tree):
        root, csvs = tree
        hp = _hp(root, sessions_csv=csvs['l0e0a0_m0'])
        sess_dir, singles = ex.get_session_dir(hp, session_source='save')
        assert sess_dir == os.path.join(root, 'lab0/expt0/animal0/multisession-00')
        assert singles == [SESS_IDS[i] for i in (0, 1, 2)]

    def test_expt_level_csv(self, tree):
        root, csvs = tree
        hp = _hp(root, sessions_csv=csvs['l0e0_m0'])
        sess_dir, singles = ex.get_session_dir(hp, session_source='save')
        assert sess_dir == os.path.join(root, 'lab0/expt0/multisession-00')
        assert singles == [SESS_IDS[i] for i in (0, 1, 2, 3)]

    def test_lab_level_csv(self, tree):
        root, csvs = tree
        hp = _hp(root, sessions_csv=csvs['l0_m0'])
        sess_dir, singles = ex.get_session_dir(hp, session_source='save')
        assert sess_dir == os.path.join(root, 'lab0/multisession-00')
        assert singles == [SESS_IDS[i] for i in range(6)]

    def test_multi_lab_csv_rejected(self, tree):
        root, csvs = tree
        hp = _hp(root, sessions_csv=csvs['l_m6'])
        with pytest.raises(NotImplementedError):
            ex.get_session_dir(hp, session_source='save')


class TestSessionDirAllKeyword:
    """'all'-keyword expansion at each level (reference :305-360)."""

    def test_all_labs_rejected(self, tree):
        root, _ = tree
        with pytest.raises(NotImplementedError):
            ex.get_session_dir(_hp(root, lab='all'), session_source='save')

    def test_all_expts(self, tree):
        root, _ = tree
        sess_dir, singles = ex.get_session_dir(
            _hp(root, expt='all'), session_source='save')
        # matches the existing lab-level multisession-00 membership
        assert sess_dir == os.path.join(root, 'lab0/multisession-00')
        assert sorted(map(_key, singles)) == sorted(
            _key(SESS_IDS[i]) for i in range(6))

    def test_all_animals(self, tree):
        root, _ = tree
        sess_dir, singles = ex.get_session_dir(
            _hp(root, animal='all'), session_source='save')
        assert sess_dir == os.path.join(root, 'lab0/expt0/multisession-00')
        assert sorted(map(_key, singles)) == sorted(
            _key(SESS_IDS[i]) for i in (0, 1, 2, 3))

    def test_all_sessions(self, tree):
        root, _ = tree
        sess_dir, singles = ex.get_session_dir(
            _hp(root, session='all'), session_source='save')
        assert sess_dir == os.path.join(root, 'lab0/expt0/animal0/multisession-00')
        assert sorted(map(_key, singles)) == sorted(
            _key(SESS_IDS[i]) for i in (0, 1, 2))

    def test_single_session_passthrough(self, tree):
        root, _ = tree
        sess_dir, singles = ex.get_session_dir(_hp(root), session_source='save')
        assert sess_dir == os.path.join(root, 'lab0/expt0/animal0/session-00')
        assert singles == [SESS_IDS[0]]

    def test_explicit_multisession_id(self, tree):
        """'all' + explicit multisession pins the dir and reads membership."""
        root, _ = tree
        sess_dir, singles = ex.get_session_dir(
            _hp(root, session='all', multisession=1), session_source='save')
        assert sess_dir == os.path.join(root, 'lab0/expt0/animal0/multisession-01')
        assert sorted(map(_key, singles)) == sorted(
            _key(SESS_IDS[i]) for i in (1, 2))

    def test_new_multisession_allocated(self, tree):
        """No matching membership -> next free multisession index."""
        root, _ = tree
        sess_dir, singles = ex.get_session_dir(
            _hp(root, lab='lab1', session='all', multisession=None),
            session_source='save')
        assert sess_dir == os.path.join(root, 'lab1/expt0/animal0/multisession-00')
        assert sorted(map(_key, singles)) == sorted(
            _key(SESS_IDS[i]) for i in (6, 7))

    def test_bad_session_source(self, tree):
        root, _ = tree
        with pytest.raises(ValueError):
            ex.get_session_dir(_hp(root), session_source='test')


# Per-model-class path schemes (reference :409-748). Each entry:
# (extra hparams, expected path below session_dir).
_EXPT_DIR_CASES = {
    'ae': (dict(model_class='ae', model_type='conv', n_ae_latents=8),
           'ae/conv/08_latents/tt_expt'),
    'vae': (dict(model_class='vae', model_type='conv', n_ae_latents=10),
            'vae/conv/10_latents/tt_expt'),
    'beta-tcvae': (dict(model_class='beta-tcvae', model_type='conv', n_ae_latents=10),
                   'beta-tcvae/conv/10_latents/tt_expt'),
    'cond-vae': (dict(model_class='cond-vae', model_type='conv', n_ae_latents=8),
                 'cond-vae/conv/08_latents/tt_expt'),
    'cond-ae': (dict(model_class='cond-ae', model_type='conv', n_ae_latents=8),
                'cond-ae/conv/08_latents/tt_expt'),
    'cond-ae-msp': (dict(model_class='cond-ae-msp', model_type='conv', n_ae_latents=8),
                    'cond-ae-msp/conv/08_latents/tt_expt'),
    'ps-vae': (dict(model_class='ps-vae', model_type='conv', n_ae_latents=10),
               'ps-vae/conv/10_latents/tt_expt'),
    'msps-vae': (dict(model_class='msps-vae', model_type='conv', n_ae_latents=10),
                 'msps-vae/conv/10_latents/tt_expt'),
    'neural-ae': (dict(model_class='neural-ae', model_type='mlp', n_ae_latents=8,
                       subsample_method='none'),
                  'neural-ae/08_latents/mlp/all/tt_expt'),
    'neural-ae-me': (dict(model_class='neural-ae-me', model_type='mlp', n_ae_latents=8,
                          subsample_method='none'),
                     'neural-ae-me/08_latents/mlp/all/tt_expt'),
    'ae-neural': (dict(model_class='ae-neural', model_type='mlp', n_ae_latents=8,
                       subsample_method='none'),
                  'ae-neural/08_latents/mlp/all/tt_expt'),
    'neural-labels': (dict(model_class='neural-labels', model_type='mlp',
                           subsample_method='none'),
                      'neural-labels/mlp/all/tt_expt'),
    'labels-neural': (dict(model_class='labels-neural', model_type='mlp',
                           subsample_method='none'),
                      'labels-neural/mlp/all/tt_expt'),
    'neural-arhmm': (dict(model_class='neural-arhmm', model_type='mlp', n_ae_latents=8,
                          n_arhmm_states=10, transitions='stationary',
                          subsample_method='none'),
                     'neural-arhmm/08_latents/10_states/stationary/mlp/all/tt_expt'),
    'arhmm-neural': (dict(model_class='arhmm-neural', model_type='mlp', n_ae_latents=8,
                          n_arhmm_states=10, transitions='stationary',
                          subsample_method='none'),
                     'arhmm-neural/08_latents/10_states/stationary/mlp/all/tt_expt'),
    'arhmm-neural-sticky': (
        dict(model_class='arhmm-neural', model_type='mlp', n_ae_latents=8,
             n_arhmm_states=10, transitions='sticky', kappa=100,
             subsample_method='none'),
        'arhmm-neural/08_latents/10_states/sticky_1e+02/mlp/all/tt_expt'),
    'arhmm': (dict(model_class='arhmm', model_type=None, n_ae_latents=8,
                   n_arhmm_states=10, transitions='stationary', noise_type='gaussian'),
              'arhmm/08_latents/10_states/stationary/gaussian/tt_expt'),
    'arhmm-labels': (dict(model_class='arhmm-labels', model_type=None,
                          n_arhmm_states=10, transitions='stationary',
                          noise_type='studentst'),
                     'arhmm-labels/10_states/stationary/studentst/tt_expt'),
    'bayesian-decoding': (
        dict(model_class='bayesian-decoding', model_type=None, n_ae_latents=8,
             n_arhmm_states=10, transitions='stationary', noise_type='studentst',
             subsample_method='none'),
        'bayesian-decoding/08_latents/10_states/stationary/studentst/all/tt_expt'),
    'labels-images': (dict(model_class='labels-images', model_type='conv'),
                      'labels-images/conv/tt_expt'),
}


class TestExptDirSchemes:

    @pytest.mark.parametrize('case', sorted(_EXPT_DIR_CASES))
    def test_scheme(self, case):
        extra, expect = _EXPT_DIR_CASES[case]
        hp = dict(extra, session_dir='sd', experiment_name='tt_expt',
                  save_dir='sdir', data_dir='ddir', lab='lab0', expt='expt0',
                  animal='animal0', session='session-00')
        assert ex.get_expt_dir(hp) == os.path.join('sd', expect)
        # explicit-args form must agree with the hparams form
        assert ex.get_expt_dir(
            hp, model_class=hp['model_class'], model_type=hp['model_type'],
            expt_name='tt_expt') == os.path.join('sd', expect)

    def test_invalid_class(self):
        hp = dict(model_class='testing', model_type='conv', session_dir='sd',
                  experiment_name='tt_expt')
        with pytest.raises(ValueError):
            ex.get_expt_dir(hp)

    def test_ae_multisession_redirect(self, tree):
        """ae_multisession points the AE path at a multisession dir."""
        root, _ = tree
        hp = _hp(root, model_class='ae', model_type='conv', n_ae_latents=8,
                 experiment_name='tt_expt', ae_multisession=0,
                 session_dir='ignored')
        out = ex.get_expt_dir(hp)
        assert out == os.path.join(
            root, 'lab0/expt0/animal0/multisession-00/ae/conv/08_latents/tt_expt')

    def test_arhmm_multisession_redirect(self, tree):
        root, _ = tree
        hp = _hp(root, model_class='arhmm', model_type=None, n_ae_latents=8,
                 n_arhmm_states=10, transitions='stationary',
                 noise_type='gaussian', experiment_name='tt_expt',
                 arhmm_multisession=0, session_dir='ignored')
        out = ex.get_expt_dir(hp)
        assert out == os.path.join(
            root, 'lab0/expt0/animal0/multisession-00',
            'arhmm/08_latents/10_states/stationary/gaussian/tt_expt')


# Per-model-class identity key sets (reference :840-1089). Each entry is the
# exact model_hparams dict that must round-trip through get_model_params.
_BASE_PARAMS = {'rng_seed_data': 4, 'trial_splits': '4;1;1;0',
                'train_frac': 0.9, 'rng_seed_model': 11}
_MISC_PARAMS = {'data_dir': '/tmp/path', 'save_dir': '/tmp/path2',
                'export_train_plots': True}

_MODEL_PARAM_CASES = {
    'ae': dict(model_class='ae', model_type='conv', n_ae_latents=5,
               fit_sess_io_layers=False, learning_rate=1e-4, l2_reg=1e-2),
    'vae': dict(model_class='vae', model_type='conv', n_ae_latents=6,
                fit_sess_io_layers=False, learning_rate=1e-4, l2_reg=1e-2,
                **{'vae.beta': 1}),
    'beta-tcvae': dict(model_class='beta-tcvae', model_type='conv', n_ae_latents=6,
                       fit_sess_io_layers=False, learning_rate=1e-4, l2_reg=1e-2,
                       **{'beta_tcvae.beta': 1}),
    'cond-vae': dict(model_class='cond-vae', model_type='conv', n_ae_latents=6,
                     fit_sess_io_layers=False, learning_rate=1e-4, l2_reg=1e-2,
                     conditional_encoder=False, **{'vae.beta': 1}),
    'cond-ae': dict(model_class='cond-ae', model_type='conv', n_ae_latents=5,
                    fit_sess_io_layers=False, learning_rate=1e-4, l2_reg=1e-2,
                    conditional_encoder=False),
    'cond-ae-msp': dict(model_class='cond-ae-msp', model_type='conv', n_ae_latents=5,
                        fit_sess_io_layers=False, learning_rate=1e-4, l2_reg=1e-2,
                        **{'msp.alpha': 1e-5}),
    'ps-vae': dict(model_class='ps-vae', model_type='conv', n_ae_latents=6,
                   fit_sess_io_layers=False, learning_rate=1e-4, l2_reg=1e-2,
                   **{'ps_vae.alpha': 1, 'ps_vae.beta': 2}),
    'msps-vae': dict(model_class='msps-vae', model_type='conv', n_ae_latents=6,
                     fit_sess_io_layers=False, learning_rate=1e-4, l2_reg=1e-2,
                     n_background=3, n_sessions_per_batch=2,
                     **{'ps_vae.alpha': 1, 'ps_vae.beta': 2, 'ps_vae.delta': 5}),
    'arhmm': dict(model_class='arhmm', model_type='', n_arhmm_lags=2,
                  noise_type='gaussian', transitions='stationary',
                  ae_experiment_name='ae_expt', ae_version=4,
                  ae_model_class='ae', ae_model_type='conv', n_ae_latents=5),
    'arhmm-sticky': dict(model_class='arhmm', model_type='', n_arhmm_lags=2,
                         noise_type='gaussian', transitions='sticky', kappa=100,
                         ae_experiment_name='ae_expt', ae_version=4,
                         ae_model_class='ae', ae_model_type='conv', n_ae_latents=5),
    'arhmm-labels': dict(model_class='arhmm-labels', model_type='', n_arhmm_lags=2,
                         noise_type='gaussian', transitions='stationary'),
    'neural-ae': dict(model_class='neural-ae', model_type='mlp',
                      ae_experiment_name='ae_expt', ae_version=4,
                      ae_model_class='ae', ae_model_type='conv', n_ae_latents=5,
                      n_lags=3, l2_reg=1, n_hid_layers=0, activation='relu',
                      learning_rate=1e-3, subsample_method='none'),
    'neural-ae-me': dict(model_class='neural-ae-me', model_type='mlp',
                         ae_experiment_name='ae_expt', ae_version=4,
                         ae_model_class='ae', ae_model_type='conv', n_ae_latents=5,
                         n_lags=3, l2_reg=1, n_hid_layers=0, activation='relu',
                         learning_rate=1e-3, subsample_method='none'),
    'ae-neural': dict(model_class='ae-neural', model_type='mlp',
                      ae_experiment_name='ae_expt', ae_version=4,
                      ae_model_class='ae', ae_model_type='conv', n_ae_latents=5,
                      n_lags=3, l2_reg=1, n_hid_layers=0, activation='relu',
                      learning_rate=1e-3, subsample_method='none'),
    'neural-labels': dict(model_class='neural-labels', model_type='mlp',
                          n_lags=3, l2_reg=1, n_hid_layers=0, activation='relu',
                          learning_rate=1e-3, subsample_method='none'),
    'neural-arhmm': dict(model_class='neural-arhmm', model_type='mlp',
                         arhmm_experiment_name='arhmm_expt', arhmm_version=12,
                         n_arhmm_states=4, n_arhmm_lags=1, noise_type='gaussian',
                         transitions='sticky', kappa=10,
                         ae_model_class='ae', ae_model_type='conv', n_ae_latents=5,
                         n_lags=3, l2_reg=1, n_hid_layers=2, n_hid_units=10,
                         activation='relu', learning_rate=1e-3,
                         subsample_method='single', subsample_idxs_name='a',
                         subsample_idxs_group_0='b', subsample_idxs_group_1='c'),
    'labels-images': dict(model_class='labels-images', model_type='conv',
                          fit_sess_io_layers=False, learning_rate=1e-4,
                          l2_reg=1e-2),
}


class TestGetModelParamsMatrix:

    @pytest.mark.parametrize('case', sorted(_MODEL_PARAM_CASES))
    def test_identity_keys_roundtrip(self, case):
        """get_model_params keeps exactly base+model keys, drops misc keys."""
        model_hp = _MODEL_PARAM_CASES[case]
        out = ex.get_model_params({**_MISC_PARAMS, **_BASE_PARAMS, **model_hp})
        assert out == {**_BASE_PARAMS, **model_hp}

    def test_invalid_class(self):
        with pytest.raises(NotImplementedError):
            ex.get_model_params(
                {**_MISC_PARAMS, **_BASE_PARAMS,
                 'model_class': 'test', 'model_type': ''})

    def test_bayesian_decoding_supported(self):
        """Unlike the reference (NotImplementedError, utils.py:729), the
        Bayesian decoder is a working stage here with its own identity keys."""
        hp = {**_MISC_PARAMS, **_BASE_PARAMS,
              'model_class': 'bayesian-decoding', 'model_type': None,
              'n_ae_latents': 8, 'n_arhmm_states': 4}
        out = ex.get_model_params(hp)
        assert out['n_ae_latents'] == 8 and out['n_arhmm_states'] == 4
