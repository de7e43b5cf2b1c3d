"""Experiment store: paths, versioning, dedup (reference test_utils_fitting.py)."""

import os
import pickle

import numpy as np
import pytest

from behavenet_tpu.fitting import experiment as ex


@pytest.fixture
def base_hparams(tmpdir):
    return {
        'save_dir': str(tmpdir),
        'data_dir': str(tmpdir),
        'lab': 'lab0', 'expt': 'expt0', 'animal': 'animal0', 'session': 'sess0',
        'sessions_csv': '',
        'experiment_name': 'tt-expt',
    }


class TestExptDir:

    def test_ae_scheme(self, base_hparams):
        hp = dict(base_hparams, model_class='ae', model_type='conv', n_ae_latents=8)
        hp['session_dir'] = os.path.join(
            hp['save_dir'], 'lab0', 'expt0', 'animal0', 'sess0')
        out = ex.get_expt_dir(hp)
        assert out.endswith('lab0/expt0/animal0/sess0/ae/conv/08_latents/tt-expt')

    def test_arhmm_scheme(self, base_hparams):
        hp = dict(base_hparams, model_class='arhmm', model_type=None, n_ae_latents=8,
                  n_arhmm_states=16, transitions='stationary', noise_type='gaussian')
        hp['session_dir'] = 'sd'
        out = ex.get_expt_dir(hp)
        assert out == 'sd/arhmm/08_latents/16_states/stationary/gaussian/tt-expt'

    def test_arhmm_sticky_kappa_in_path(self, base_hparams):
        hp = dict(base_hparams, model_class='arhmm', model_type=None, n_ae_latents=8,
                  n_arhmm_states=4, transitions='sticky', kappa=1e4, noise_type='gaussian')
        hp['session_dir'] = 'sd'
        out = ex.get_expt_dir(hp)
        assert 'sticky_1e+04' in out

    def test_decoder_scheme(self, base_hparams):
        hp = dict(base_hparams, model_class='neural-ae', model_type='mlp', n_ae_latents=8,
                  subsample_method='none')
        hp['session_dir'] = 'sd'
        out = ex.get_expt_dir(hp)
        assert out == 'sd/neural-ae/08_latents/mlp/all/tt-expt'

    def test_region_dir(self):
        assert ex.get_region_dir({'subsample_method': 'none'}) == 'all'
        assert ex.get_region_dir(
            {'subsample_method': 'single', 'subsample_idxs_name': 'mctx'}) == 'mctx-single'
        assert ex.get_region_dir(
            {'subsample_method': 'loo', 'subsample_idxs_name': 'mctx'}) == 'mctx-loo'


class TestSessionDir:

    def test_single_session(self, base_hparams):
        session_dir, sess_ids = ex.get_session_dir(base_hparams)
        assert session_dir.endswith('lab0/expt0/animal0/sess0')
        assert sess_ids == [{'lab': 'lab0', 'expt': 'expt0', 'animal': 'animal0',
                             'session': 'sess0'}]

    def test_all_sessions_creates_multisession(self, base_hparams, tmpdir):
        # create two sessions on disk
        for sess in ('s0', 's1'):
            os.makedirs(str(tmpdir.join('lab0', 'expt0', 'animal0', sess)))
        hp = dict(base_hparams, session='all', all_source='save')
        session_dir, sess_ids = ex.get_session_dir(hp, session_source='save')
        assert 'multisession-00' in session_dir
        assert len(sess_ids) == 2

    def test_multisession_reuse(self, base_hparams, tmpdir):
        for sess in ('s0', 's1'):
            os.makedirs(str(tmpdir.join('lab0', 'expt0', 'animal0', sess)))
        hp = dict(base_hparams, session='all', all_source='save')
        session_dir, sess_ids = ex.get_session_dir(hp, session_source='save')
        os.makedirs(session_dir)
        ex.export_session_info_to_csv(session_dir, sess_ids)
        # same combo resolves to the same multisession
        session_dir2, _ = ex.get_session_dir(hp, session_source='save')
        assert session_dir2 == session_dir


class TestExperimentVersioning:

    def test_version_allocation(self, tmpdir):
        e0 = ex.Experiment('expt', str(tmpdir))
        e1 = ex.Experiment('expt', str(tmpdir))
        assert e0.version == 0
        assert e1.version == 1

    def test_metrics_csv_union_columns(self, tmpdir):
        e = ex.Experiment('expt', str(tmpdir))
        e.log({'epoch': 0, 'tr_loss': 1.0})
        e.log({'epoch': 0, 'val_loss': 2.0})
        e.save()
        import pandas as pd
        df = pd.read_csv(os.path.join(e.version_dir, 'metrics.csv'))
        assert set(df.columns) == {'epoch', 'tr_loss', 'val_loss'}
        assert len(df) == 2


class TestExperimentExists:

    def _hp(self, tmpdir):
        return {
            'save_dir': str(tmpdir), 'data_dir': str(tmpdir),
            'lab': 'l', 'expt': 'e', 'animal': 'a', 'session': 's',
            'sessions_csv': '', 'experiment_name': 'expt',
            'model_class': 'ae', 'model_type': 'conv', 'n_ae_latents': 8,
            'rng_seed_data': 0, 'trial_splits': '8;1;1;0', 'train_frac': 1.0,
            'rng_seed_model': 0, 'fit_sess_io_layers': False,
            'learning_rate': 1e-4, 'l2_reg': 0.0,
        }

    def test_dedup_and_completion_flag(self, tmpdir):
        hp = self._hp(tmpdir)
        assert ex.experiment_exists(dict(hp)) is False

        hp2, sess_ids, exp = ex.create_experiment(dict(hp))
        assert hp2 is not None
        # write meta tags without completion -> still "not exists"
        hp2['training_completed'] = False
        ex.export_hparams(hp2, exp)
        assert ex.experiment_exists(dict(hp)) is False
        # mark complete -> exists
        hp2['training_completed'] = True
        ex.export_hparams(hp2, exp)
        found, version = ex.experiment_exists(dict(hp), which_version=True)
        assert found and version == 0
        # create_experiment now aborts
        out = ex.create_experiment(dict(hp))
        assert out == (None, None, None)

    def test_different_params_not_deduped(self, tmpdir):
        hp = self._hp(tmpdir)
        hp2, _, exp = ex.create_experiment(dict(hp))
        hp2['training_completed'] = True
        ex.export_hparams(hp2, exp)
        hp_changed = dict(hp, n_ae_latents=16)
        assert ex.experiment_exists(hp_changed) is False


class TestGetModelParams:

    def test_ae_keys(self):
        hp = {'model_class': 'ae', 'model_type': 'conv', 'rng_seed_data': 0,
              'trial_splits': '8;1;1;0', 'train_frac': 1.0, 'rng_seed_model': 0,
              'n_ae_latents': 8, 'fit_sess_io_layers': False, 'learning_rate': 1e-4,
              'l2_reg': 0.0, 'extraneous': 'ignored'}
        out = ex.get_model_params(hp)
        assert 'extraneous' not in out
        assert out['n_ae_latents'] == 8

    def test_vae_includes_beta(self):
        hp = {'model_class': 'vae', 'model_type': 'conv', 'rng_seed_data': 0,
              'trial_splits': '8;1;1;0', 'train_frac': 1.0, 'rng_seed_model': 0,
              'n_ae_latents': 8, 'fit_sess_io_layers': False, 'learning_rate': 1e-4,
              'l2_reg': 0.0, 'vae.beta': 5.0}
        assert ex.get_model_params(hp)['vae.beta'] == 5.0

    def test_arhmm_sticky_includes_kappa(self):
        hp = {'model_class': 'arhmm', 'model_type': None, 'rng_seed_data': 0,
              'trial_splits': '8;1;1;0', 'train_frac': 1.0, 'rng_seed_model': 0,
              'n_arhmm_lags': 1, 'noise_type': 'gaussian', 'transitions': 'sticky',
              'kappa': 100.0, 'ae_experiment_name': 'x', 'ae_version': 'best',
              'ae_model_class': 'ae', 'ae_model_type': 'conv', 'n_ae_latents': 8}
        assert ex.get_model_params(hp)['kappa'] == 100.0


class TestBestModelVersion:

    def test_best_by_min_val_loss(self, tmpdir):
        for v, loss in [(0, 3.0), (1, 1.0), (2, 2.0)]:
            e = ex.Experiment('expt', str(tmpdir), version=v)
            e.log({'epoch': 0, 'val_loss': loss})
            e.save()
            with open(os.path.join(e.version_dir, 'meta_tags.pkl'), 'wb') as f:
                pickle.dump({'training_completed': True}, f)
        expt_dir = os.path.join(str(tmpdir), 'expt')
        assert ex.get_best_model_version(expt_dir, 'val_loss')[0] == 1

    def test_incomplete_versions_skipped(self, tmpdir):
        for v, loss, done in [(0, 0.5, False), (1, 1.0, True)]:
            e = ex.Experiment('expt', str(tmpdir), version=v)
            e.log({'epoch': 0, 'val_loss': loss})
            e.save()
            with open(os.path.join(e.version_dir, 'meta_tags.pkl'), 'wb') as f:
                pickle.dump({'training_completed': done}, f)
        expt_dir = os.path.join(str(tmpdir), 'expt')
        assert ex.get_best_model_version(expt_dir, 'val_loss')[0] == 1
