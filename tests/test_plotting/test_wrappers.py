"""Drive every public plotting/movie wrapper against a real experiment store.

The session-scoped ``store`` fixture (conftest.py) fits a tiny AE, ARHMM,
neural decoder, PS-VAE and MSPS-VAE through the real CLIs; each test here
loads models from the store exactly the way a user would and asserts that
the wrapper produces its file / figure / dataframe. This closes the
reference's own test gap ("all plotting untested", SURVEY §4) for the
wrapper layer; numeric internals are covered by the other test_plotting
modules.
"""

import os
import pickle

import matplotlib
import numpy as np
import pytest

matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402

from tests.test_plotting.conftest import (  # noqa: E402
    AE_EXPT, ARHMM_EXPT, DEC_EXPT, LAB, EXPT, ANIMAL, MSPS_EXPT, MSPS_LATENTS,
    N_BACKGROUND, N_LABELS, N_LATENTS, N_STATES, PSVAE_EXPT, SESSIONS)


def _close_all():
    plt.close('all')


# ----------------------------------------
# plotting/__init__
# ----------------------------------------

class TestStoreReaders:

    def test_load_latents(self, store):
        from behavenet_tpu.fitting.experiment import get_expt_dir, get_session_dir
        from behavenet_tpu.plotting import load_latents
        hp = store['hparams_for']('ae')
        hp['session_dir'], _ = get_session_dir(hp, session_source='save')
        hp['expt_dir'] = get_expt_dir(hp)
        lat = np.asarray(load_latents(hp, version=0, dtype='val'))
        assert lat.ndim == 2 and lat.shape[1] == N_LATENTS

    def test_load_metrics_csv_as_df(self, store):
        from behavenet_tpu.plotting import load_metrics_csv_as_df
        hp = store['hparams_for']('ae')
        df = load_metrics_csv_as_df(hp, LAB, EXPT, metrics_list=['loss'],
                                    version=0)
        assert len(df) > 0
        assert {'epoch', 'dtype', 'loss', 'val'}.issubset(df.columns)


# ----------------------------------------
# ae_utils
# ----------------------------------------

class TestAeUtils:

    def test_reconstruction_movie_wrapper(self, store, tmp_path):
        from behavenet_tpu.plotting.ae_utils import make_ae_reconstruction_movie_wrapper
        hp = store['hparams_for']('ae')
        out = str(tmp_path / 'recon_movie')
        make_ae_reconstruction_movie_wrapper(hp, out, version=0, max_frames=6,
                                             frame_rate=5)
        written = [f for f in os.listdir(tmp_path) if f.startswith('recon_movie')]
        assert written, 'no movie file written'
        _close_all()


# ----------------------------------------
# arhmm_utils
# ----------------------------------------

class TestArhmmUtils:

    def _hmm(self, store):
        hp = store['hparams_for']('arhmm')
        from behavenet_tpu.fitting.experiment import get_expt_dir, get_session_dir
        hp['session_dir'], _ = get_session_dir(hp, session_source='save')
        hp['expt_dir'] = get_expt_dir(hp)
        with open(os.path.join(hp['expt_dir'], 'version_0', 'best_val_model.pt'),
                  'rb') as f:
            return pickle.load(f)

    def test_get_model_latents_states_and_samples(self, store):
        from behavenet_tpu.plotting.arhmm_utils import get_model_latents_states
        hp = store['hparams_for']('arhmm')
        for cond in (False, True):
            out = get_model_latents_states(hp, '', return_samples=2,
                                           cond_sampling=cond)
            assert out['model'].K == N_STATES
            assert len(out['latents_dict']['test']) > 0
            assert len(out['latents_gen']) == 2
            assert out['latents_gen'][0].shape[1] == N_LATENTS

    def test_syllable_movies_wrapper(self, store, tmp_path):
        from behavenet_tpu.plotting.arhmm_utils import make_syllable_movies_wrapper
        hp = store['hparams_for']('arhmm')
        out = str(tmp_path / 'syllables')
        make_syllable_movies_wrapper(hp, out, max_frames=6, frame_rate=5,
                                     n_pre_frames=1)
        assert [f for f in os.listdir(tmp_path) if f.startswith('syllables')]
        _close_all()

    @pytest.mark.parametrize('conditional', [True, False])
    def test_real_vs_sampled_wrapper(self, store, tmp_path, conditional):
        from behavenet_tpu.plotting.arhmm_utils import real_vs_sampled_wrapper
        hp = store['hparams_for']('arhmm')
        out = str(tmp_path / ('rvs_%s' % conditional))
        real_vs_sampled_wrapper('both', hp, out, sess_idx=0,
                                conditional=conditional, max_frames=6,
                                frame_rate=5)
        assert [f for f in os.listdir(tmp_path) if f.startswith('rvs_')]
        _close_all()

    def test_state_plots(self, store, tmp_path):
        from behavenet_tpu.plotting.arhmm_utils import (
            get_model_latents_states, plot_dynamics_matrices, plot_obs_biases,
            plot_obs_covariance_matrices, plot_state_transition_matrix,
            plot_states_overlaid_with_latents)
        hmm = self._hmm(store)
        for fn in (plot_state_transition_matrix, plot_dynamics_matrices,
                   plot_obs_biases, plot_obs_covariance_matrices):
            fig = fn(hmm)
            assert fig is not None
            _close_all()
        hp = store['hparams_for']('arhmm')
        out = get_model_latents_states(hp, '')
        save = str(tmp_path / 'overlaid')
        fig = plot_states_overlaid_with_latents(
            out['latents_dict']['test'][0], out['states_dict']['test'][0],
            save_file=save)
        assert fig is not None
        assert [f for f in os.listdir(tmp_path) if f.startswith('overlaid')]
        _close_all()


# ----------------------------------------
# decoder_utils
# ----------------------------------------

class TestDecoderUtils:

    def _dec_hparams(self, store):
        hp = store['hparams_for']('neural-ae')
        return hp

    def test_r2_collection_pipeline(self, store):
        from behavenet_tpu.plotting.decoder_utils import (
            get_best_models, get_r2s_across_trials, get_r2s_by_trial)
        hp = self._dec_hparams(store)
        df = get_r2s_by_trial(hp, ['mlp'])
        assert len(df) > 0
        assert {'version', 'region', 'dataset', 'model_type'}.issubset(df.columns)
        best = get_best_models(df)
        assert len(best) > 0
        r2s = get_r2s_across_trials(hp, best)
        assert len(r2s) > 0
        assert np.all(np.isfinite(r2s['r2'].values))

    def test_neural_reconstruction_movie_wrapper(self, store, tmp_path):
        from behavenet_tpu.plotting.decoder_utils import \
            make_neural_reconstruction_movie_wrapper
        hp = dict(self._dec_hparams(store),
                  ae_model_class='ae', ae_model_type='conv',
                  ae_experiment_name=AE_EXPT,
                  decoder_experiment_name=DEC_EXPT)
        out = str(tmp_path / 'neural_recon')
        make_neural_reconstruction_movie_wrapper(
            hp, out, max_frames=6, max_latents=4, frame_rate=5)
        assert [f for f in os.listdir(tmp_path) if f.startswith('neural_recon')]
        _close_all()

    def test_neural_reconstruction_traces_wrapper(self, store, tmp_path):
        from behavenet_tpu.fitting.experiment import get_expt_dir, get_session_dir
        from behavenet_tpu.plotting.decoder_utils import \
            plot_neural_reconstruction_traces_wrapper
        hp = self._dec_hparams(store)
        # resolve the export pickle paths the wrapper consumes
        hp_ae = dict(hp, model_class='ae', model_type='conv',
                     experiment_name=AE_EXPT)
        hp_ae['session_dir'], _ = get_session_dir(hp_ae, session_source='save')
        ae_dir = os.path.join(get_expt_dir(hp_ae), 'version_0')
        hp['session_dir'] = hp_ae['session_dir']
        dec_dir = os.path.join(get_expt_dir(hp), 'version_0')
        sess = '%s_%s_%s_%s' % (LAB, EXPT, ANIMAL, SESSIONS[0])
        hp['ae_model_latents_file'] = os.path.join(ae_dir, sess + '_latents.pkl')
        hp['decoder_predictions_file'] = os.path.join(
            dec_dir, sess + '_predictions.pkl')
        out = str(tmp_path / 'traces')
        fig = plot_neural_reconstruction_traces_wrapper(hp, save_file=out)
        assert fig is not None
        assert [f for f in os.listdir(tmp_path) if f.startswith('traces')]
        _close_all()


# ----------------------------------------
# cond_ae_utils (PS-VAE)
# ----------------------------------------

class TestCondAeUtils:

    def _load_psvae(self, store):
        from behavenet_tpu.fitting.experiment import get_best_model_and_data
        from behavenet_tpu.models import PSVAE
        hp = store['hparams_for']('ps-vae')
        model, params, dg = get_best_model_and_data(hp, PSVAE, version=0)
        return hp, model, params, dg

    def test_get_input_range(self, store):
        from behavenet_tpu.fitting.experiment import get_expt_dir, get_session_dir
        from behavenet_tpu.plotting.cond_ae_utils import get_input_range
        hp = store['hparams_for']('ps-vae')
        hp['session_dir'], sess_ids = get_session_dir(hp, session_source='save')
        hp['expt_dir'] = get_expt_dir(hp)
        rng = get_input_range('latents', hp, sess_ids=sess_ids, version=0)
        assert rng['min'].shape == (N_LATENTS,)
        assert np.all(rng['max'] >= rng['min'])
        rng_l = get_input_range('labels', hp, sess_ids=sess_ids, version=0)
        assert rng_l['min'].shape == (N_LABELS,)

    def test_get_model_input_and_label_reconstructions(self, store, tmp_path):
        from behavenet_tpu.plotting.cond_ae_utils import (
            get_model_input, plot_label_reconstructions)
        hp, model, params, dg = self._load_psvae(store)
        ims, _, latents, labels, _, labels_2d, _ = get_model_input(
            dg, hp, model, params=params, trial_idx=0, max_frames=6,
            compute_latents=True, compute_2d_labels=False)
        assert ims.shape[0] == latents.shape[0]
        out = str(tmp_path / 'label_recon')
        figs = plot_label_reconstructions(
            model, params, dg, trials=[int(dg.datasets[0].batch_idxs['test'][0])],
            save_file=out)
        assert [f for f in os.listdir(tmp_path) if f.startswith('label_recon')]
        _close_all()

    def test_latent_traversals_plot_and_movie(self, store, tmp_path):
        from behavenet_tpu.plotting.cond_ae_utils import (
            get_model_input, make_latent_traversal_movie, plot_latent_traversals)
        hp, model, params, dg = self._load_psvae(store)
        ims, _, latents, labels, _, _, _ = get_model_input(
            dg, hp, model, params=params, trial_idx=0, max_frames=2,
            compute_latents=True, compute_2d_labels=False)
        fig = plot_latent_traversals(
            model, params, ims_0=ims[:1], latents_0=latents[:1],
            latent_range={'min': -2 * np.ones(N_LATENTS),
                          'max': 2 * np.ones(N_LATENTS)},
            latent_idxs=[N_LABELS], n_frames=3,
            save_file=str(tmp_path / 'trav'))
        assert [f for f in os.listdir(tmp_path) if f.startswith('trav')]
        _close_all()
        make_latent_traversal_movie(
            model, params, ims_0=ims[:1], latents_0=latents[:1],
            latent_range={'min': -2 * np.ones(N_LATENTS),
                          'max': 2 * np.ones(N_LATENTS)},
            latent_idxs=[N_LABELS], n_frames=3, n_buffer=1,
            save_file=str(tmp_path / 'trav_movie'), frame_rate=5)
        assert [f for f in os.listdir(tmp_path) if f.startswith('trav_movie')]
        _close_all()

    def test_psvae_training_curves(self, store, tmp_path):
        from behavenet_tpu.plotting.cond_ae_utils import plot_psvae_training_curves
        hp = store['hparams_for']('ps-vae')
        out = str(tmp_path / 'psvae_curves')
        g = plot_psvae_training_curves(
            hp, alphas=[100], betas=[1], rng_seeds_model=[0],
            n_ae_latents=N_LATENTS, save_file=out)
        assert g is not None
        assert [f for f in os.listdir(tmp_path) if f.startswith('psvae_curves')]
        _close_all()

    def test_hyperparameter_search_results(self, store, tmp_path):
        from behavenet_tpu.plotting.cond_ae_utils import \
            plot_hyperparameter_search_results
        hp = store['hparams_for']('ps-vae')
        out = str(tmp_path / 'hparam_search')
        plot_hyperparameter_search_results(
            LAB, EXPT, ANIMAL, SESSIONS[0], N_LATENTS,
            label_names=['x', 'y'],
            alpha_weights=[100], alpha_n_ae_latents=[N_LATENTS],
            alpha_expt_name=PSVAE_EXPT,
            beta_weights=[1], beta_expt_name=PSVAE_EXPT,
            save_file=out, save_dir=hp['save_dir'])
        assert [f for f in os.listdir(tmp_path) if f.startswith('hparam_search')]
        _close_all()

    def test_label_r2_and_classifier(self, store):
        from behavenet_tpu.fitting.experiment import get_expt_dir, get_session_dir
        from behavenet_tpu.plotting.cond_ae_utils import (
            fit_classifier, get_label_r2)
        hp, model, params, dg = self._load_psvae(store)
        hp['session_dir'], _ = get_session_dir(hp, session_source='save')
        hp['expt_dir'] = get_expt_dir(hp)
        df = get_label_r2(hp, model, params, dg, version=0,
                          label_names=['x', 'y'])
        assert len(df) > 0
        rs = np.random.RandomState(0)
        z = np.vstack([rs.randn(50, 2) + 2, rs.randn(50, 2) - 2])
        y = np.repeat([0, 1], 50)
        _, acc = fit_classifier(z, y)
        assert acc > 0.9


# ----------------------------------------
# cond_ae_utils (MSPS-VAE)
# ----------------------------------------

class TestMspsUtils:

    def test_mspsvae_training_curves(self, store, tmp_path):
        from behavenet_tpu.fitting.experiment import get_expt_dir, get_session_dir
        from behavenet_tpu.plotting.cond_ae_utils import plot_mspsvae_training_curves
        hp = store['hparams_for']('msps-vae')
        # enumerate sessions on the data side: the save tree only has stores
        # for sessions that were fit individually
        hp['session_dir'], _ = get_session_dir(hp, session_source='data')
        version_dir = os.path.join(get_expt_dir(hp), 'version_0')
        out = str(tmp_path / 'msps_curves')
        fig = plot_mspsvae_training_curves(
            hp, alpha=100, beta=1, delta=10, rng_seed_model=0,
            n_latents=MSPS_LATENTS, n_background=N_BACKGROUND,
            n_labels=N_LABELS, lab=LAB, expt=EXPT, version_dir=version_dir,
            save_file=out)
        assert [f for f in os.listdir(tmp_path) if f.startswith('msps_curves')]
        _close_all()

    def test_session_swap_movie(self, store, tmp_path):
        from behavenet_tpu.fitting.experiment import get_expt_dir, get_session_dir
        from behavenet_tpu.plotting.cond_ae_utils import make_session_swap_movie
        hp = store['hparams_for']('msps-vae')
        hp['session_dir'], sess_ids = get_session_dir(hp, session_source='data')
        hp['expt_dir'] = get_expt_dir(hp)
        assert len(sess_ids) == 2
        out = str(tmp_path / 'swap')
        make_session_swap_movie(
            sess_ids, hp, version=0, n_labels=N_LABELS,
            n_background=N_BACKGROUND, sess_idx=0, trials=[0],
            save_file=out, frame_rate=5)
        assert [f for f in os.listdir(tmp_path) if f.startswith('swap')]
        _close_all()
