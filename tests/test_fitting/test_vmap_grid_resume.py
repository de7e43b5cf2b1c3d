"""Group mid-run resume for grid-in-one-program fits.

The grouped trials share one data stream and one compiled program, so the
group checkpoints and restarts as a unit (``last_checkpoint_group.pkl`` in
the first trial's version dir); an interrupted-and-resumed group fit must
match an uninterrupted one per trial, param for param — the same contract
tests/test_fitting/test_resume.py pins for the sequential trainer.
"""

import os

import h5py
import numpy as np
import pytest

import jax

from behavenet_tpu.data.generator import ConcatSessionsGenerator
from behavenet_tpu.fitting.experiment import Experiment
from behavenet_tpu.fitting.vmap_grid import fit_vmap_grid
from behavenet_tpu.models import AE
from behavenet_tpu.models import arch as arch_mod

TRIAL_LRS = (1e-3, 3e-4)


@pytest.fixture
def setup(tmpdir):
    data_dir = str(tmpdir.join('data'))
    path = os.path.join(data_dir, 'l', 'e', 'a', 's', 'data.hdf5')
    os.makedirs(os.path.dirname(path))
    rng = np.random.RandomState(0)
    with h5py.File(path, 'w', libver='latest') as f:
        gi = f.create_group('images')
        for i in range(12):
            gi.create_dataset('trial_%04i' % i,
                              data=rng.randint(0, 255, (20, 1, 16, 12)), dtype='uint8')

    small = {
        'ae_network_type': 'strides_only', 'ae_padding_type': 'same',
        'ae_batch_norm': 0, 'symmetric_arch': 1,
        'ae_encoding_n_channels': [8, 16],
        'ae_encoding_kernel_size': [5, 5],
        'ae_encoding_stride_size': [2, 2],
        'ae_encoding_layer_type': ['conv', 'conv'],
        'ae_decoding_last_FF_layer': 0,
        'ae_input_dim': [1, 16, 12], 'n_ae_latents': 3,
    }
    small = arch_mod.get_handcrafted_dims(small, symmetric=True)

    def make(expt_dir, max_n_epochs, resume=False):
        base = dict(
            small, model_class='ae', model_type='conv', n_ae_latents=3,
            n_input_channels=1, y_pixels=16, x_pixels=12,
            l2_reg=0.0, rng_seed_model=0, rng_seed_train=0,
            max_n_epochs=max_n_epochs, min_n_epochs=1, val_check_interval=1,
            enable_early_stop=False, early_stop_history=10,
            export_latents=False, expt_dir=expt_dir, rng_seed_data=0)
        if resume:
            base['resume_version'] = 0
        hparams_list = [dict(base, learning_rate=lr) for lr in TRIAL_LRS]
        ids = {'lab': 'l', 'expt': 'e', 'animal': 'a', 'session': 's'}
        np.random.seed(0)
        gen = ConcatSessionsGenerator(
            data_dir, [ids], signals_list=[['images']], transforms_list=[[None]],
            paths_list=[[path]], rng_seed=0,
            trial_splits={'train_tr': 8, 'val_tr': 1, 'test_tr': 1, 'gap_tr': 0})
        models = [AE(hp) for hp in hparams_list]
        return hparams_list, models, gen

    return make


def _run_group(tmpdir, setup, tag, max_n_epochs, resume=False):
    expt = str(tmpdir.join('expt_%s' % tag))
    hparams_list, models, gen = setup(expt, max_n_epochs, resume=resume)
    exps = []
    for i, hp in enumerate(hparams_list):
        sub = os.path.join(expt, 'x%i' % i)
        exps.append(Experiment('g', sub, version=0 if resume else None))
        hp['expt_dir'] = os.path.join(sub, 'g')
    return fit_vmap_grid(hparams_list, models, gen, exps, method='ae',
                         mesh=None), hparams_list


def _assert_trees_close(a, b, atol=1e-5):
    fa = sorted(jax.tree_util.tree_leaves_with_path(a), key=lambda kv: str(kv[0]))
    fb = sorted(jax.tree_util.tree_leaves_with_path(b), key=lambda kv: str(kv[0]))
    assert len(fa) == len(fb)
    for (ka, va), (_, vb) in zip(fa, fb):
        assert np.allclose(np.asarray(va), np.asarray(vb), atol=atol), str(ka)


class TestVmapGridResume:

    def test_resumed_group_matches_uninterrupted(self, tmpdir, setup):
        # run A: 4 epochs straight
        best_a, _ = _run_group(tmpdir, setup, 'a', max_n_epochs=4)

        # run B: 2 epochs, then resume the group to 4
        best_b0, hps = _run_group(tmpdir, setup, 'b', max_n_epochs=2)
        ckpt = os.path.join(hps[0]['expt_dir'], 'version_0',
                            'last_checkpoint_group.pkl')
        assert os.path.exists(ckpt)
        best_b, _ = _run_group(tmpdir, setup, 'b', max_n_epochs=4, resume=True)

        assert len(best_a) == len(best_b) == len(TRIAL_LRS)
        for pa, pb in zip(best_a, best_b):
            _assert_trees_close(pa, pb)

    def test_cli_layout_group_resume(self, tmpdir, setup):
        """The CLI layout: ALL grid trials share one expt_dir and own
        different version numbers (experiment.py get_expt_dir keys only on
        model class/type/latents). resume_version is a single int naming
        the FIRST trial's version; group_resume_versions maps the others
        back to their own versions from the group checkpoint — reopening
        version_0 for every trial would clobber it."""
        from behavenet_tpu.fitting.vmap_grid import group_resume_versions

        def run(tag, max_n_epochs, resume=False):
            expt = str(tmpdir.join('cli_%s' % tag))
            hparams_list, models, gen = setup(expt, max_n_epochs,
                                              resume=resume)
            expt_dir = os.path.join(expt, 'g')
            versions = [None] * len(hparams_list)
            if resume:
                versions = group_resume_versions(
                    expt_dir, version0=0, n_trials=len(hparams_list))
            exps = []
            for hp, v in zip(hparams_list, versions):
                hp['expt_dir'] = expt_dir
                if resume:
                    hp['resume_version'] = v
                exps.append(Experiment('g', expt, version=v))
                hp['version'] = exps[-1].version  # as create_experiment does
            return fit_vmap_grid(hparams_list, models, gen, exps,
                                 method='ae', mesh=None), hparams_list

        best_a, _ = run('a', max_n_epochs=4)

        best_b0, hps = run('b', max_n_epochs=2)
        # CLI layout: one expt_dir, auto-allocated versions 0 and 1
        expt_dir = hps[0]['expt_dir']
        assert {hp['version'] for hp in hps} == {0, 1}
        assert os.path.exists(os.path.join(
            expt_dir, 'version_0', 'last_checkpoint_group.pkl'))
        assert group_resume_versions(expt_dir, 0, len(hps)) == [0, 1]

        best_b, hps_b = run('b', max_n_epochs=4, resume=True)
        assert [hp['resume_version'] for hp in hps_b] == [0, 1]
        for pa, pb in zip(best_a, best_b):
            _assert_trees_close(pa, pb)

    def test_group_resume_versions_errors(self, tmpdir, setup):
        from behavenet_tpu.fitting.vmap_grid import group_resume_versions

        expt = str(tmpdir.join('cli_err'))
        hparams_list, models, gen = setup(expt, 1)
        expt_dir = os.path.join(expt, 'g')
        exps = []
        for hp in hparams_list:
            hp['expt_dir'] = expt_dir
            exps.append(Experiment('g', expt))
        # no checkpoint yet
        with pytest.raises(FileNotFoundError, match='no group checkpoint'):
            group_resume_versions(expt_dir, 0, len(hparams_list))
        fit_vmap_grid(hparams_list, models, gen, exps, method='ae', mesh=None)
        # regrouped grid (different trial count) must refuse, not clobber
        with pytest.raises(ValueError, match='regrouped'):
            group_resume_versions(expt_dir, 0, len(hparams_list) + 1)
        # resume_version naming a non-first trial must refuse
        with pytest.raises(FileNotFoundError):
            group_resume_versions(expt_dir, 1, len(hparams_list))

    def test_signature_mismatch_starts_fresh(self, tmpdir, setup, capsys):
        """A checkpoint from a differently-grouped grid is ignored, not
        half-loaded (the group is the resume unit)."""
        _run_group(tmpdir, setup, 'c', max_n_epochs=1)
        expt = str(tmpdir.join('expt_c'))
        hparams_list, models, gen = setup(expt, 2, resume=True)
        # same version dirs, different trial hparams -> signature mismatch
        hparams_list[1]['learning_rate'] = 5e-4
        exps = []
        for i, hp in enumerate(hparams_list):
            sub = os.path.join(expt, 'x%i' % i)
            exps.append(Experiment('g', sub, version=0))
            hp['expt_dir'] = os.path.join(sub, 'g')
        best = fit_vmap_grid(hparams_list, models, gen, exps, method='ae',
                             mesh=None)
        assert 'signature mismatch' in capsys.readouterr().out
        assert len(best) == len(TRIAL_LRS)
