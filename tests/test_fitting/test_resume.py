"""Mid-training resume: interrupted-and-resumed run matches an uninterrupted run."""

import json
import os

import h5py
import numpy as np
import pytest

import jax

from behavenet_tpu.data.generator import ConcatSessionsGenerator
from behavenet_tpu.fitting.experiment import Experiment
from behavenet_tpu.fitting.training import fit
from behavenet_tpu.models import AE
from behavenet_tpu.models import arch as arch_mod


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

    a = arch_mod.load_handcrafted_arch([1, 16, 12], 3, None, check_memory=False)
    # shrink to 2 layers for speed
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

    def make(expt_dir, max_n_epochs, resume_version=None):
        hparams = dict(
            small, model_class='ae', model_type='conv', n_ae_latents=3,
            n_input_channels=1, y_pixels=16, x_pixels=12,
            learning_rate=1e-3, l2_reg=0.0, rng_seed_model=0, rng_seed_train=0,
            max_n_epochs=max_n_epochs, min_n_epochs=1, val_check_interval=1,
            enable_early_stop=False, early_stop_history=10,
            export_latents=False, expt_dir=expt_dir, rng_seed_data=0)
        if resume_version is not None:
            hparams['resume_version'] = resume_version
        ids = {'lab': 'l', 'expt': 'e', 'animal': 'a', 'session': 's'}
        np.random.seed(0)
        gen = ConcatSessionsGenerator(
            data_dir, [ids], signals_list=[['images']], transforms_list=[[None]],
            paths_list=[[path]], rng_seed=0,
            trial_splits={'train_tr': 8, 'val_tr': 1, 'test_tr': 1, 'gap_tr': 0})
        model = AE(hparams)
        return hparams, model, gen

    return make


def _final_params(expt_dir, version):
    from behavenet_tpu.models.base import load_params
    p, _ = load_params(os.path.join(expt_dir, 'version_%i' % version, 'best_val_model.pt'))
    return p


class TestResume:

    def test_resumed_run_matches_uninterrupted(self, tmpdir, setup):
        # run A: 4 epochs straight
        expt_a = str(tmpdir.join('expt_a'))
        hp, model, gen = setup(expt_a, max_n_epochs=4)
        exp = Experiment('x', expt_a)
        # Experiment('x', dir) creates dir/x/version_0 but fit expects
        # expt_dir/version_%i; align by pointing expt_dir at dir/x
        hp['expt_dir'] = os.path.join(expt_a, 'x')
        fit(hp, model, gen, exp, method='ae')
        params_a = _final_params(hp['expt_dir'], 0)

        # run B: 2 epochs, then resume to 4
        expt_b = str(tmpdir.join('expt_b'))
        hp, model, gen = setup(expt_b, max_n_epochs=2)
        exp = Experiment('x', expt_b)
        hp['expt_dir'] = os.path.join(expt_b, 'x')
        fit(hp, model, gen, exp, method='ae')
        assert os.path.exists(os.path.join(hp['expt_dir'], 'version_0', 'last_checkpoint.pkl'))

        hp2, model2, gen2 = setup(expt_b, max_n_epochs=4, resume_version=0)
        exp2 = Experiment('x', expt_b, version=0)
        hp2['expt_dir'] = os.path.join(expt_b, 'x')
        fit(hp2, model2, gen2, exp2, method='ae')
        params_b = _final_params(hp2['expt_dir'], 0)

        flat_a = jax.tree_util.tree_leaves_with_path(params_a)
        flat_b = jax.tree_util.tree_leaves_with_path(params_b)
        flat_a = sorted(flat_a, key=lambda kv: str(kv[0]))
        flat_b = sorted(flat_b, key=lambda kv: str(kv[0]))
        assert len(flat_a) == len(flat_b)
        for (ka, va), (kb, vb) in zip(flat_a, flat_b):
            assert str(ka) == str(kb)
            assert np.allclose(np.asarray(va), np.asarray(vb), atol=1e-5), \
                'mismatch at %s: %f' % (str(ka), np.abs(np.asarray(va) - np.asarray(vb)).max())

    def test_steps_per_dispatch_matches_single_step_fit(self, tmpdir, setup):
        """fit() with k optimizer steps per dispatch reproduces k=1 exactly."""
        finals = []
        for tag, spd in (('one', 1), ('multi', 3)):
            expt = str(tmpdir.join('expt_%s' % tag))
            hp, model, gen = setup(expt, max_n_epochs=3)
            hp['steps_per_dispatch'] = spd
            exp = Experiment('x', expt)
            hp['expt_dir'] = os.path.join(expt, 'x')
            fit(hp, model, gen, exp, method='ae')
            finals.append(_final_params(hp['expt_dir'], 0))
        flat = [sorted(jax.tree_util.tree_leaves_with_path(p),
                       key=lambda kv: str(kv[0])) for p in finals]
        for (ka, va), (kb, vb) in zip(*flat):
            assert str(ka) == str(kb)
            assert np.allclose(np.asarray(va), np.asarray(vb), atol=1e-5), str(ka)

    def test_prefetch_workers_match_single_worker_fit(self, tmpdir, setup):
        """Parallel-staged prefetch (collate+device_put in a pool) delivers
        batches in producer order, so training is bit-for-bit unchanged."""
        finals = []
        for tag, workers in (('w1', 1), ('w4', 4)):
            expt = str(tmpdir.join('expt_pf_%s' % tag))
            hp, model, gen = setup(expt, max_n_epochs=3)
            hp['prefetch_workers'] = workers
            exp = Experiment('x', expt)
            hp['expt_dir'] = os.path.join(expt, 'x')
            fit(hp, model, gen, exp, method='ae')
            finals.append(_final_params(hp['expt_dir'], 0))
        flat = [sorted(jax.tree_util.tree_leaves_with_path(p),
                       key=lambda kv: str(kv[0])) for p in finals]
        for (ka, va), (kb, vb) in zip(*flat):
            assert str(ka) == str(kb)
            assert np.allclose(np.asarray(va), np.asarray(vb), atol=1e-6), str(ka)

    def test_checkpoint_contents(self, tmpdir, setup):
        expt = str(tmpdir.join('expt'))
        hp, model, gen = setup(expt, max_n_epochs=1)
        exp = Experiment('x', expt)
        hp['expt_dir'] = os.path.join(expt, 'x')
        fit(hp, model, gen, exp, method='ae')
        import pickle
        with open(os.path.join(hp['expt_dir'], 'version_0', 'last_checkpoint.pkl'), 'rb') as f:
            ckpt = pickle.load(f)
        assert set(ckpt) >= {'params', 'opt_state', 'key', 'epoch',
                             'best_val_loss', 'best_val_epoch'}
        assert ckpt['epoch'] == 1
