"""Export round-trips: conv label-decoder image predictions."""

import os
import pickle

import h5py
import numpy as np
import pytest

import jax

from behavenet_tpu.data.generator import ConcatSessionsGenerator
from behavenet_tpu.fitting.eval import export_predictions_conv_decoder
from behavenet_tpu.models import ConvDecoder


@pytest.fixture
def gen_with_labels(tmpdir):
    data_dir = str(tmpdir.join('data'))
    path = os.path.join(data_dir, 'l', 'e', 'a', 's', 'data.hdf5')
    os.makedirs(os.path.dirname(path))
    rng = np.random.RandomState(0)
    n_trials, T = 10, 15
    with h5py.File(path, 'w', libver='latest') as f:
        gi = f.create_group('images')
        gl = f.create_group('labels')
        for i in range(n_trials):
            gi.create_dataset('trial_%04i' % i,
                              data=rng.randint(0, 255, (T, 1, 16, 12)), dtype='uint8')
            gl.create_dataset('trial_%04i' % i,
                              data=rng.randn(T, 4).astype('float32'))
    ids = {'lab': 'l', 'expt': 'e', 'animal': 'a', 'session': 's'}
    gen = ConcatSessionsGenerator(
        data_dir, [ids], signals_list=[['images', 'labels']],
        transforms_list=[[None, None]], paths_list=[[path, path]], rng_seed=0,
        trial_splits={'train_tr': 6, 'val_tr': 1, 'test_tr': 1, 'gap_tr': 0})
    return gen


class TestConvDecoderPredictionExport:

    def test_round_trip(self, tmpdir, gen_with_labels):
        expt_dir = str(tmpdir.join('expt'))
        os.makedirs(os.path.join(expt_dir, 'version_0'))
        hp = {'model_class': 'labels-images', 'model_type': 'linear',
              'n_labels': 4, 'n_input_channels': 1, 'y_pixels': 16, 'x_pixels': 12,
              'expt_dir': expt_dir}
        model = ConvDecoder(hp)
        params = model.init(jax.random.PRNGKey(0))

        files = export_predictions_conv_decoder(
            gen_with_labels, model, params, version=0, expt_dir=expt_dir)
        assert len(files) == 1
        assert files[0].endswith('l_e_a_s_predictions.pkl')

        with open(files[0], 'rb') as f:
            d = pickle.load(f)
        assert set(d) == {'predictions', 'trials'}
        assert len(d['predictions']) == 10
        # every assigned (train/val/test) trial exported as (T, C, H, W)
        # float in [0, 1]; unassigned/gap trials stay empty arrays
        all_trials = np.concatenate([d['trials'][k] for k in ('train', 'val', 'test')])
        exported = [i for i, p in enumerate(d['predictions']) if p.size]
        assert sorted(exported) == sorted(all_trials.tolist())
        for i in exported:
            p = d['predictions'][i]
            assert p.shape == (15, 1, 16, 12)
            assert p.dtype == np.float32
            assert np.isfinite(p).all()  # (linear decoder: no sigmoid range)
