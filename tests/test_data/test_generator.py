"""Trial splitting and dataset/generator behavior (reference test_data_generator.py)."""

import os
import pickle

import h5py
import numpy as np
import pytest

from behavenet_tpu.data.generator import (
    ConcatSessionsGenerator, SingleSessionDataset, split_trials, _load_pkl_dict)


class TestSplitTrials:

    def test_basic_block_counts(self):
        splits = split_trials(100, rng_seed=0, train_tr=8, val_tr=1, test_tr=1, gap_tr=0)
        assert len(splits['train']) == 80
        assert len(splits['val']) == 10
        assert len(splits['test']) == 10

    def test_gap_trials_excluded(self):
        splits = split_trials(100, rng_seed=0, train_tr=6, val_tr=1, test_tr=1, gap_tr=1)
        # block = 6+1+1+3 = 11 -> 9 blocks
        assert len(splits['train']) == 54
        assert len(splits['val']) == 9
        assert len(splits['test']) == 9
        all_idx = np.concatenate([splits['train'], splits['val'], splits['test']])
        assert len(np.unique(all_idx)) == len(all_idx)

    def test_too_few_trials_raises(self):
        with pytest.raises(ValueError):
            split_trials(5, rng_seed=0, train_tr=8, val_tr=1, test_tr=1, gap_tr=0)

    def test_rng_stream_matches_reference_semantics(self):
        """Same np.random call order as the reference => identical splits."""
        n_trials, seed = 50, 3
        tr, va, te, gap = 8, 1, 1, 0
        splits = split_trials(n_trials, rng_seed=seed, train_tr=tr, val_tr=va,
                              test_tr=te, gap_tr=gap)
        # replay the reference RNG stream (data_generator.py:73-88)
        np.random.seed(seed)
        tr_per_block = tr + gap + va + gap + te + gap
        n_blocks = n_trials // tr_per_block
        leftover = n_trials - tr_per_block * n_blocks
        offset = np.random.randint(0, high=leftover) if leftover > 0 else 0
        blocks = np.random.permutation(n_blocks)
        expected_train = np.concatenate(
            [np.arange(b * tr_per_block + offset, b * tr_per_block + offset + tr)
             for b in blocks])
        assert (splits['train'] == expected_train).all()

    def test_deterministic(self):
        s1 = split_trials(60, rng_seed=7)
        s2 = split_trials(60, rng_seed=7)
        for k in s1:
            assert (s1[k] == s2[k]).all()


class TestLoadPklDict:

    def test_load(self, tmpdir):
        path = str(tmpdir.join('latents.pkl'))
        data = {'latents': [np.random.randn(10, 4), np.random.randn(12, 4)]}
        with open(path, 'wb') as f:
            pickle.dump(data, f)
        out = _load_pkl_dict(path, 'latents')
        assert len(out) == 2
        assert out[0].dtype == np.float32
        single = _load_pkl_dict(path, 'latents', idx=1)
        assert single.shape == (12, 4)


@pytest.fixture
def session_hdf5(tmpdir):
    """Small synthetic session."""
    data_dir = str(tmpdir)
    path = os.path.join(data_dir, 'lab', 'expt', 'animal', 'sess', 'data.hdf5')
    os.makedirs(os.path.dirname(path))
    rng = np.random.RandomState(0)
    with h5py.File(path, 'w', libver='latest') as f:
        gi = f.create_group('images')
        gn = f.create_group('neural')
        gl = f.create_group('labels')
        for i in range(12):
            T = 15 + i
            gi.create_dataset('trial_%04i' % i,
                              data=rng.randint(0, 255, (T, 1, 16, 12)), dtype='uint8')
            gn.create_dataset('trial_%04i' % i, data=rng.randn(T, 5), dtype='float32')
            gl.create_dataset('trial_%04i' % i, data=rng.randn(T, 2), dtype='float32')
    return data_dir, path


class TestSingleSessionDataset:

    def test_images_uint8_nhwc(self, session_hdf5):
        data_dir, path = session_hdf5
        ds = SingleSessionDataset(
            data_dir, lab='lab', expt='expt', animal='animal', session='sess',
            signals=['images'], transforms=[None], paths=[path])
        assert ds.n_trials == 12
        sample = ds[3]
        assert sample['images'].dtype == np.uint8
        assert sample['images'].shape == (18, 16, 12, 1)  # NHWC
        assert sample['batch_idx'] == 3

    def test_eager_load_matches_lazy(self, session_hdf5):
        data_dir, path = session_hdf5
        kw = dict(data_dir=data_dir, lab='lab', expt='expt', animal='animal',
                  session='sess', signals=['neural'], transforms=[None], paths=[path])
        lazy = SingleSessionDataset(batch_load=True, **kw)
        eager = SingleSessionDataset(batch_load=False, **kw)
        for i in (0, 5, 11):
            assert np.allclose(lazy[i]['neural'], eager[i]['neural'])

    def test_transform_applied(self, session_hdf5):
        from behavenet_tpu.data.transforms import ZScore
        data_dir, path = session_hdf5
        ds = SingleSessionDataset(
            data_dir, lab='lab', expt='expt', animal='animal', session='sess',
            signals=['neural'], transforms=[ZScore()], paths=[path])
        out = ds[0]['neural']
        assert np.allclose(out.mean(axis=0), 0, atol=1e-5)
        assert np.allclose(out.std(axis=0), 1, atol=1e-4)


class TestConcatSessionsGenerator:

    def _make(self, session_hdf5, **kwargs):
        data_dir, path = session_hdf5
        ids = {'lab': 'lab', 'expt': 'expt', 'animal': 'animal', 'session': 'sess'}
        return ConcatSessionsGenerator(
            data_dir, [ids], signals_list=[['images', 'labels']],
            transforms_list=[[None, None]], paths_list=[[path, path]],
            rng_seed=0, trial_splits={'train_tr': 8, 'val_tr': 1, 'test_tr': 1, 'gap_tr': 0},
            **kwargs)

    def test_batches_cover_split(self, session_hdf5):
        gen = self._make(session_hdf5)
        # 12 trials, block=10 -> 1 block: 8 train, 1 val, 1 test
        assert gen.n_tot_batches['train'] == 8
        assert gen.n_tot_batches['val'] == 1
        assert gen.n_tot_batches['test'] == 1
        gen.reset_iterators('train')
        seen = set()
        for _ in range(8):
            sample, d = gen.next_batch('train')
            assert d == 0
            seen.add(sample['batch_idx'])
        assert seen == set(int(i) for i in gen.datasets[0].batch_idxs['train'])

    def test_train_frac_subsample(self, session_hdf5):
        np.random.seed(0)
        gen = self._make(session_hdf5, train_frac=0.5)
        assert gen.n_tot_batches['train'] == 4

    def test_reset_reshuffles(self, session_hdf5):
        gen = self._make(session_hdf5)
        np.random.seed(0)
        gen.reset_iterators('train')
        order1 = [gen.next_batch('train')[0]['batch_idx'] for _ in range(8)]
        np.random.seed(1)
        gen.reset_iterators('train')
        order2 = [gen.next_batch('train')[0]['batch_idx'] for _ in range(8)]
        assert set(order1) == set(order2)
        assert order1 != order2  # different shuffle (overwhelmingly likely)
