"""Transforms checked numerically (reference tests/test_data/test_transforms.py)."""

import numpy as np
import pytest

from behavenet_tpu.data import transforms


class TestCompose:

    def test_chain(self):
        t = transforms.Compose([transforms.ZScore(), transforms.ClipNormalize(2.0)])
        x = np.random.RandomState(0).randn(100, 3) * 5
        out = t(x.copy())
        assert out.max() <= 1.0


class TestBlockShuffle:

    def test_run_multiset_invariance(self):
        """Shuffling permutes runs: run-length multiset per state is preserved."""
        x = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 0, 0, 1], dtype=float)
        out = transforms.BlockShuffle(0)(x)

        def run_lengths(arr):
            lens = {}
            prev, count = arr[0], 1
            for v in arr[1:]:
                if v == prev:
                    count += 1
                else:
                    lens.setdefault(prev, []).append(count)
                    prev, count = v, 1
            lens.setdefault(prev, []).append(count)
            return {k: sorted(v) for k, v in lens.items()}

        assert sorted(out.tolist()) == sorted(x.tolist())

    def test_nan_passthrough(self):
        x = np.full(10, np.nan)
        out = transforms.BlockShuffle(0)(x)
        assert np.isnan(out).all()

    def test_deterministic(self):
        x = np.array([0, 0, 1, 1, 2, 2, 0, 0], dtype=float)
        o1 = transforms.BlockShuffle(5)(x)
        o2 = transforms.BlockShuffle(5)(x)
        assert (o1 == o2).all()


class TestClipNormalize:

    def test_clip(self):
        x = np.array([0.0, 1.0, 5.0, 10.0])
        out = transforms.ClipNormalize(5.0)(x)
        assert np.allclose(out, [0.0, 0.2, 1.0, 1.0])

    def test_invalid(self):
        with pytest.raises(ValueError):
            transforms.ClipNormalize(0)


class TestMakeOneHot:

    def test_basic(self):
        x = np.array([0.0, 2.0, 1.0, 2.0])
        out = transforms.MakeOneHot()(x)
        assert out.shape == (4, 3)
        assert (out.argmax(axis=1) == [0, 2, 1, 2]).all()
        assert (out.sum(axis=1) == 1).all()

    def test_already_onehot_passthrough(self):
        x = np.eye(3)
        assert (transforms.MakeOneHot()(x) == x).all()

    def test_nan(self):
        x = np.array([0.0, np.nan, 1.0])
        out = transforms.MakeOneHot()(x)
        assert np.isnan(out).all()

    def test_fixed_n_classes(self):
        """Explicit width keeps trials consistent even when a trial skips
        states (decoder inputs must have a static channel count)."""
        x = np.array([0.0, 1.0, 0.0])  # never visits state 2
        out = transforms.MakeOneHot(n_classes=4)(x)
        assert out.shape == (3, 4)
        assert out.dtype == np.float32
        assert (out.sum(axis=1) == 1).all()


class TestMakeOneHot2D:

    def test_coordinate_placement(self):
        """x-coords first half, y-coords second half (reference :91-137)."""
        t = transforms.MakeOneHot2D(10, 8)
        sample = np.array([[3.0, 6.0]])  # one label: x=3, y=6
        out = t(sample)
        assert out.shape == (1, 1, 10, 8)
        assert out[0, 0, 6, 3] == 1
        assert out.sum() == 1

    def test_clipping(self):
        t = transforms.MakeOneHot2D(10, 8)
        out = t(np.array([[100.0, -5.0]]))
        assert out[0, 0, 0, 7] == 1

    def test_multiple_labels(self):
        t = transforms.MakeOneHot2D(6, 6)
        # labels: (x1=1, y1=2), (x2=3, y2=4)
        out = t(np.array([[1.0, 3.0, 2.0, 4.0]]))
        assert out.shape == (1, 2, 6, 6)
        assert out[0, 0, 2, 1] == 1
        assert out[0, 1, 4, 3] == 1


class TestMotionEnergy:

    def test_abs_diff(self):
        x = np.array([[0.0, 0.0], [1.0, -1.0], [3.0, -4.0]])
        out = transforms.MotionEnergy()(x)
        assert (out[0] == 0).all()
        assert np.allclose(out[1], [1, 1])
        assert np.allclose(out[2], [2, 3])


class TestSelectIdxs:

    def test_select(self):
        x = np.arange(12).reshape(3, 4)
        out = transforms.SelectIdxs([0, 2])(x)
        assert (out == x[:, [0, 2]]).all()


class TestThreshold:

    def test_drops_low_rate_channels(self):
        # bin_size 25 ms: rate = mean/0.025
        x = np.zeros((100, 3))
        x[:, 0] = 1.0   # 40 Hz
        x[:, 1] = 0.01  # 0.4 Hz
        x[:, 2] = 0.5   # 20 Hz
        out = transforms.Threshold(threshold=1.0, bin_size=25)(x)
        assert out.shape == (100, 2)

    def test_invalid_args(self):
        with pytest.raises(ValueError):
            transforms.Threshold(threshold=1.0, bin_size=0)
        with pytest.raises(ValueError):
            transforms.Threshold(threshold=-1.0, bin_size=25)


class TestZScore:

    def test_zscore(self):
        x = np.random.RandomState(0).randn(200, 4) * 3 + 2
        out = transforms.ZScore()(x)
        assert np.allclose(out.mean(axis=0), 0, atol=1e-6)
        assert np.allclose(out.std(axis=0), 1, atol=1e-6)
