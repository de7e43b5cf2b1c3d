"""State-chunk extraction / durations (mirrors reference
tests/test_plotting/test_arhmm_utils.py behavior with a stub hmm)."""

import numpy as np

from behavenet_tpu.plotting import concat, get_crop
from behavenet_tpu.plotting.arhmm_utils import (
    get_discrete_chunks, get_state_durations)


class StubHMM:
    """Only the surface get_state_durations touches: .K + most_likely_states."""

    def __init__(self, K):
        self.K = K
        self._z = None

    def most_likely_states(self, x):
        # deterministic: state = sign bucket of first latent dim
        return (np.asarray(x)[:, 0] > 0).astype(int)


class TestGetDiscreteChunks:

    def test_basic_runs(self):
        states = [np.array([0, 0, 1, 1, 1, 0])]
        chunks = get_discrete_chunks(states, include_edges=True)
        assert len(chunks) == 2
        # state 0: [0,2) and [5,6); state 1: [2,5)
        assert chunks[0].tolist() == [[0, 0, 2], [0, 5, 6]]
        assert chunks[1].tolist() == [[0, 2, 5]]

    def test_exclude_edges(self):
        states = [np.array([0, 0, 1, 1, 1, 0])]
        chunks = get_discrete_chunks(states, include_edges=False)
        # only the interior run of state 1 survives
        assert len(chunks[0]) == 0
        assert chunks[1].tolist() == [[0, 2, 5]]

    def test_multiple_trials_indexing(self):
        states = [np.array([0, 1]), np.array([1, 1, 0])]
        chunks = get_discrete_chunks(states, include_edges=True)
        trials_state1 = sorted(row[0] for row in chunks[1])
        assert trials_state1 == [0, 1]

    def test_unused_state_empty(self):
        states = [np.array([0, 0, 2, 2])]
        chunks = get_discrete_chunks(states, include_edges=True)
        assert len(chunks) == 3
        assert len(chunks[1]) == 0


class TestGetStateDurations:

    def test_durations_match_runs(self):
        hmm = StubHMM(K=2)
        x = np.array([[-1.0], [-1.0], [2.0], [2.0], [2.0], [-1.0]])
        durs = get_state_durations([x], hmm)
        assert sorted(durs[0].tolist()) == [1, 2]
        assert durs[1].tolist() == [3]

    def test_single_state_hmm_returns_empty(self):
        hmm = StubHMM(K=1)
        assert get_state_durations([np.zeros((5, 1))], hmm) == []

    def test_skips_empty_trials(self):
        hmm = StubHMM(K=2)
        x = np.array([[1.0], [1.0]])
        durs = get_state_durations([x, np.zeros((0, 1))], hmm)
        assert durs[1].tolist() == [2]


class TestImageHelpers:

    def test_concat_axes(self):
        ims = np.arange(2 * 3 * 4).reshape(2, 3, 4)
        assert concat(ims, axis=1).shape == (3, 8)
        assert concat(ims, axis=0).shape == (6, 4)

    def test_get_crop_interior(self):
        im = np.arange(100).reshape(10, 10).astype(float)
        crop = get_crop(im, 5, 2, 5, 2)
        assert crop.shape == (4, 4)
        assert np.array_equal(crop, im[3:7, 3:7])

    def test_get_crop_border_zero_fill(self):
        im = np.ones((10, 10))
        crop = get_crop(im, 9, 2, 9, 2)
        assert crop.shape == (4, 4)
        # bottom-right corner: only 3x3 of real pixels, rest zero-filled
        assert crop.sum() == 9
