"""Driver entry points: single-chip forward + multichip dp dry run."""

import sys
import os

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


class TestGraftEntry:

    def test_entry_forward_jits(self):
        import __graft_entry__ as g
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        # AE reconstruction matches the example batch's shape (currently the
        # 2-view Musall headline (8, 128, 128, 2); don't re-pin it here)
        assert out.shape == args[1].shape
        assert np.isfinite(np.asarray(out)).all()

    def test_dryrun_multichip_8(self):
        import __graft_entry__ as g
        g.dryrun_multichip(8)  # asserts internally

    def test_dryrun_multichip_2(self):
        import __graft_entry__ as g
        g.dryrun_multichip(2)
