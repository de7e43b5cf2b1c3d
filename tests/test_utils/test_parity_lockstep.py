"""Short lockstep torch-parity regressions for the full model matrix.

The full 200-step harness lives in tools/parity_check.py (run by bench.py);
these short runs catch regressions in loss arithmetic, weight import, the
shared-eps sampling path, and the torch-exact optimizer.
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..', 'tools'))

import parity_check  # noqa: E402


class TestLockstepParity:

    def test_vae_lockstep_short(self):
        # anneal_epochs=6 < n_steps so the ramp AND the reference's
        # post-ramp drop to beta=1 (vaes.py:96-98) are both exercised
        gap = parity_check.parity_vae(n_steps=12, batch=16, report_every=1000,
                                      anneal_epochs=6)
        assert gap < 1e-4, 'vae lockstep gap %.6f%%' % (gap * 100)

    def test_btcvae_lockstep_short(self):
        gap = parity_check.parity_btcvae(n_steps=12, batch=16, report_every=1000,
                                         anneal_epochs=6)
        assert gap < 1e-4, 'btcvae lockstep gap %.6f%%' % (gap * 100)

    def test_condae_lockstep_short(self):
        # conditional_encoder=True: covers the one-hot-2D encoder-input
        # concat AND the latent-layer label concat
        gap = parity_check.parity_condae(n_steps=12, batch=16, report_every=1000)
        assert gap < 1e-4, 'condae lockstep gap %.6f%%' % (gap * 100)

    def test_condvae_lockstep_short(self):
        gap = parity_check.parity_condvae(n_steps=12, batch=16, report_every=1000,
                                          anneal_epochs=6)
        assert gap < 1e-4, 'condvae lockstep gap %.6f%%' % (gap * 100)

    def test_aemsp_lockstep_short(self):
        gap = parity_check.parity_aemsp(n_steps=12, batch=16, report_every=1000)
        assert gap < 1e-4, 'aemsp lockstep gap %.6f%%' % (gap * 100)

    def test_psvae_lockstep_short(self):
        gap = parity_check.parity_psvae(n_steps=12, batch=16, report_every=1000)
        assert gap < 1e-4, 'psvae lockstep gap %.6f%%' % (gap * 100)

    def test_mspsvae_lockstep_short(self):
        # batch=18 -> 6 rows per triplet chunk; covers the shared-permutation
        # triplet path and the background-subspace import
        gap = parity_check.parity_mspsvae(n_steps=12, batch=18, report_every=1000)
        assert gap < 1e-4, 'mspsvae lockstep gap %.6f%%' % (gap * 100)

    def test_decoder_lockstep_short(self):
        gap = parity_check.parity_decoder(n_steps=12, T=120, report_every=1000)
        assert gap < 1e-4, 'decoder lockstep gap %.6f%%' % (gap * 100)

    def test_convdecoder_lockstep_short(self):
        # covers the decoder-only torch_import path (no encoder pytree)
        gap = parity_check.parity_convdecoder(n_steps=12, batch=16, report_every=1000)
        assert gap < 1e-4, 'convdecoder lockstep gap %.6f%%' % (gap * 100)
