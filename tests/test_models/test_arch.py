"""Architecture generator: dimension math, mirroring, default arch, random draws."""

import numpy as np
import pytest

from behavenet_tpu.models import arch


class TestCalculateOutputDim:

    def test_conv_same_even(self):
        out, b, a = arch.calculate_output_dim(128, 5, 2, 'same', 'conv')
        assert out == 64
        assert (b, a) == (1, 2)

    def test_conv_same_stride1(self):
        out, b, a = arch.calculate_output_dim(16, 3, 1, 'same', 'conv')
        assert out == 16
        assert (b, a) == (1, 1)

    def test_conv_valid(self):
        out, b, a = arch.calculate_output_dim(16, 5, 2, 'valid', 'conv')
        assert out == (16 - 5) // 2 + 1
        assert (b, a) == (0, 0)

    def test_conv_same_stride5(self):
        out, b, a = arch.calculate_output_dim(8, 5, 5, 'same', 'conv')
        assert out == 2
        total = max(0, (out - 1) * 5 + 5 - 8)
        assert b + a == total

    def test_maxpool_same_ceil(self):
        out, _, _ = arch.calculate_output_dim(13, 2, 2, 'same', 'maxpool')
        assert out == 7  # ceil mode

    def test_maxpool_valid_floor(self):
        out, _, _ = arch.calculate_output_dim(13, 2, 2, 'valid', 'maxpool')
        assert out == 6

    def test_maxpool_kernel_not_2_raises(self):
        with pytest.raises(NotImplementedError):
            arch.calculate_output_dim(13, 3, 3, 'same', 'maxpool')


class TestDefaultArch:

    def test_default_arch_dims_128(self):
        """Published default arch on 128x128: spatial dims 64/32/16/8/2."""
        a = arch.load_handcrafted_arch([1, 128, 128], 12, None, batch_size=189,
                                       check_memory=False)
        assert a['ae_encoding_x_dim'] == [64, 32, 16, 8, 2]
        assert a['ae_encoding_y_dim'] == [64, 32, 16, 8, 2]
        assert a['ae_decoding_starting_dim'] == [512, 2, 2]
        # decoder mirrors back to the input resolution
        assert a['ae_decoding_x_dim'][-1] == 128
        assert a['ae_decoding_y_dim'][-1] == 128
        assert a['ae_decoding_n_channels'] == [256, 128, 64, 32, 1]

    def test_nonsquare_input(self):
        a = arch.load_handcrafted_arch([2, 96, 128], 9, None, batch_size=189,
                                       check_memory=False)
        assert a['ae_decoding_x_dim'][-1] == 128
        assert a['ae_decoding_y_dim'][-1] == 96
        assert a['ae_decoding_n_channels'][-1] == 2

    def test_degenerate_arch_raises(self):
        """Too many valid-padding stride-2 layers for a small input: clear
        build-time error rather than an opaque XLA shape failure."""
        a = arch.load_default_arch()
        a['ae_input_dim'] = [1, 32, 24]
        a['ae_padding_type'] = 'valid'
        with pytest.raises(ValueError, match='collapses'):
            arch.get_handcrafted_dims(a)


class TestRandomArchs:

    def test_draw_archs_unique_and_memory_bounded(self):
        archs = arch.draw_archs(100, [1, 64, 48], 10, n_archs=5, check_memory=True,
                                mem_limit_gb=5.0)
        assert len(archs) == 5
        for i, a in enumerate(archs):
            assert a['mem_size_gb'] <= 5.0
            for j in range(i + 1, len(archs)):
                assert archs[i] != archs[j]

    def test_arch_seed_reproducible(self):
        a1 = arch.get_possible_arch([1, 64, 48], 10, arch_seed=3)
        a2 = arch.get_possible_arch([1, 64, 48], 10, arch_seed=3)
        assert a1 == a2

    def test_random_arch_decoder_consistency(self):
        for seed in range(8):
            a = arch.get_possible_arch([1, 64, 48], 10, arch_seed=seed)
            n_enc = len(a['ae_encoding_n_channels'])
            assert len(a['ae_decoding_n_channels']) == n_enc
            assert a['ae_decoding_y_dim'][-1] == 48 * 0 + 64
            assert a['ae_decoding_x_dim'][-1] == 48


class TestFootprint:

    def test_footprint_monotonic_in_batch(self):
        a = arch.load_handcrafted_arch([1, 64, 48], 10, None, check_memory=False)
        small = arch.estimate_model_footprint(a, [10, 1, 64, 48])
        big = arch.estimate_model_footprint(a, [100, 1, 64, 48])
        assert big > small
