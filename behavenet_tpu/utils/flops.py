"""Analytic FLOP accounting for the conv-AE family.

Counts the multiply-accumulate work of every conv / conv-transpose /
dense layer an ``ae_*`` arch dict describes (the same dicts
``models.arch.load_handcrafted_arch`` / ``get_possible_arch`` emit, and
that ``models.aes.ConvAEEncoder/Decoder`` consume). Used by ``bench.py``
to publish FLOPs/frame and MFU next to every throughput number so "is it
actually fast" is answerable from the JSON line alone.

Conventions (the standard accounting, e.g. the public scaling-book one):

- one MAC = 2 FLOPs;
- a conv layer's forward MACs per frame = ``Hout*Wout*Cout * Cin*kh*kw``;
- a conv-transpose layer scatters ``kh*kw`` taps from each *input* pixel,
  so its MACs = ``Hin*Win*Cin * Cout*kh*kw`` (identical to the equivalent
  fractionally-strided conv);
- a training step costs ~3x the forward pass (forward + input-gradient +
  weight-gradient matmuls); elementwise work (bias, activations, norm,
  loss) is ignored — it is HBM-bound, not MXU-bound, and <1% of FLOPs.

The reference has no FLOP accounting at all; its only footprint model is
a parameter/activation *memory* estimator
(reference behavenet/models/ae_model_architecture_generator.py:597-651),
which ``models.arch.estimate_model_footprint`` mirrors.
"""

import numpy as np

# bf16 MXU peak per chip, FLOP/s. v5e: 197 TFLOP/s (public spec). Override
# with the BENCH_PEAK_TFLOPS env var in bench.py when on other hardware.
V5E_BF16_PEAK = 197e12


def _conv_block_macs(arch):
    """Per-frame MACs for the encoder and decoder conv stacks."""
    macs = 0
    # encoder: Cin chains from the input channels
    c_in = arch['ae_input_dim'][0]
    for i, layer in enumerate(arch['ae_encoding_layer_type']):
        c_out = arch['ae_encoding_n_channels'][i]
        k = arch['ae_encoding_kernel_size'][i]
        h = arch['ae_encoding_y_dim'][i]
        w = arch['ae_encoding_x_dim'][i]
        if layer == 'conv':
            macs += h * w * c_out * c_in * k * k
        # maxpool layers do no MACs (the conv before them was stride-1 and
        # already counted at its own, pre-pool, output dims)
        c_in = c_out

    # decoder: starts from ae_decoding_starting_dim
    c_in, h_in, w_in = arch['ae_decoding_starting_dim']
    for i, layer in enumerate(arch['ae_decoding_layer_type']):
        c_out = arch['ae_decoding_n_channels'][i]
        k = arch['ae_decoding_kernel_size'][i]
        if layer == 'convtranspose':
            macs += h_in * w_in * c_in * c_out * k * k
        elif layer == 'conv':
            macs += arch['ae_decoding_y_dim'][i] * \
                arch['ae_decoding_x_dim'][i] * c_out * c_in * k * k
        # unpool layers: no MACs
        c_in = c_out
        h_in = arch['ae_decoding_y_dim'][i]
        w_in = arch['ae_decoding_x_dim'][i]
    return macs


def _dense_macs(arch):
    """Per-frame MACs for the FF layers bridging convs and latents."""
    n_latents = arch['n_ae_latents']
    # encoder flatten -> latents
    enc_flat = (arch['ae_encoding_n_channels'][-1]
                * arch['ae_encoding_y_dim'][-1]
                * arch['ae_encoding_x_dim'][-1])
    # latents -> decoder starting volume
    dec_flat = int(np.prod(arch['ae_decoding_starting_dim']))
    macs = enc_flat * n_latents + n_latents * dec_flat
    if arch.get('ae_decoding_last_FF_layer'):
        out = int(np.prod(arch['ae_input_dim']))
        macs += arch['ae_decoding_x_dim'][-1] * arch['ae_decoding_y_dim'][-1] \
            * arch['ae_decoding_n_channels'][-1] * out
    return macs


def ae_fwd_flops_per_frame(arch):
    """Forward-pass FLOPs per frame for a conv-AE arch dict."""
    return 2 * (_conv_block_macs(arch) + _dense_macs(arch))


def ae_train_flops_per_frame(arch):
    """Training-step FLOPs per frame (fwd + input-grad + weight-grad)."""
    return 3 * ae_fwd_flops_per_frame(arch)


def mfu(frames_per_sec, flops_per_frame, peak_flops=V5E_BF16_PEAK):
    """Model FLOPs utilization in [0, 1]."""
    return frames_per_sec * flops_per_frame / peak_flops
