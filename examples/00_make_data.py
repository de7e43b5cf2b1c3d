"""Example 00: create a synthetic session in the BehaveNet HDF5 format.

Generates structured data (a bouncing-dot video driven by a 2-state AR
process, with 'neural' activity linearly related to the dot position) so
the downstream examples produce meaningful fits. Run:

    python examples/00_make_data.py --data_dir /tmp/bntpu/data

Real data: see behavenet_tpu.data.preprocess.build_hdf5 for converting
video + DLC/DGP pose files, and docs/data_structure.md for the layout.
"""

import argparse
import json
import os

import h5py
import numpy as np

LAB, EXPT, ANIMAL, SESSION = 'demolab', 'demoexpt', 'mouse01', 'session-00'
N_TRIALS = 33
TRIAL_LEN = 64
Y_PIX, X_PIX = 48, 48
N_NEURONS = 30


def simulate_trial(rng, T=TRIAL_LEN):
    """2-state AR latent -> dot position -> frames + neural activity."""
    As = [0.95 * np.eye(2), np.array([[0.0, -0.9], [0.9, 0.0]])]
    z = np.zeros(T, dtype=int)
    x = np.zeros((T, 2))
    for t in range(1, T):
        z[t] = z[t - 1] if rng.rand() < 0.95 else 1 - z[t - 1]
        x[t] = As[z[t]] @ x[t - 1] + 0.15 * rng.randn(2)
    # map latents to dot positions
    pos = np.clip((x * 8 + np.array([Y_PIX // 2, X_PIX // 2])).astype(int),
                  4, Y_PIX - 5)
    frames = np.zeros((T, 1, Y_PIX, X_PIX), dtype=np.uint8)
    yy, xx = np.mgrid[:Y_PIX, :X_PIX]
    for t in range(T):
        blob = np.exp(-((yy - pos[t, 0]) ** 2 + (xx - pos[t, 1]) ** 2) / 18.0)
        frames[t, 0] = (blob * 255).astype(np.uint8)
    # neural activity: noisy linear readout of the latents
    W = rng.randn(2, N_NEURONS) * 0.8
    neural = x @ W + 0.3 * rng.randn(T, N_NEURONS)
    labels = x.astype(np.float32)
    # pixel-space marker coordinates (x first, then y: MakeOneHot2D order)
    labels_sc = np.stack([pos[:, 1], pos[:, 0]], axis=1).astype(np.float32)
    return frames, neural.astype(np.float32), labels, labels_sc


def main(data_dir, n_sessions=1):
    paths = []
    for s_idx in range(n_sessions):
        rng = np.random.RandomState(s_idx)
        session = 'session-%02i' % s_idx
        hdf5 = os.path.join(data_dir, LAB, EXPT, ANIMAL, session, 'data.hdf5')
        os.makedirs(os.path.dirname(hdf5), exist_ok=True)
        with h5py.File(hdf5, 'w', libver='latest') as f:
            f.swmr_mode = True
            gi = f.create_group('images')
            gn = f.create_group('neural')
            gl = f.create_group('labels')
            gs = f.create_group('labels_sc')
            gr = f.create_group('regions').create_group('indxs')
            gr.create_dataset('region-0', data=np.arange(N_NEURONS // 2))
            gr.create_dataset('region-1', data=np.arange(N_NEURONS // 2, N_NEURONS))
            for i in range(N_TRIALS):
                frames, neural, labels, labels_sc = simulate_trial(rng)
                # give each session a distinct background brightness so the
                # MSPS-VAE's background subspace has something to learn
                frames = np.clip(
                    frames.astype(int) + 20 * s_idx, 0, 255).astype(np.uint8)
                gi.create_dataset('trial_%04i' % i, data=frames, dtype='uint8')
                gn.create_dataset('trial_%04i' % i, data=neural, dtype='float32')
                gl.create_dataset('trial_%04i' % i, data=labels, dtype='float32')
                gs.create_dataset('trial_%04i' % i, data=labels_sc, dtype='float32')
        print('wrote %s (%i trials of %i frames)' % (hdf5, N_TRIALS, TRIAL_LEN))
        paths.append(hdf5)
    return paths


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_dir', default='/tmp/bntpu/data')
    parser.add_argument('--n_sessions', default=1, type=int)
    args = parser.parse_args()
    main(args.data_dir, args.n_sessions)
