"""Shared helpers for the example scripts: config writing + directories."""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from importlib import import_module  # noqa: E402
import sys  # noqa: E402
sys.path.insert(0, REPO)

LAB, EXPT, ANIMAL, SESSION = 'demolab', 'demoexpt', 'mouse01', 'session-00'


def base_dirs(root='/tmp/bntpu'):
    data_dir = os.path.join(root, 'data')
    save_dir = os.path.join(root, 'save')
    os.makedirs(save_dir, exist_ok=True)
    return data_dir, save_dir


def data_config(tmp_dir, data_dir, save_dir, **extra):
    cfg = {
        'lab': LAB, 'expt': EXPT, 'animal': ANIMAL, 'session': SESSION,
        'sessions_csv': '', 'all_source': 'data',
        'n_input_channels': 1, 'y_pixels': 48, 'x_pixels': 48,
        'use_output_mask': False, 'use_label_mask': False,
        'neural_bin_size': 25, 'neural_type': 'ca', 'neural_thresh': 1.0,
        'subsample_idxs_group_0': None, 'subsample_idxs_group_1': None,
        'subsample_idxs_dataset': None, 'subsample_method': 'none',
        'approx_batch_size': 200, 'n_labels': 2,
        'data_dir': data_dir, 'save_dir': save_dir,
    }
    cfg.update(extra)
    return write(tmp_dir, 'data.json', cfg)


def write(tmp_dir, name, cfg):
    os.makedirs(tmp_dir, exist_ok=True)
    path = os.path.join(tmp_dir, name)
    with open(path, 'w') as f:
        json.dump(cfg, f, indent=2)
    return path


def run_cli(module_name, configs):
    """Run a grid-search CLI in-process with the given config paths."""
    from behavenet_tpu.fitting.hyperparams import get_all_params, run_grid_search
    mod = import_module('behavenet_tpu.fitting.%s' % module_name)
    args = []
    for key, path in configs.items():
        args += ['--%s' % key, path]
    hp = get_all_params('grid_search', args=args)
    run_grid_search(mod.main, hp)
