"""BehaveNet-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the BehaveNet pipeline.

Provides the same four chained capabilities as the reference
(themattinthehatt/behavenet): compression of behavioral video with conv
(variational) autoencoders, segmentation of latents with ARHMMs, generation
(reconstructions / samples / traversals), and decoding from neural activity.

This top-level module mirrors the reference's L0 user-config layer
(reference: behavenet/__init__.py): a per-user dotfile directory
``~/.behavenet/`` holding ``directories.json`` and per-dataset parameter
JSON files.
"""

import json
import os

__version__ = '0.1.0'


def get_params_dir():
    """Return directory holding user config files.

    ``~/.behavenet`` (reference behavenet/__init__.py:5-8), overridable via
    the ``BEHAVENET_DIR`` environment variable (useful for tests and
    multi-profile setups).
    """
    return os.environ.get(
        'BEHAVENET_DIR', os.path.join(os.path.expanduser('~'), '.behavenet'))


def get_user_dir(dir_type):
    """Resolve a user base directory from ``~/.behavenet/directories.json``.

    Parameters
    ----------
    dir_type : str
        'data' | 'save' | 'fig'

    Behavioral contract follows reference behavenet/__init__.py:10-35.
    """
    dirs_file = os.path.join(get_params_dir(), 'directories.json')
    if not os.path.exists(dirs_file):
        raise FileNotFoundError(
            'Could not find %s; run behavenet_tpu.setup() first' % dirs_file)
    with open(dirs_file, 'r') as f:
        dirs = json.load(f)
    key = '%s_dir' % dir_type
    if key not in dirs:
        raise KeyError('"%s" not found in %s' % (key, dirs_file))
    return dirs[key]


def make_dir_if_not_exists(save_file):
    """Create the parent directory of ``save_file`` if it does not exist."""
    save_dir = os.path.dirname(save_file)
    if save_dir and not os.path.exists(save_dir):
        os.makedirs(save_dir, exist_ok=True)


def setup(data_dir=None, save_dir=None, fig_dir=None):
    """Write ``~/.behavenet/directories.json``.

    Unlike the reference (interactive prompts, behavenet/__init__.py:52-73)
    this accepts arguments directly; if an argument is None the user is
    prompted interactively.
    """
    params_dir = get_params_dir()
    os.makedirs(params_dir, exist_ok=True)
    prompts = {'data_dir': data_dir, 'save_dir': save_dir, 'fig_dir': fig_dir}
    out = {}
    for key, val in prompts.items():
        if val is None:
            val = input('Enter base %s: ' % key)
        out[key] = os.path.expanduser(val)
    with open(os.path.join(params_dir, 'directories.json'), 'w') as f:
        json.dump(out, f, sort_keys=True, indent=4)
    return out


def add_dataset(lab_id=None, expt_id=None, params=None):
    """Register a dataset: write ``~/.behavenet/{lab}_{expt}_params.json``.

    Parameters
    ----------
    lab_id, expt_id : str
    params : dict
        must include keys like n_input_channels, y_pixels, x_pixels,
        use_output_mask, frame_rate, neural_type, neural_bin_size.
        ``neural_bin_size`` defaults to 1/frame_rate
        (reference behavenet/__init__.py:117).
    """
    if lab_id is None:
        lab_id = input('Enter lab id: ')
    if expt_id is None:
        expt_id = input('Enter experiment id: ')
    params = dict(params or {})
    params.setdefault('lab', lab_id)
    params.setdefault('expt', expt_id)
    if 'neural_bin_size' not in params and params.get('frame_rate'):
        params['neural_bin_size'] = 1.0 / float(params['frame_rate'])
    params_dir = get_params_dir()
    os.makedirs(params_dir, exist_ok=True)
    path = os.path.join(params_dir, '%s_%s_params.json' % (lab_id, expt_id))
    with open(path, 'w') as f:
        json.dump(params, f, sort_keys=True, indent=4)
    return path
