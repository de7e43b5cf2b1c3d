"""Config -> hyperparameter-grid machinery (replaces test-tube).

Behavioral contract follows the reference (behavenet/fitting/hyperparam_utils.py):
- the CLI accepts exactly four config JSONs
  (``--data_config --model_config --training_config --compute_config``) and
  nothing else (hyperparam_utils.py:16-19)
- configs may contain // comments (commentjson semantics)
- every JSON key becomes a parameter; **any list value becomes a tunable
  grid dimension** (hyperparam_utils.py:52-59)
- ``n_ae_latents`` is renamed to ``n_latents`` (stringified) and expanded
  into per-latent-count architecture dicts via the handcrafted-arch loader,
  which become the ``architecture_params`` grid dimension (:75-85)
- neural subsampling with ``subsample_idxs_dataset='all'`` expands the HDF5
  region list into a ``subsample_idxs_name`` grid dimension (:103-120)
"""

import itertools
import sys
from collections import OrderedDict

from behavenet_tpu.utils import jsonc

__all__ = ['get_all_params', 'HyperparamGrid']

_AE_FAMILY = ('ae', 'vae', 'beta-tcvae', 'cond-vae', 'cond-ae', 'cond-ae-msp',
              'ps-vae', 'msps-vae', 'labels-images')


class HyperparamGrid(object):
    """Base params + named grid dimensions; iterates the cartesian product."""

    def __init__(self, base=None, grid=None):
        self.base = dict(base or {})
        self.grid = OrderedDict(grid or {})

    def __getattr__(self, name):
        base = object.__getattribute__(self, 'base')
        if name in base:
            return base[name]
        grid = object.__getattribute__(self, 'grid')
        if name in grid:
            return grid[name]
        raise AttributeError(name)

    def __getitem__(self, name):
        return self.base[name]

    def __contains__(self, name):
        return name in self.base or name in self.grid

    def add(self, key, value):
        self.base[key] = value

    def add_grid(self, key, options):
        self.grid[key] = list(options)

    def n_trials(self):
        n = 1
        for v in self.grid.values():
            n *= len(v)
        return n

    def trials(self):
        """Yield one hparams dict per grid point."""
        if not self.grid:
            yield dict(self.base)
            return
        keys = list(self.grid.keys())
        for combo in itertools.product(*(self.grid[k] for k in keys)):
            hp = dict(self.base)
            hp.update(dict(zip(keys, combo)))
            yield hp


def get_all_params(search_type='grid_search', args=None):
    """Parse the four-config CLI into a :class:`HyperparamGrid` (reference :12-49)."""
    if args is None:
        args = sys.argv[1:]
    if len(args) != 8:
        raise ValueError('No command line arguments allowed other than config file names')

    flags = {}
    for i in range(0, 8, 2):
        name = args[i]
        if not name.startswith('--'):
            raise ValueError('Expected a --flag, got "%s"' % name)
        flags[name[2:]] = args[i + 1]
    required = ('data_config', 'model_config', 'training_config', 'compute_config')
    missing = [r for r in required if r not in flags]
    if missing:
        raise ValueError('Missing config arguments: %s' % missing)

    grid = HyperparamGrid()
    for key, path in flags.items():
        grid.add(key, path)

    for config in required:
        config_json = jsonc.load_file(flags[config])
        for key, value in config_json.items():
            _add_param(grid, key, value)

    # save/data dirs from user dotfiles unless supplied by a config
    if 'save_dir' not in grid.base:
        from behavenet_tpu import get_user_dir
        grid.add('save_dir', get_user_dir('save'))
    if 'data_dir' not in grid.base:
        from behavenet_tpu import get_user_dir
        grid.add('data_dir', get_user_dir('data'))

    _add_dependent_params(grid)

    return grid


def _add_param(grid, key, value):
    """JSON key -> base param or grid dimension (reference :52-59)."""
    if key == 'n_ae_latents':
        grid.add('n_latents', str(value))
    elif isinstance(value, list):
        grid.add_grid(key, value)
    else:
        grid.add(key, value)


def _add_dependent_params(grid):
    """Materialize params derived from json arguments (reference :62-122)."""
    base = grid.base
    model_class = base.get('model_class')

    if model_class in _AE_FAMILY:
        if base.get('model_type') == 'conv':
            from behavenet_tpu.models.arch import load_handcrafted_arches
            grid.add('max_latents', 64)
            arch_dicts = load_handcrafted_arches(
                [base['n_input_channels'], base['y_pixels'], base['x_pixels']],
                base['n_latents'],
                base.get('ae_arch_json'),
                check_memory=False,
                batch_size=base.get('approx_batch_size'),
                mem_limit_gb=base.get('mem_limit_gb'))
            grid.add_grid('architecture_params', arch_dicts)
        elif base.get('model_type') == 'linear':
            grid.add('n_ae_latents', int(base['n_latents']))
        else:
            raise ValueError('%s is not a valid model type' % base.get('model_type'))
    else:
        if base.get('n_latents'):
            grid.add('n_ae_latents', int(base['n_latents']))

    if model_class is not None and model_class.find('neural') > -1:
        if base.get('subsample_method', 'none') != 'none':
            if base.get('subsample_idxs_dataset') == 'all':
                from behavenet_tpu.data.utils import get_region_list
                idx_list = get_region_list(base)
                grid.add_grid('subsample_idxs_name', list(idx_list))
            elif isinstance(base.get('subsample_idxs_dataset'), str):
                grid.add('subsample_idxs_name', base['subsample_idxs_dataset'])
            else:
                raise ValueError(
                    '%s is an invalid data type for "subsample_idxs_dataset" key in data '
                    'json; must be a string ("all" or "name")' %
                    type(base.get('subsample_idxs_dataset')))


def print_hparams(hparams):
    """Pretty print the four config files' resolved values (reference utils.py:1076)."""
    for config_file in ('data', 'compute', 'training', 'model'):
        print('\n%s CONFIG:' % config_file.upper())
        path = hparams.get('%s_config' % config_file)
        if path is None:
            continue
        config_json = jsonc.load_file(path)
        for key in config_json.keys():
            key_ = 'n_latents' if key == 'n_ae_latents' else key
            print('    {}: {}'.format(key_, hparams.get(key_)))
    print('')


def run_grid_search(main_fn, hyperparams, script_module=None, group_fn=None):
    """Execute every grid trial (replaces test-tube optimize_parallel_*).

    Trials are independent processes in the reference; here they run
    sequentially in-process by default (one TPU chip per host). Set
    ``tt_n_cpu_workers > 1`` in the compute config to fan out across local
    processes for CPU runs; set ``slurm: true`` (plus ``slurm_log_path`` /
    ``slurm_param_file``) to submit one sbatch job per trial; set
    ``BEHAVENET_TRIAL_IDX`` in the environment to run a single trial (used
    by the sbatch scripts).
    """
    from behavenet_tpu.fitting.slurm import selected_trial_idx, submit_grid_search

    if hyperparams.base.get('slurm') and selected_trial_idx() is None:
        if script_module is None:
            import __main__
            script_module = getattr(__main__, '__spec__', None)
            script_module = script_module.name if script_module else None
        submit_grid_search(hyperparams, script_module)
        return

    n_workers = int(hyperparams.base.get('tt_n_cpu_workers', 1) or 1)
    device = hyperparams.base.get('device', 'tpu')
    trials = list(hyperparams.trials())
    idx = selected_trial_idx()
    if idx is not None:
        print('running grid-search trial %i/%i' % (idx, len(trials)))
        main_fn(trials[idx])
        return
    print('running %i grid-search trial(s)' % len(trials))
    vmap_k = hyperparams.base.get('vmap_trials', None)
    if vmap_k is None and len(trials) > 1:
        # multi-chip hosts fan eligible grid trials out across local devices
        # automatically (the reference maps trials across local GPUs,
        # ae_grid_search.py:173-187): group trials into one program whose
        # trial axis shards over the device mesh (fit_vmap_grid mesh='auto').
        # Auto groups are capped at 4 trials/device — params + amsgrad state
        # for the whole group stay device-resident, and group_vmappable runs
        # oversized grids as several groups back to back — while an explicit
        # "vmap_trials": k is honored verbatim. Opt out with
        # "vmap_trials": 0 / cap devices with "grid_devices".
        try:
            import jax
            n_dev = len(jax.devices())
        except Exception:
            n_dev = 1
        vmap_k = min(len(trials), 4 * n_dev) if n_dev > 1 else 0
    vmap_k = vmap_k or 0
    if vmap_k and group_fn is not None and not (n_workers > 1 and device == 'cpu'):
        # k trials per jitted program over one shared data stream
        # (fitting/vmap_grid.py); trials whose hparams vary in anything
        # beyond optimizer/seed/loss-weight keys fall back to main_fn
        from behavenet_tpu.fitting.vmap_grid import group_vmappable
        max_k = len(trials) if vmap_k is True else int(vmap_k)
        groups, singles = group_vmappable(trials, max_k)
        if hyperparams.base.get('resume_version') is not None and \
                (len(groups) != 1 or singles):
            # resume_version names ONE version (the first trial of ONE
            # interrupted group); with several groups or sequential
            # leftovers every other unit would reopen — and clobber — it
            raise ValueError(
                'resume_version requires the grid to form exactly one '
                'vmappable group (got %i group(s) + %i sequential '
                'trial(s)); re-run with the interrupted group\'s config, '
                'or resume a single trial alone' % (len(groups), len(singles)))
        if groups:
            print('vmap_trials: %i group(s) of up to %i trials, %i sequential'
                  % (len(groups), max_k, len(singles)))
        for group in groups:
            group_fn(group)
        for trial in singles:
            main_fn(trial)
        return
    if len(trials) > 1 and hyperparams.base.get('resume_version') is not None:
        # every trial would reopen (and then clobber) the same version dir:
        # resume_version names ONE version, and only the grouped path can
        # map the other trials back to theirs (group_resume_versions)
        raise ValueError(
            'resume_version with a multi-trial grid requires the grouped '
            'path (vmappable trials + vmap_trials enabled); to resume one '
            'trial of a sequential grid, run it alone (BEHAVENET_TRIAL_IDX '
            'or a single-point config)')
    if n_workers > 1 and device == 'cpu':
        import multiprocessing
        with multiprocessing.get_context('spawn').Pool(n_workers) as pool:
            pool.map(main_fn, trials)
    else:
        for trial in trials:
            main_fn(trial)
