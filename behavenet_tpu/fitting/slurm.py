"""SLURM fan-out for grid searches: one sbatch job per hyperparameter trial.

Replaces the reference's test-tube SlurmCluster (behavenet/fitting/
hyperparam_utils.py:125-174): the user supplies a ``slurm_param_file``
containing the ``#SBATCH`` preamble (partition, TPU resources, env setup);
each grid trial becomes one sbatch script that re-invokes the same
grid-search CLI with the same four configs, selecting its single trial via
the ``BEHAVENET_TRIAL_IDX`` environment variable. Trials never communicate
(DCN traffic is zero), matching the reference's process-per-trial model.
"""

import datetime
import os
import subprocess
import sys

__all__ = ['submit_grid_search', 'selected_trial_idx']

TRIAL_ENV_VAR = 'BEHAVENET_TRIAL_IDX'


def selected_trial_idx():
    """Trial index selected by the environment, or None (run all trials)."""
    val = os.environ.get(TRIAL_ENV_VAR)
    return int(val) if val not in (None, '') else None


def submit_grid_search(hyperparams, script_module):
    """Write + submit one sbatch script per grid trial.

    Parameters
    ----------
    hyperparams : HyperparamGrid
        parsed grid; needs compute-config keys 'slurm_log_path' and
        'slurm_param_file' (reference glossary: same keys)
    script_module : str
        e.g. 'behavenet_tpu.fitting.ae_grid_search'
    """
    base = hyperparams.base
    log_path = base['slurm_log_path']
    os.makedirs(log_path, exist_ok=True)
    with open(base['slurm_param_file'], 'r') as f:
        preamble = f.read()

    config_args = ' '.join(
        '--%s %s' % (k, base[k])
        for k in ('data_config', 'model_config', 'training_config', 'compute_config'))

    n_trials = hyperparams.n_trials()
    for trial_idx in range(n_trials):
        timestamp = datetime.datetime.now().strftime('%Y-%m-%d__%H-%M-%S')
        name = 'trial_{}_{}'.format(trial_idx, timestamp)
        script_path = os.path.join(log_path, '%s_slurm_cmd.sh' % name)
        cmd = '%s=%i srun %s -m %s %s\n' % (
            TRIAL_ENV_VAR, trial_idx, sys.executable, script_module, config_args)
        with open(script_path, 'w') as f:
            f.write(preamble)
            if not preamble.endswith('\n'):
                f.write('\n')
            f.write(cmd)
        print('\nlaunching exp...')
        result = subprocess.call('sbatch %s' % script_path, shell=True)
        if result == 0:
            print('launched exp ', script_path)
        else:
            print('launch failed...')
    return n_trials
