"""Config -> grid expansion (reference tests/test_fitting/test_hyperparam_utils.py)."""

import json
import os

import pytest

from behavenet_tpu.fitting.hyperparams import HyperparamGrid, get_all_params


def write_configs(tmpdir, data=None, model=None, training=None, compute=None):
    defaults = {
        'data': {'lab': 'l', 'expt': 'e', 'animal': 'a', 'session': 's',
                 'n_input_channels': 1, 'y_pixels': 32, 'x_pixels': 24,
                 'approx_batch_size': 200},
        'model': {'experiment_name': 'x', 'model_class': 'ae', 'model_type': 'conv',
                  'n_ae_latents': 6, 'ae_arch_json': None, 'mem_limit_gb': 8.0},
        'training': {'learning_rate': 1e-4, 'max_n_epochs': 1},
        'compute': {'device': 'cpu'},
    }
    overrides = {'data': data, 'model': model, 'training': training, 'compute': compute}
    paths = {}
    for name, d in defaults.items():
        if overrides[name]:
            d.update(overrides[name])
        p = str(tmpdir.join('%s.json' % name))
        with open(p, 'w') as f:
            json.dump(d, f)
        paths[name] = p
    # defaults for save/data dirs so get_user_dir isn't needed
    paths['data']
    return ['--data_config', paths['data'], '--model_config', paths['model'],
            '--training_config', paths['training'], '--compute_config', paths['compute']]


@pytest.fixture(autouse=True)
def user_dirs(tmpdir, monkeypatch):
    home = tmpdir.mkdir('home')
    monkeypatch.setenv('HOME', str(home))
    bdir = home.mkdir('.behavenet')
    with open(str(bdir.join('directories.json')), 'w') as f:
        json.dump({'data_dir': str(tmpdir), 'save_dir': str(tmpdir),
                   'fig_dir': str(tmpdir)}, f)


class TestGridExpansion:

    def test_scalar_values_are_base_params(self, tmpdir):
        args = write_configs(tmpdir)
        hp = get_all_params('grid_search', args=args)
        assert hp.base['model_class'] == 'ae'
        assert hp.base['learning_rate'] == 1e-4

    def test_list_values_become_grid_dims(self, tmpdir):
        args = write_configs(tmpdir, training={'learning_rate': [1e-4, 1e-3]})
        hp = get_all_params('grid_search', args=args)
        assert 'learning_rate' in hp.grid
        trials = list(hp.trials())
        assert len(trials) == 2
        assert {t['learning_rate'] for t in trials} == {1e-4, 1e-3}

    def test_architecture_params_grid(self, tmpdir):
        args = write_configs(tmpdir)
        hp = get_all_params('grid_search', args=args)
        assert 'architecture_params' in hp.grid
        arch = hp.grid['architecture_params'][0]
        assert arch['n_ae_latents'] == 6
        assert 'ae_encoding_x_dim' in arch

    def test_multiple_latents_multiple_archs(self, tmpdir):
        args = write_configs(tmpdir, model={'n_ae_latents': [4, 8]})
        hp = get_all_params('grid_search', args=args)
        archs = hp.grid['architecture_params']
        assert len(archs) == 2
        assert [a['n_ae_latents'] for a in archs] == [4, 8]

    def test_cartesian_product(self, tmpdir):
        args = write_configs(
            tmpdir, model={'n_ae_latents': [4, 8]},
            training={'learning_rate': [1e-4, 1e-3, 1e-2]})
        hp = get_all_params('grid_search', args=args)
        assert hp.n_trials() == 6

    def test_extra_args_rejected(self, tmpdir):
        args = write_configs(tmpdir) + ['--extra', 'nope']
        with pytest.raises(ValueError):
            get_all_params('grid_search', args=args)

    def test_missing_config_rejected(self, tmpdir):
        args = write_configs(tmpdir)[:6] + ['--bogus_config', 'x.json']
        with pytest.raises(ValueError):
            get_all_params('grid_search', args=args)

    def test_comments_in_configs(self, tmpdir):
        args = write_configs(tmpdir)
        # rewrite data config with comments
        with open(args[1]) as f:
            raw = f.read()
        with open(args[1], 'w') as f:
            f.write('// a comment\n' + raw)
        hp = get_all_params('grid_search', args=args)
        assert hp.base['lab'] == 'l'

    def test_linear_model_gets_int_latents(self, tmpdir):
        args = write_configs(tmpdir, model={'model_type': 'linear'})
        hp = get_all_params('grid_search', args=args)
        assert hp.base['n_ae_latents'] == 6
        assert 'architecture_params' not in hp.grid


class TestHyperparamGrid:

    def test_trials_no_grid(self):
        g = HyperparamGrid({'a': 1})
        assert list(g.trials()) == [{'a': 1}]

    def test_attribute_access(self):
        g = HyperparamGrid({'device': 'cpu'}, {'lr': [1, 2]})
        assert g.device == 'cpu'
        assert g.lr == [1, 2]
        with pytest.raises(AttributeError):
            g.missing


class TestRunGridSearchResumeGuards:
    """resume_version names ONE version dir; any grid shape where several
    run units would reopen (and then clobber) it must refuse up front."""

    def _grid(self, n_trials, **base):
        return HyperparamGrid(
            dict({'model_class': 'ae', 'device': 'cpu',
                  'rng_seed_model': 0, 'max_n_epochs': 1}, **base),
            {'learning_rate': [1e-3 * (i + 1) for i in range(n_trials)]})

    def test_sequential_multi_trial_resume_refused(self):
        from behavenet_tpu.fitting.hyperparams import run_grid_search
        hp = self._grid(2, resume_version=0, vmap_trials=0)
        with pytest.raises(ValueError, match='multi-trial grid'):
            run_grid_search(lambda t: None, hp, group_fn=lambda g: None)

    def test_multi_group_resume_refused(self):
        from behavenet_tpu.fitting.hyperparams import run_grid_search
        # vmap_trials=2 over 3 trials -> 2 groups: ambiguous resume target
        hp = self._grid(3, resume_version=0, vmap_trials=2)
        with pytest.raises(ValueError, match='exactly one'):
            run_grid_search(lambda t: None, hp, group_fn=lambda g: None)

    def test_single_group_resume_dispatches_whole_group(self):
        from behavenet_tpu.fitting.hyperparams import run_grid_search
        hp = self._grid(2, resume_version=0, vmap_trials=2)
        seen = []
        run_grid_search(lambda t: None, hp, group_fn=seen.append)
        assert len(seen) == 1 and len(seen[0]) == 2

    def test_single_trial_resume_uses_sequential_path(self):
        from behavenet_tpu.fitting.hyperparams import run_grid_search
        hp = self._grid(1, resume_version=3, vmap_trials=0)
        seen = []
        run_grid_search(seen.append, hp, group_fn=lambda g: None)
        assert len(seen) == 1 and seen[0]['resume_version'] == 3
