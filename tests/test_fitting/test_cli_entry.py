"""Packaging contract: every declared console script resolves to a callable.

The reference ships a distutils package (reference setup.py:1-13); the
rebuild declares its CLIs as console entry points in pyproject.toml. This
pins the script -> module:attr mapping so a rename in either place fails
loudly instead of producing a wheel with dead scripts.
"""

import importlib
import os

try:
    import tomllib  # Python >= 3.11
except ImportError:  # pragma: no cover - 3.10 fallback
    import tomli as tomllib

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_console_scripts_resolve():
    with open(os.path.join(REPO, 'pyproject.toml'), 'rb') as f:
        cfg = tomllib.load(f)
    scripts = cfg['project']['scripts']
    # one script per grid-search CLI + the serving exporter
    assert len(scripts) == 6
    for name, target in scripts.items():
        mod_name, attr = target.split(':')
        fn = getattr(importlib.import_module(mod_name), attr)
        assert callable(fn), (name, target)


def test_version_attr_matches_dynamic_metadata():
    import behavenet_tpu
    with open(os.path.join(REPO, 'pyproject.toml'), 'rb') as f:
        cfg = tomllib.load(f)
    attr = cfg['tool']['setuptools']['dynamic']['version']['attr']
    assert attr == 'behavenet_tpu.__version__'
    assert isinstance(behavenet_tpu.__version__, str) and behavenet_tpu.__version__
