"""Test configuration: force a virtual 8-device CPU mesh.

The axon TPU plugin's sitecustomize imports jax at interpreter startup, so
environment variables set here are too late. The PJRT *backend* however is
initialized lazily at first use, so switching the platform through
jax.config before any computation still works.
"""

import os

# effective if the backend has not been created yet (XLA_FLAGS is read at
# CPU client creation time)
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


def pytest_sessionstart(session):
    assert jax.default_backend() == 'cpu', (
        'tests must run on the virtual CPU mesh, got %s' % jax.default_backend())
    assert len(jax.devices()) == 8


# Curated quick tier: `pytest -m fast` runs these modules only (<10 min on
# one CPU core; the CI quick gate, .github/workflows/ci.yml). Everything
# outside the list — mesh/shard_map suites, EM oracles, movie wrappers —
# stays in the full (nightly) tier.
FAST_PATHS = [
    'test_data/test_transforms.py',
    'test_data/test_generator.py',
    'test_data/test_utils_data.py',
    'test_models/test_arch.py',
    'test_models/test_decoders.py',
    'test_ops/test_losses.py',
    'test_ops/test_optim.py',
    'test_ops/test_smallmat.py',
    'test_utils/test_flops.py',
    'test_utils/test_torch_import.py',
    'test_fitting/test_hyperparams.py',
    'test_fitting/test_experiment.py',
]


def pytest_collection_modifyitems(config, items):
    import pytest
    root = os.path.dirname(os.path.abspath(__file__))
    missing = [p for p in FAST_PATHS
               if not os.path.exists(os.path.join(root, p))]
    assert not missing, 'FAST_PATHS entries do not exist: %s' % missing
    fast = {os.path.normpath(os.path.join(root, p)) for p in FAST_PATHS}
    for item in items:
        if os.path.normpath(str(item.fspath)) in fast:
            item.add_marker(pytest.mark.fast)
