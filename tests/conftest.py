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
