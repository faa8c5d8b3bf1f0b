"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding paths are exercised without TPUs."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'   # the image presets JAX_PLATFORMS=axon
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

# sitecustomize may have imported jax already (axon PJRT registration), in
# which case the env var was read before we set it — force via config too.
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: multi-process recipe smokes (deselect with '
        '-m "not slow")')


@pytest.fixture(scope='session')
def rng_key():
    import jax
    return jax.random.PRNGKey(0)
