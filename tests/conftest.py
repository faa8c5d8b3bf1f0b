"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding paths are exercised without TPUs."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'   # the image presets JAX_PLATFORMS=axon
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
# persistent compile cache: the container has ONE CPU core and jit compiles
# dominate suite wall time; repeat runs hit the cache
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), '.jax_cache')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', _cache)
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0')

# sitecustomize may have imported jax already (axon PJRT registration), in
# which case the env var was read before we set it — force via config too.
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)

import time  # noqa: E402

import pytest  # noqa: E402

# suite wall-time budget (VERDICT r3 #8): the suite runs ~6 min warm-cache
# on this 1-core container; fail loudly if it regresses past the budget so
# slow tests are caught at the round they land.  Override for cold-cache /
# shared-host runs via EMODIS_SUITE_BUDGET_SECS (0 disables).
_SUITE_BUDGET = float(os.environ.get('EMODIS_SUITE_BUDGET_SECS', '720'))
_suite_t0 = time.monotonic()


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: multi-process recipe smokes (deselect with '
        '-m "not slow")')


def pytest_sessionfinish(session, exitstatus):
    elapsed = time.monotonic() - _suite_t0
    # only enforce on passing full-suite runs — file/keyword selections and
    # early-exit partial runs are not comparable to the budget
    full_run = (exitstatus == 0 and session.testscollected > 150)
    if _SUITE_BUDGET and full_run and elapsed > _SUITE_BUDGET:
        print(f'\nERROR: suite wall time {elapsed:.0f}s exceeds the '
              f'{_SUITE_BUDGET:.0f}s budget (EMODIS_SUITE_BUDGET_SECS); '
              'a test regressed the compile/runtime budget')
        session.exitstatus = 1


@pytest.fixture(scope='session')
def rng_key():
    import jax
    return jax.random.PRNGKey(0)
