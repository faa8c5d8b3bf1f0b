"""Driver-contract tests for ``__graft_entry__``.

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip(n)`` in an environment where only ONE device may be
visible (the image presets JAX_PLATFORMS=axon with a single tunneled chip).
``dryrun_multichip`` must therefore self-provision a virtual n-device CPU
mesh via a subprocess when the current process is short on devices —
that path is what round 1 shipped broken (MULTICHIP_r01.json ok=false).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions_from_one_device():
    # Simulate the driver's world: a fresh process that sees exactly ONE
    # device (CPU stands in for the single axon chip), then ask for 8.
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('_EMODIS_DRYRUN_CHILD', None)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    # toy legs only: this test validates the self-provision mechanism; the
    # production-shape leg runs in the driver's own dryrun each round
    env['EMODIS_DRYRUN_TOY_ONLY'] = '1'
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, '-c', code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert 'ok on 8 devices' in proc.stdout
    # the LAST stdout line must be the one-line JSON summary (the driver's
    # 2000-char tail can drown the per-leg lines in rendezvous warnings)
    import json
    last = proc.stdout.strip().splitlines()[-1]
    summary = json.loads(last)
    assert summary['dryrun_multichip'] == 'ok'
    assert summary['n_devices'] == 8
    # TOY_ONLY runs only the toy dp leg; the driver's full dryrun adds
    # dp_x_tp and the production-shape legs
    assert [leg['leg'] for leg in summary['legs']] == ['dp']


def test_dryrun_multichip_direct_on_provisioned_mesh():
    # In-process path: conftest already provisioned 8 virtual CPU devices,
    # so no subprocess should be needed.
    import jax
    if len(jax.devices()) < 8:
        pytest.skip('needs the 8-device conftest mesh')
    sys.path.insert(0, REPO)
    os.environ['EMODIS_DRYRUN_TOY_ONLY'] = '1'
    try:
        import __graft_entry__ as g
        g.dryrun_multichip(8)
    finally:
        sys.path.remove(REPO)
        os.environ.pop('EMODIS_DRYRUN_TOY_ONLY', None)


def test_entry_compiles_and_runs():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
        fn, args = g.entry()
        import jax
        out = jax.jit(fn)(*args)
        logits = out[0] if isinstance(out, tuple) else out
        assert logits.shape[0] == args[0].shape[0]
    finally:
        sys.path.remove(REPO)
