"""Driver-entry tests: dryrun_multichip must work inline AND self-bootstrap."""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_dryrun_multichip_inline():
    # the suite conftest already provides the virtual 8-device CPU mesh,
    # so this exercises the real (non-bootstrap) path
    import __graft_entry__

    assert len(jax.devices()) == 8
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_from_one_device():
    """Exactly the driver's situation: a fresh process with NO mesh env vars
    (sitecustomize gives it the single axon/CPU default) must self-bootstrap
    onto a virtual 8-device CPU mesh and exit 0."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r)\n"
         "import __graft_entry__\n"
         "__graft_entry__.dryrun_multichip(8)\n"
         "print('DRIVER_PATH_OK')" % REPO],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DRIVER_PATH_OK" in proc.stdout
