"""16-device multichip dryrun smoke (round-4 verdict task 7).

``__graft_entry__.dryrun_multichip`` is parameterized over n_devices but was
only ever driver-run at 8; this CI case guards the mesh factorization
(channel:2 x time:8) and the halo/ownership math one scale up.  Runs in a
subprocess: the test session pins an 8-virtual-device CPU backend, and a
JAX backend cannot be re-provisioned to 16 devices mid-process from here.
"""

import os
import subprocess
import sys


def test_dryrun_multichip_16_devices():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=16",
    )
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(16)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK: mesh={channel:2, time:8}" in proc.stdout, \
        proc.stdout
    assert "halo-straddling" in proc.stdout
