"""Multi-chip sharding dry run on virtual CPU devices.

Runs in a subprocess because this environment's axon plugin overrides
jax_platforms programmatically; the child forces the CPU backend with 8
virtual devices before touching JAX.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("H264_TPU_TESTS"),
    reason="slow XLA compile; set H264_TPU_TESTS=1 to run",
)

_SCRIPT = """
import jax
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()
import __graft_entry__ as g
fn, args = g.entry()
out = fn(*args)
assert out[0].shape == (64, 64)
g.dryrun_multichip(8)
print("DIST_OK")
"""


def test_dryrun_multichip_8dev():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        timeout=560,
    )
    assert "DIST_OK" in r.stdout, r.stdout + r.stderr
