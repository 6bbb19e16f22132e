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


def _run_sub(script: str, timeout: int = 560):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    return subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        timeout=timeout,
    )


def test_dryrun_multichip_8dev():
    r = _run_sub(_SCRIPT)
    assert "DIST_OK" in r.stdout, r.stdout + r.stderr


_SHARDED_SCRIPT = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from tests.conftest import make_test_frames
from h264decode_tpu.golden import lavc
from h264decode_tpu.dist.mesh import make_mesh
from h264decode_tpu.dist.decoder import ShardedDecoder

frames = make_test_frames(4, 128, 128)
for n_row, slices in ((2, 2), (4, 4)):
    bs = lavc.encode_x264(
        frames, qp=26, profile="main", cabac=True, bframes=0,
        extra_x264=f"no-deblock=1:slices={slices}:weightp=0",
    )
    golden = lavc.decode_annexb(bs)
    ours = ShardedDecoder(make_mesh(1, n_row), apply_deblock=False).decode_stream(bs)
    assert len(golden) == len(ours)
    for fi, (g, o) in enumerate(zip(golden, ours)):
        for name, gp, op in zip("y cb cr".split(), g.planes(), o.planes()):
            assert np.array_equal(gp, np.asarray(op)), (n_row, fi, name)
print("SHARDED_OK")
"""


def test_sharded_decoder_bit_exact():
    """Real slice-aligned CABAC IP stream decoded on a 1x2 and 1x4
    ("gop","row") mesh must match libavcodec bit-exactly."""
    r = _run_sub(_SHARDED_SCRIPT)
    assert "SHARDED_OK" in r.stdout, r.stdout + r.stderr
