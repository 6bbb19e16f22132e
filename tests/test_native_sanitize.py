"""ASan/UBSan run of the native entropy engine on hostile bitstreams.

The C++ engine (native/h264_entropy.cpp) parses untrusted input; this test
builds the sanitized twin (`make sanitize`), then decodes clean, truncated,
bit-flipped and random streams through it in a subprocess with libasan
preloaded, asserting no sanitizer report fires (SURVEY.md §5 row 2).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from tests.conftest import make_test_frames

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
ASAN_LIB = os.path.join(NATIVE_DIR, "libh264entropy_asan.so")

_DRIVER = r"""
import os, sys
import numpy as np
from h264decode_tpu.pipeline.decoder import Decoder

data = open(sys.argv[1], "rb").read()
rng = np.random.default_rng(11)
variants = [data, data[: len(data) // 2], data[: len(data) - 37]]
for _ in range(6):
    b = bytearray(data)
    for _ in range(8):
        b[int(rng.integers(64, len(b)))] ^= int(rng.integers(1, 256))
    variants.append(bytes(b))
variants.append(bytes(rng.integers(0, 256, 4096, dtype=np.uint8)))
from h264decode_tpu.entropy import native
assert native.native_available(), "sanitized native engine did not load"
for v in variants:
    try:
        Decoder(error_policy="skip").decode_stream(v)
    except Exception:
        pass  # python-level failure is fine; ASan aborts are not
print("SANITIZE_OK")
"""


def _find_asan_runtime():
    out = subprocess.run(
        ["g++", "-print-file-name=libasan.so"], capture_output=True, text=True
    ).stdout.strip()
    return out if out and os.path.sep in out and os.path.exists(out) else None


def test_native_engine_under_asan(tmp_path):
    asan_rt = _find_asan_runtime()
    if asan_rt is None:
        pytest.skip("libasan runtime not found")
    r = subprocess.run(
        ["make", "-C", NATIVE_DIR, "sanitize"], capture_output=True, text=True
    )
    assert r.returncode == 0, r.stderr
    stream = lavc.encode_x264(
        make_test_frames(4, 144, 176), qp=26, profile="high", cabac=True, bframes=2
    )
    sf = tmp_path / "s.264"
    sf.write_bytes(stream)
    env = dict(os.environ)
    env.update(
        LD_PRELOAD=asan_rt,
        H264_NATIVE_LIB=ASAN_LIB,
        H264_NATIVE="1",
        # leak detection sees the long-lived python allocator arenas; the
        # target here is memory-safety faults in the C++ engine
        ASAN_OPTIONS="detect_leaks=0:abort_on_error=1:handle_segv=1",
        JAX_PLATFORMS="cpu",
    )
    p = subprocess.run(
        [sys.executable, "-c", _DRIVER, str(sf)],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(NATIVE_DIR),
        timeout=570,
    )
    assert "SANITIZE_OK" in p.stdout, (
        f"sanitized run failed\nstdout:\n{p.stdout}\nstderr:\n{p.stderr[-4000:]}"
    )
    assert "ERROR: AddressSanitizer" not in p.stderr
    assert "runtime error:" not in p.stderr
