"""Pallas kernel logic exercised on the CPU backend via interpreter mode
(H264_PALLAS_INTERPRET=1): the exact TPU kernel code paths — raster intra
prediction and deblocking — run through the golden oracle comparison
without TPU hardware (SURVEY.md section 5, sanitizer/interpreter row)."""

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from tests.conftest import make_test_frames


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from h264decode_tpu.pipeline import tpu_pipeline

    monkeypatch.setenv("H264_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(tpu_pipeline, "_ON_TPU", True)
    # force a fresh trace: cached executables were built with _ON_TPU=False
    tpu_pipeline.frame_step.clear_cache()
    yield tpu_pipeline
    tpu_pipeline.frame_step.clear_cache()
    monkeypatch.setattr(tpu_pipeline, "_ON_TPU", None)


def test_pallas_kernels_bit_exact_interpreted(interpret_pallas):
    tpu_pipeline = interpret_pallas
    frames = make_test_frames(3, 64, 64, seed=8)
    bs = lavc.encode_x264(frames, qp=28, profile="main", cabac=True, bframes=1)
    golden = lavc.decode_annexb(bs)
    ours = tpu_pipeline.TpuDecoder().decode_stream(bs)
    assert len(ours) == len(golden)
    for fi, (g, o) in enumerate(zip(golden, ours)):
        for name, gp, op in zip("y cb cr".split(), g.planes(), o.planes()):
            assert np.array_equal(gp, np.asarray(op)), (fi, name)
