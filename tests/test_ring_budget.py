"""DPB ring memory budget guard (tpu_pipeline.ring_bytes).

4:4:4 streams keep a full 4-plane half-pel MC stack per chroma component
on device, so a multi-ref high-resolution High 4:4:4 stream can want
gigabytes of ring. The decoder estimates the ring footprint up front and
routes over-budget geometries to the numpy oracle instead of dying in the
device allocator. The reference has no pixel pipeline (and so no DPB
memory management) at all — SURVEY.md section 2.
"""

import numpy as np

from h264decode_tpu.golden import lavc
from h264decode_tpu.pipeline import tpu_pipeline
from h264decode_tpu.pipeline.tpu_pipeline import TpuDecoder
from tests.conftest import make_test_frames


def test_ring_bytes_estimates():
    """ring_bytes must scale with refs/geometry and rank formats sanely."""

    class S:  # minimal SPS stand-in (only the fields ring_bytes reads)
        max_num_ref_frames = 4
        frame_height_in_mbs = 68
        pic_width_in_mbs = 120
        chroma_array_type = 1
        bit_depth_luma = 8

    s420 = S()
    base = TpuDecoder.ring_bytes(s420)
    assert 50 << 20 < base < 200 << 20  # ~85 MB luma + chroma at 1080p R=5

    s444 = S()
    s444.chroma_array_type = 3
    assert TpuDecoder.ring_bytes(s444) > 2.5 * base  # 3 luma-process stacks

    smono = S()
    smono.chroma_array_type = 0
    assert TpuDecoder.ring_bytes(smono) < base

    s10 = S()
    s10.bit_depth_luma = 10
    assert TpuDecoder.ring_bytes(s10) > 1.5 * base  # uint32 ring words

    smax = S()
    smax.max_num_ref_frames = 16
    assert TpuDecoder.ring_bytes(smax) > 3 * base


def test_over_budget_falls_back_to_oracle(monkeypatch, capsys):
    """With a zero budget every stream is over: the decode must route to
    the numpy oracle (bit-exact, never touching the device ring)."""
    monkeypatch.setattr(tpu_pipeline, "_RING_BUDGET_MB", 0)
    bs = lavc.encode_x264(
        make_test_frames(3, 48, 48), qp=30, profile="main", cabac=True, gop=4
    )
    dec = TpuDecoder()
    ours = dec.decode_stream(bs)
    golden = lavc.decode_annexb(bs)
    assert dec._ring is None  # the device ring was never allocated
    assert len(ours) == len(golden)
    for g, o in zip(golden, ours):
        for gp, op in zip(g.planes(), o.planes()):
            assert np.array_equal(np.asarray(gp), np.asarray(op))
    assert "H264_TPU_RING_BUDGET_MB" in capsys.readouterr().err
