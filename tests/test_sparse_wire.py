"""The sparse residual wire format's coded-block masks.

pipeline/tpu_pipeline.py derives "which blocks have levels to ship" from
the entropy stage's nnz bookkeeping grids (O(nMB) int8) instead of scanning
the dense coefficient tensors. Correctness requires the nnz-derived mask to
COVER every block that actually has nonzero levels (extra indices merely
ship zero rows and cost capacity; a missing index would drop residuals).
This asserts cover — and end-to-end bit-exactness through the jitted
decoder — across CAVLC/CABAC, I/P/B, 8x8-transform and I_PCM streams.
"""

from __future__ import annotations

import numpy as np
import pytest

from h264decode_tpu.bitstream.annexb import iter_nalus
from h264decode_tpu.golden import lavc
from h264decode_tpu.pipeline.decoder import Decoder
from h264decode_tpu.pipeline.tpu_pipeline import TpuDecoder, _coded_block_masks


def _streams():
    rng = np.random.default_rng(11)
    h, w = 96, 112
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.clip(
        128 + 50 * np.sin(xx / 9.0) * np.cos(yy / 7.0) + rng.normal(0, 12, (h, w)),
        0, 255,
    ).astype(np.uint8)
    frames = []
    for i in range(6):
        y = np.roll(base, 3 * i, axis=1)
        cb = np.clip(100 + 30 * np.sin(xx[: h // 2, : w // 2] / 5.0 + i), 0, 255).astype(np.uint8)
        cr = np.clip(150 - 30 * np.cos(yy[: h // 2, : w // 2] / 6.0 - i), 0, 255).astype(np.uint8)
        frames.append((y, cb, cr))
    yield "cavlc_ip", lavc.encode_x264(frames, qp=24, profile="baseline", preset="fast", gop=6)
    yield "cabac_ipb", lavc.encode_x264(frames, qp=24, profile="main", cabac=True, bframes=2, preset="fast", gop=6)
    yield "high_8x8", lavc.encode_x264(
        frames, qp=22, profile="high", cabac=True, bframes=1, preset="slow", gop=6,
        extra_x264="8x8dct=1",
    )


class _MaskProbe(Decoder):
    """Collects (ft, has_l8) per picture after entropy decode."""

    def __init__(self):
        super().__init__()
        self.collected = []

    def _reconstruct(self, ft, sps, pps, slices, ref_lists, weight_ctx, poc):
        has_l8 = pps.transform_8x8_mode_flag and ft.luma8_ac is not None
        self.collected.append((ft, has_l8))
        return super()._reconstruct(ft, sps, pps, slices, ref_lists, weight_ctx, poc)


@pytest.mark.parametrize("name,bs", list(_streams()))
def test_nnz_masks_cover_coded_blocks(name, bs):
    dec = _MaskProbe()
    dec.decode_stream(bs)
    assert dec.collected
    for ft, has_l8 in dec.collected:
        masks = _coded_block_masks(ft, has_l8)
        scans = {
            "l": ft.luma_ac.reshape(-1, 16).any(axis=1),
            "c": ft.chroma_ac.reshape(-1, 16).any(axis=1),
            "ld": ft.luma_dc.any(axis=1),
        }
        if has_l8:
            scans["l8"] = ft.luma8_ac.reshape(-1, 64).any(axis=1)
        for key, scan in scans.items():
            missing = scan & ~masks[key]
            assert not missing.any(), (
                f"{name}: nnz mask '{key}' misses {int(missing.sum())} coded blocks"
            )


@pytest.mark.parametrize("name,bs", list(_streams()))
def test_tpu_decoder_bit_exact(name, bs):
    golden = lavc.decode_annexb(bs)
    out = TpuDecoder().decode_stream(bs)
    assert len(out) == len(golden)
    for g, o in zip(golden, out):
        for a, b in zip(g.planes(), o.planes()):
            assert np.array_equal(a, b), name


def test_nnz_masks_with_pcm():
    """I_PCM macroblocks set luma nnz to 16 for nC/deblock purposes without
    populating luma_ac; the mask must exclude them (they ship as planes)."""
    from tests.synth import pcm_frame_planes, pcm_slice, write_pps, write_sps

    mb_w, mb_h = 4, 3
    planes = pcm_frame_planes(mb_w, mb_h, seed=7)
    bs = write_sps(mb_w, mb_h) + write_pps() + pcm_slice(
        planes, list(range(mb_w * mb_h)), mb_w
    )
    dec = _MaskProbe()
    frames = dec.decode_stream(bs)
    assert len(frames) == 1
    for ft, has_l8 in dec.collected:
        masks = _coded_block_masks(ft, has_l8)
        assert not masks["l"].any()  # all-PCM frame ships zero 4x4 blocks
        assert not masks["c"].any()
        assert not (ft.luma_ac.reshape(-1, 16).any(axis=1) & ~masks["l"]).any()
