"""PAFF (picture-adaptive frame/field) decoding: field pictures, field POC,
field reference lists (spec 8.2.4.2.5), field pair marking, and output
weaving — validated bit-exactly against libavcodec on synthesized field
streams (x264 cannot emit PAFF; it encodes interlaced content as MBAFF).

The reference only PARSES field_pic_flag/bottom_field_flag
(/root/reference/h264/slice.go:868-876) and decodes nothing."""

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from h264decode_tpu.pipeline.decoder import Decoder
from tests.synth import (
    pcm_frame_planes,
    pcm_slice,
    pskip_frame,
    write_pps,
    write_sps,
)

MB_W, MB_H_FIELD = 4, 2  # 64x32 fields -> 64x64 frames
N_MBS = MB_W * MB_H_FIELD


def _sps():
    return write_sps(MB_W, MB_H_FIELD, frame_mbs_only=False)


def _field_pcm(seed):
    return pcm_frame_planes(MB_W, MB_H_FIELD, seed=seed)


def _idr_pair(seed_top, seed_bot, frame_num=0, lsb=(0, 1)):
    top = _field_pcm(seed_top)
    bot = _field_pcm(seed_bot)
    data = pcm_slice(
        top, list(range(N_MBS)), MB_W, frame_num=frame_num, idr=True,
        poc_lsb=lsb[0], field=0, interlaced_sps=True,
    ) + pcm_slice(
        bot, list(range(N_MBS)), MB_W, frame_num=frame_num, idr=True,
        poc_lsb=lsb[1], field=1, interlaced_sps=True,
    )
    return data, top, bot


def _decode_both(data):
    ours = Decoder().decode_stream(data)
    golden = lavc.decode_annexb(data)
    assert len(ours) == len(golden), (len(ours), len(golden))
    for i, (o, g) in enumerate(zip(ours, golden)):
        for name, op, gp in zip("y cb cr".split(), o.planes(), g.planes()):
            assert np.array_equal(np.asarray(op), gp), f"frame {i} plane {name}"
    return ours


def _weave(top, bot):
    out = np.empty((top.shape[0] * 2, top.shape[1]), top.dtype)
    out[0::2] = top
    out[1::2] = bot
    return out


class TestPaff:
    def test_idr_field_pair_weaves(self):
        data, top, bot = _idr_pair(1, 2)
        frames = _decode_both(_sps() + write_pps() + data)
        assert len(frames) == 1
        assert np.array_equal(np.asarray(frames[0].y), _weave(top[0], bot[0]))
        assert np.array_equal(np.asarray(frames[0].cb), _weave(top[1], bot[1]))

    def _i_pair(self, seed_top, seed_bot, frame_num, lsb):
        """Non-IDR I-PCM reference field pair (libavcodec declines to pair
        the two fields of an IDR frame, so reference-prediction tests use a
        non-IDR pair as the reference — spec-legal either way)."""
        top = _field_pcm(seed_top)
        bot = _field_pcm(seed_bot)
        data = pcm_slice(
            top, list(range(N_MBS)), MB_W, frame_num=frame_num, idr=False,
            ref_idc=1, poc_lsb=lsb[0], field=0, interlaced_sps=True,
        ) + pcm_slice(
            bot, list(range(N_MBS)), MB_W, frame_num=frame_num, idr=False,
            ref_idc=1, poc_lsb=lsb[1], field=1, interlaced_sps=True,
        )
        return data, top, bot

    def test_pskip_fields_copy_same_parity(self):
        """P fields skipping every MB copy RefPicList0[0] — the SAME-parity
        field of the nearest frame (8.2.4.2.5 alternation starts with the
        current parity)."""
        pair0, _, _ = _idr_pair(3, 4)
        pair1, top, bot = self._i_pair(5, 6, frame_num=1, lsb=(2, 3))
        data = (
            _sps() + write_pps() + pair0 + pair1
            + pskip_frame(N_MBS, frame_num=2, poc_lsb=4, ref_idc=1,
                          field=0, interlaced_sps=True)
            + pskip_frame(N_MBS, frame_num=2, poc_lsb=5, ref_idc=1,
                          field=1, interlaced_sps=True)
        )
        frames = _decode_both(data)
        assert len(frames) == 3
        assert np.array_equal(np.asarray(frames[2].y), _weave(top[0], bot[0]))

    def test_pskip_field_sequence(self):
        """Field-pair frames: IDR PCM + I pair + three P-skip pairs
        propagate through field DPB marking and field ref lists."""
        pair0, _, _ = _idr_pair(5, 6)
        pair1, top, bot = self._i_pair(7, 8, frame_num=1, lsb=(2, 3))
        data = _sps() + write_pps() + pair0 + pair1
        for k in range(2, 5):
            data += pskip_frame(N_MBS, frame_num=k, poc_lsb=2 * k,
                                ref_idc=1, field=0, interlaced_sps=True)
            data += pskip_frame(N_MBS, frame_num=k, poc_lsb=2 * k + 1,
                                ref_idc=1, field=1, interlaced_sps=True)
        frames = _decode_both(data)
        assert len(frames) == 5
        for f in frames[1:]:
            assert np.array_equal(np.asarray(f.y), _weave(top[0], bot[0]))

    def test_ref_list_mod_selects_opposite_parity(self):
        """ref_pic_list_modification with field PicNums: pick the OPPOSITE
        parity field as RefPicList0[0] (field PicNum arithmetic: CurrPicNum
        = 2*frame_num+1, MaxPicNum = 2*MaxFrameNum), so the skipped field
        copies the other parity and the woven frame swaps parities."""
        pair0, _, _ = _idr_pair(7, 8)
        pair1, top, bot = self._i_pair(9, 10, frame_num=1, lsb=(2, 3))
        # fields of frame 2: CurrPicNum = 5; frame-1 fields have PicNum 3
        # (same parity) / 2 (opposite) -> abs_diff 3, idc 0, value 2
        data = (
            _sps() + write_pps() + pair0 + pair1
            + pskip_frame(N_MBS, frame_num=2, poc_lsb=4, ref_idc=1, field=0,
                          interlaced_sps=True, ref_list_mod=[(0, 2)])
            + pskip_frame(N_MBS, frame_num=2, poc_lsb=5, ref_idc=1, field=1,
                          interlaced_sps=True, ref_list_mod=[(0, 2)])
        )
        frames = _decode_both(data)
        # frame 2 = weave(bottom_of_f1 as top rows, top_of_f1 as bottom)
        assert np.array_equal(np.asarray(frames[2].y), _weave(bot[0], top[0]))

    def test_mixed_frame_then_fields(self):
        """A frame-coded IDR followed by P-skip fields: the fields reference
        the frame picture's field views (Picture.field parity slicing)."""
        full = pcm_frame_planes(MB_W, MB_H_FIELD * 2, seed=9)
        data = (
            _sps() + write_pps()
            + pcm_slice(full, list(range(N_MBS * 2)), MB_W,
                        interlaced_sps=True)  # frame picture (field=None)
            + pskip_frame(N_MBS, frame_num=1, poc_lsb=2, ref_idc=1,
                          field=0, interlaced_sps=True)
            + pskip_frame(N_MBS, frame_num=1, poc_lsb=3, ref_idc=1,
                          field=1, interlaced_sps=True)
        )
        frames = _decode_both(data)
        assert len(frames) == 2
        assert np.array_equal(np.asarray(frames[1].y), full[0])


@pytest.mark.parametrize("deblock", [False, True], ids=["nodb", "deblock"])
def test_paff_p_field_residuals(deblock):
    """Field pictures with CODED residuals: the Table 8-13 FIELD coefficient
    scan governs descan in PAFF field pictures (every scan position probed
    across blocks), on top of field MC from a PCM reference pair — bit-exact
    vs libavcodec. Previously only PCM/skip field pictures were exercised,
    which let a missing field scan go unnoticed."""
    from tests.synth import paff_p_residual_slice, pcm_slice, write_pps, write_sps

    pair, _, _ = _idr_pair(31, 32, frame_num=0, lsb=(0, 1))
    data = write_sps(MB_W, MB_H_FIELD, frame_mbs_only=False) + write_pps()
    data += pair

    def plan(mb, blk):
        # cycle through all 16 scan positions; leave some blocks empty
        k = (mb * 16 + blk) % 19
        return k if k < 16 else None

    data += paff_p_residual_slice(
        MB_W, MB_H_FIELD, plan, frame_num=1, field=0, poc_lsb=2,
        deblock=deblock,
    )
    data += paff_p_residual_slice(
        MB_W, MB_H_FIELD, plan, frame_num=1, field=1, poc_lsb=2,
        deblock=deblock,
    )
    _decode_both(data)


class TestPaffChromaFormats:
    """PAFF field pictures at 4:2:2 and 4:4:4 (synthetic streams: I_PCM
    field pairs + all-skip P fields — x264 emits no PAFF at all, and none
    of the formats' residual tools differ per field beyond what the MBAFF
    422/444 golden matrices already pin). Exercises field pairing/POC/
    weaving and full-plane field MC at the wider chroma geometries."""

    @pytest.mark.parametrize("cf", [2, 3])
    def test_pcm_pair_and_pskip_fields(self, cf):
        sps = write_sps(MB_W, MB_H_FIELD, frame_mbs_only=False,
                        chroma_format_idc=cf)
        top = pcm_frame_planes(MB_W, MB_H_FIELD, seed=1, chroma_format=cf)
        bot = pcm_frame_planes(MB_W, MB_H_FIELD, seed=2, chroma_format=cf)
        data = (
            pcm_slice(top, list(range(N_MBS)), MB_W, frame_num=0, idr=False,
                      ref_idc=1, poc_lsb=0, field=0, interlaced_sps=True)
            + pcm_slice(bot, list(range(N_MBS)), MB_W, frame_num=0, idr=False,
                        ref_idc=1, poc_lsb=1, field=1, interlaced_sps=True)
            + pskip_frame(N_MBS, frame_num=1, poc_lsb=2, field=0,
                          interlaced_sps=True)
            + pskip_frame(N_MBS, frame_num=1, poc_lsb=3, field=1,
                          interlaced_sps=True)
        )
        frames = _decode_both(sps + write_pps() + data)
        assert len(frames) == 2
        # P-skip fields copy the same-parity reference field: frame 2 == 1
        for a, b in zip(frames[0].planes(), frames[1].planes()):
            assert np.array_equal(np.asarray(a), np.asarray(b))
