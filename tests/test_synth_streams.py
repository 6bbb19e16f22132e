"""End-to-end tests of spec machinery x264 never emits, driven by the
synthetic stream writer (tests/synth.py): FMO map types 0-6, I_PCM
macroblocks, MMCO marking ops, long-term references, explicit ref-list
modification, and POC types 1/2.

Two oracles:
  * libavcodec (golden/lavc.py) for everything it supports (PCM, MMCO,
    long-term, POC types) — bit-exact plane compare;
  * known pixels for FMO streams (libavcodec does not implement FMO): every
    macroblock is I_PCM carrying an address-dependent random pattern, so a
    correct decode reproduces the PCM planes exactly and any slice-group
    traversal error (spec 8.2.2) misplaces pixels.

The FMO maps themselves are additionally cross-checked against an
independent transcription of spec 8.2.2.1-8.2.2.7 kept in THIS file, so
syntax/fmo.py and the test can't share a bug.

Reference parity: the reference parses FMO params for map types 0-2 only
and leaves the traversal broken (/root/reference/h264/slice.go:457-529,
:548); it walks I_PCM syntax (slice.go:696-726) but decodes no pixels.
"""

from __future__ import annotations

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from h264decode_tpu.pipeline.decoder import Decoder, decode_annexb
from h264decode_tpu.syntax.fmo import (
    map_unit_to_slice_group_map,
    next_mb_address,
)
from h264decode_tpu.syntax.pps import parse_pps
from h264decode_tpu.syntax.sps import parse_sps

from tests.synth import (
    pcm_frame_planes,
    pcm_slice,
    pskip_frame,
    write_pps,
    write_sps,
)

MB_W, MB_H = 4, 3
N_MBS = MB_W * MB_H


# ---------------------------------------------------------------------------
# independent spec 8.2.2 transcription (test-local oracle for fmo.py)
# ---------------------------------------------------------------------------


def spec_map(map_type, n_groups, w, h, *, run_lengths=None, top_left=None,
             bottom_right=None, change_dir=False, rate=1, cycle=0, ids=None):
    size = w * h
    m = np.zeros(size, int)
    d = int(change_dir)
    g0 = min(cycle * rate, size)  # MapUnitsInSliceGroup0, 7-32
    if map_type == 0:  # 8.2.2.1
        i = 0
        while i < size:
            for g in range(n_groups):
                for _ in range(run_lengths[g]):
                    if i < size:
                        m[i] = g
                        i += 1
    elif map_type == 1:  # 8.2.2.2
        for i in range(size):
            m[i] = ((i % w) + (((i // w) * n_groups) // 2)) % n_groups
    elif map_type == 2:  # 8.2.2.3
        m[:] = n_groups - 1
        for g in range(n_groups - 2, -1, -1):
            ytl, xtl = divmod(top_left[g], w)
            ybr, xbr = divmod(bottom_right[g], w)
            for y in range(ytl, ybr + 1):
                for x in range(xtl, xbr + 1):
                    m[y * w + x] = g
    elif map_type == 3:  # 8.2.2.4 box-out
        m[:] = 1
        x = (w - d) // 2
        y = (h - d) // 2
        left = right = x
        top = bottom = y
        xdir, ydir = d - 1, d
        k = 0
        while k < g0:
            if m[y * w + x] == 1:
                m[y * w + x] = 0
                k += 1
            if xdir == -1 and x == left:
                left = max(left - 1, 0)
                x = left
                xdir, ydir = 0, 2 * d - 1
            elif xdir == 1 and x == right:
                right = min(right + 1, w - 1)
                x = right
                xdir, ydir = 0, 1 - 2 * d
            elif ydir == -1 and y == top:
                top = max(top - 1, 0)
                y = top
                xdir, ydir = 1 - 2 * d, 0
            elif ydir == 1 and y == bottom:
                bottom = min(bottom + 1, h - 1)
                y = bottom
                xdir, ydir = 2 * d - 1, 0
            else:
                x, y = x + xdir, y + ydir
    elif map_type == 4:  # 8.2.2.5 raster
        size_ul = size - g0 if d else g0
        for i in range(size):
            m[i] = d if i < size_ul else 1 - d
    elif map_type == 5:  # 8.2.2.6 wipe (column-major scan)
        size_ul = size - g0 if d else g0
        k = 0
        for j in range(w):
            for i in range(h):
                m[i * w + j] = d if k < size_ul else 1 - d
                k += 1
    elif map_type == 6:  # 8.2.2.7 explicit
        for i in range(size):
            m[i] = ids[i] if i < len(ids) else 0
    return m


def _fmo_pps_kwargs(map_type, change_dir=False):
    if map_type == 0:
        return dict(num_slice_groups=2, map_type=0, run_lengths=[2, 3])
    if map_type == 1:
        return dict(num_slice_groups=3, map_type=1)
    if map_type == 2:
        return dict(num_slice_groups=2, map_type=2, top_left=[5], bottom_right=[10])
    if map_type in (3, 4, 5):
        return dict(num_slice_groups=2, map_type=map_type,
                    change_direction=change_dir, change_rate=1)
    ids = [(i // 2 + i) % 2 for i in range(N_MBS)]  # checkerboard-ish
    return dict(num_slice_groups=2, map_type=6, slice_group_id=ids)


def _spec_kwargs(map_type, change_dir=False, cycle=0):
    k = _fmo_pps_kwargs(map_type, change_dir)
    out = dict(run_lengths=k.get("run_lengths"), top_left=k.get("top_left"),
               bottom_right=k.get("bottom_right"), change_dir=change_dir,
               rate=k.get("change_rate", 1), cycle=cycle,
               ids=k.get("slice_group_id"))
    return k["num_slice_groups"], out


def _build_fmo_stream(map_type, change_dir=False, cycle=5):
    """IDR picture, one all-PCM slice per slice group."""
    planes = pcm_frame_planes(MB_W, MB_H, seed=100 + map_type)
    sps = write_sps(MB_W, MB_H)
    ppsk = _fmo_pps_kwargs(map_type, change_dir)
    pps = write_pps(**ppsk)
    # parse back with the real parsers to build the decode-order map
    from h264decode_tpu.syntax.nal import parse_nal_unit
    from h264decode_tpu.bitstream.annexb import iter_nalus

    nalus = list(iter_nalus(sps + pps))
    s = parse_sps(parse_nal_unit(nalus[0]).rbsp)
    p = parse_pps(parse_nal_unit(nalus[1]).rbsp, {0: s})
    mb_map = map_unit_to_slice_group_map(s, p, cycle)
    cycle_bits = 0
    if map_type in (3, 4, 5):
        bits = 1
        while (1 << bits) * (ppsk["change_rate"]) < N_MBS + ppsk["change_rate"]:
            bits += 1
        cycle_bits = bits
    data = sps + pps
    for g in range(ppsk["num_slice_groups"]):
        addrs = [a for a in range(N_MBS) if mb_map[a] == g]
        if not addrs:
            continue
        ordered = [addrs[0]]
        a = addrs[0]
        while True:
            a = next_mb_address(mb_map, a)
            if a >= N_MBS:
                break
            ordered.append(a)
        assert sorted(ordered) == addrs
        data += pcm_slice(
            planes, ordered, MB_W, num_groups_cycle_bits=cycle_bits,
            change_cycle=cycle,
        )
    return data, planes, (mb_map, s, p)


class TestFmoMaps:
    """syntax/fmo.py vs the independent spec transcription."""

    @pytest.mark.parametrize("map_type", range(7))
    @pytest.mark.parametrize("change_dir", [False, True])
    @pytest.mark.parametrize("cycle", [0, 3, 5, 12])
    def test_map_matches_spec(self, map_type, change_dir, cycle):
        if map_type not in (3, 4, 5) and (change_dir or cycle != 5):
            pytest.skip("direction/cycle only affect types 3-5")
        _, planes, _ = None, None, None
        sps = write_sps(MB_W, MB_H)
        ppsk = _fmo_pps_kwargs(map_type, change_dir)
        pps = write_pps(**ppsk)
        from h264decode_tpu.syntax.nal import parse_nal_unit
        from h264decode_tpu.bitstream.annexb import iter_nalus

        nalus = list(iter_nalus(sps + pps))
        s = parse_sps(parse_nal_unit(nalus[0]).rbsp)
        p = parse_pps(parse_nal_unit(nalus[1]).rbsp, {0: s})
        got = map_unit_to_slice_group_map(s, p, cycle)
        n_groups, sk = _spec_kwargs(map_type, change_dir, cycle)
        want = spec_map(map_type, n_groups, MB_W, MB_H, **sk)
        assert np.array_equal(got, want), (map_type, change_dir, cycle, got, want)


class TestFmoDecode:
    """End-to-end FMO decode: PCM pixels must land at their own MB address
    regardless of the slice-group traversal order."""

    @pytest.mark.parametrize("map_type", range(7))
    def test_fmo_pcm_roundtrip(self, map_type):
        data, planes, _ = _build_fmo_stream(map_type)
        frames = decode_annexb(data)
        assert len(frames) == 1
        y, cb, cr = planes
        assert np.array_equal(frames[0].y, y)
        assert np.array_equal(frames[0].cb, cb)
        assert np.array_equal(frames[0].cr, cr)

    @pytest.mark.parametrize("map_type", [3, 4, 5])
    def test_fmo_growing_reverse_direction(self, map_type):
        data, planes, _ = _build_fmo_stream(map_type, change_dir=True, cycle=4)
        frames = decode_annexb(data)
        assert len(frames) == 1
        assert np.array_equal(frames[0].y, planes[0])


def _decode_both(data: bytes):
    """Decode with our decoder and libavcodec; assert bit-exact equality."""
    ours = decode_annexb(data)
    golden = lavc.decode_annexb(data)
    assert len(ours) == len(golden), (len(ours), len(golden))
    for i, (o, g) in enumerate(zip(ours, golden)):
        for name, op, gp in zip("y cb cr".split(), o.planes(), g.planes()):
            assert np.array_equal(np.asarray(op), gp), f"frame {i} plane {name}"
    return ours


class TestPcm:
    def test_ipcm_idr_frame(self):
        planes = pcm_frame_planes(MB_W, MB_H, seed=1)
        data = write_sps(MB_W, MB_H) + write_pps() + pcm_slice(
            planes, list(range(N_MBS)), MB_W
        )
        frames = _decode_both(data)
        assert np.array_equal(frames[0].y, planes[0])
        assert np.array_equal(frames[0].cb, planes[1])
        assert np.array_equal(frames[0].cr, planes[2])

    def test_ipcm_in_p_slice(self):
        a = pcm_frame_planes(MB_W, MB_H, seed=2)
        b = pcm_frame_planes(MB_W, MB_H, seed=3)
        data = (
            write_sps(MB_W, MB_H) + write_pps()
            + pcm_slice(a, list(range(N_MBS)), MB_W)
            + pcm_slice(b, list(range(N_MBS)), MB_W, slice_type=5,
                        frame_num=1, idr=False, ref_idc=1, poc_lsb=2)
        )
        frames = _decode_both(data)
        assert np.array_equal(frames[1].y, b[0])


def _marker_frames(n):
    return [pcm_frame_planes(MB_W, MB_H, seed=10 + i) for i in range(n)]


class TestMarkingAndLists:
    def test_pskip_copies_ref(self):
        a = _marker_frames(1)[0]
        data = (
            write_sps(MB_W, MB_H) + write_pps()
            + pcm_slice(a, list(range(N_MBS)), MB_W)
            + pskip_frame(N_MBS, frame_num=1, poc_lsb=2, ref_idc=1)
        )
        frames = _decode_both(data)
        assert np.array_equal(frames[1].y, a[0])
        assert np.array_equal(frames[1].cb, a[1])

    def test_ref_list_modification(self):
        """8.2.4.3: modification selects an older picture as list[0]."""
        a, b = _marker_frames(2)
        head = write_sps(MB_W, MB_H) + write_pps()
        body = (
            pcm_slice(a, list(range(N_MBS)), MB_W)
            + pcm_slice(b, list(range(N_MBS)), MB_W, frame_num=1, idr=False,
                        ref_idc=1, poc_lsb=2)
            # default list would be [B, A]; abs_diff 2 below CurrPicNum=2 -> A
            + pskip_frame(N_MBS, frame_num=2, poc_lsb=4,
                          ref_list_mod=[(0, 1)])
        )
        frames = _decode_both(head + body)
        assert np.array_equal(frames[2].y, a[0])

    def test_long_term_reference_flag_idr(self):
        """IDR long_term_reference_flag + list modification idc=2."""
        a, b = _marker_frames(2)
        data = (
            write_sps(MB_W, MB_H) + write_pps()
            + pcm_slice(a, list(range(N_MBS)), MB_W,
                        long_term_reference_flag=True)
            + pcm_slice(b, list(range(N_MBS)), MB_W, frame_num=1, idr=False,
                        ref_idc=1, poc_lsb=2)
            + pskip_frame(N_MBS, frame_num=2, poc_lsb=4,
                          ref_list_mod=[(2, 0)])  # long_term_pic_num 0 -> A
        )
        frames = _decode_both(data)
        assert np.array_equal(frames[2].y, a[0])

    def test_mmco3_short_to_long(self):
        """MMCO 3 converts A to long-term; select it via idc=2."""
        a, b = _marker_frames(2)
        data = (
            write_sps(MB_W, MB_H) + write_pps()
            + pcm_slice(a, list(range(N_MBS)), MB_W)
            + pcm_slice(b, list(range(N_MBS)), MB_W, frame_num=1, idr=False,
                        ref_idc=1, poc_lsb=2,
                        mmco_ops=[(3, 0, 0)])  # picNumX=0 (A) -> lt idx 0
            + pskip_frame(N_MBS, frame_num=2, poc_lsb=4,
                          ref_list_mod=[(2, 0)])
        )
        frames = _decode_both(data)
        assert np.array_equal(frames[2].y, a[0])

    def test_mmco6_current_to_long(self):
        """MMCO 6 marks the current picture long-term."""
        a, b = _marker_frames(2)
        data = (
            write_sps(MB_W, MB_H) + write_pps()
            + pcm_slice(a, list(range(N_MBS)), MB_W)
            + pcm_slice(b, list(range(N_MBS)), MB_W, frame_num=1, idr=False,
                        ref_idc=1, poc_lsb=2, mmco_ops=[(4, 1), (6, 0)])
            + pskip_frame(N_MBS, frame_num=2, poc_lsb=4,
                          ref_list_mod=[(2, 0)])  # long-term pic = B
        )
        frames = _decode_both(data)
        assert np.array_equal(frames[2].y, b[0])

    def test_mmco1_protects_against_sliding_window(self):
        """max_num_ref_frames=2; MMCO 1 removes B so A survives where the
        sliding window would have evicted it."""
        a, b, c = _marker_frames(3)
        data = (
            write_sps(MB_W, MB_H, max_num_ref_frames=2) + write_pps()
            + pcm_slice(a, list(range(N_MBS)), MB_W)
            + pcm_slice(b, list(range(N_MBS)), MB_W, frame_num=1, idr=False,
                        ref_idc=1, poc_lsb=2)
            + pcm_slice(c, list(range(N_MBS)), MB_W, frame_num=2, idr=False,
                        ref_idc=1, poc_lsb=4,
                        mmco_ops=[(1, 0)])  # remove picNumX=1 (B)
            # CurrPicNum=3; abs_diff_pic_num_minus1=2 -> picNumX=0 = A
            + pskip_frame(N_MBS, frame_num=3, poc_lsb=6,
                          ref_list_mod=[(0, 2)])
        )
        frames = _decode_both(data)
        assert np.array_equal(frames[3].y, a[0])

    def test_mmco2_and_mmco4_drop_long_term(self):
        """State-level: MMCO 2 unmarks a long-term picture; MMCO 4 lowers
        MaxLongTermFrameIdx."""
        a, b = _marker_frames(2)
        data = (
            write_sps(MB_W, MB_H) + write_pps()
            + pcm_slice(a, list(range(N_MBS)), MB_W,
                        long_term_reference_flag=True)
            + pcm_slice(b, list(range(N_MBS)), MB_W, frame_num=1, idr=False,
                        ref_idc=1, poc_lsb=2, mmco_ops=[(2, 0)])  # unmark A
        )
        d = Decoder()
        d.decode_stream(data)
        assert not any(p.long_term for p in d.dpb.pictures)
        data2 = (
            write_sps(MB_W, MB_H) + write_pps()
            + pcm_slice(a, list(range(N_MBS)), MB_W,
                        long_term_reference_flag=True)
            + pcm_slice(b, list(range(N_MBS)), MB_W, frame_num=1, idr=False,
                        ref_idc=1, poc_lsb=2, mmco_ops=[(4, 0)])  # max idx -1
        )
        d2 = Decoder()
        d2.decode_stream(data2)
        assert not any(p.long_term for p in d2.dpb.pictures)
        assert d2.dpb.max_long_term_idx == -1

    def test_mmco5_reset(self):
        """MMCO 5 empties the DPB; the next P frame can only reference the
        resetting picture."""
        a, b, c = _marker_frames(3)
        data = (
            write_sps(MB_W, MB_H) + write_pps()
            + pcm_slice(a, list(range(N_MBS)), MB_W)
            + pcm_slice(b, list(range(N_MBS)), MB_W, frame_num=1, idr=False,
                        ref_idc=1, poc_lsb=2)
            + pcm_slice(c, list(range(N_MBS)), MB_W, frame_num=2, idr=False,
                        ref_idc=1, poc_lsb=4, mmco_ops=[(5,)])
            # after MMCO5 the resetting picture has frame_num 0
            + pskip_frame(N_MBS, frame_num=1, poc_lsb=2)
        )
        ours = decode_annexb(data)
        assert np.array_equal(ours[-1].y, c[0])


class TestPocTypes:
    def test_poc_type2(self):
        """POC type 2: output order == decode order; oracle = libavcodec."""
        a, b = _marker_frames(2)
        data = (
            write_sps(MB_W, MB_H, poc_type=2) + write_pps()
            + pcm_slice(a, list(range(N_MBS)), MB_W, poc_type=2)
            + pcm_slice(b, list(range(N_MBS)), MB_W, frame_num=1, idr=False,
                        ref_idc=1, poc_type=2)
            + pskip_frame(N_MBS, frame_num=2, ref_idc=1, poc_type=2)
        )
        frames = _decode_both(data)
        assert np.array_equal(frames[1].y, b[0])

    def test_poc_type1(self):
        """POC type 1 with a delta per picture (delta_always_zero off)."""
        a, b = _marker_frames(2)
        data = (
            write_sps(MB_W, MB_H, poc_type=1, poc_cycle_offsets=(2,))
            + write_pps()
            + pcm_slice(a, list(range(N_MBS)), MB_W, poc_type=1, delta_poc=0)
            + pcm_slice(b, list(range(N_MBS)), MB_W, frame_num=1, idr=False,
                        ref_idc=1, poc_type=1, delta_poc=0)
            + pskip_frame(N_MBS, frame_num=2, ref_idc=1, poc_type=1,
                          delta_poc=0)
        )
        frames = _decode_both(data)
        assert np.array_equal(frames[1].y, b[0])

    def test_poc_type1_always_zero(self):
        a, b = _marker_frames(2)
        data = (
            write_sps(MB_W, MB_H, poc_type=1, poc_cycle_offsets=(2,),
                      delta_pic_order_always_zero=True)
            + write_pps()
            + pcm_slice(a, list(range(N_MBS)), MB_W, poc_type=1)
            + pcm_slice(b, list(range(N_MBS)), MB_W, frame_num=1, idr=False,
                        ref_idc=1, poc_type=1)
        )
        frames = _decode_both(data)
        assert np.array_equal(frames[1].y, b[0])
