"""Synthetic conformant H.264 stream writer for spec machinery x264 never
emits: FMO slice groups (all 7 map types), I_PCM macroblocks, MMCO ops,
long-term references, ref-list modification, POC types 1/2.

Streams are built from two macroblock shapes that need no residual coding:

  * I_PCM macroblocks (mb_type 25 in I slices, 30 in P slices): raw pixels,
    so the decoded output is known exactly — this also makes FMO map-unit
    traversal (spec 8.2.2) observable: every MB carries its own pattern, so
    any mis-mapping shows up as misplaced pixels.
  * P_Skip runs covering a whole slice: with static references every
    predicted MV is (0,0) (spec 8.4.1.1), so the frame is an exact copy of
    RefPicList0[0] — which makes DPB state (MMCO, long-term, list
    modification, POC) directly observable in pixels.

Reference syntax maps: SPS 7.3.2.1.1, PPS 7.3.2.2, slice header 7.3.3
(incl. 7.3.3.1 ref-list modification and 7.3.3.3 marking), slice data 7.3.4,
macroblock layer 7.3.5. (The reference parser walks the same layers without
ever decoding: /root/reference/h264/sps.go:192, pps.go:40, slice.go:835.)
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    """MSB-first bit writer with Exp-Golomb and RBSP finalization."""

    def __init__(self):
        self._bits: list[int] = []

    def u(self, n: int, v: int):
        assert 0 <= v < (1 << n), (n, v)
        for i in range(n - 1, -1, -1):
            self._bits.append((v >> i) & 1)

    def flag(self, v) -> None:
        self.u(1, 1 if v else 0)

    def ue(self, v: int):
        assert v >= 0
        code = v + 1
        n = code.bit_length()
        self.u(2 * n - 1, code)

    def se(self, v: int):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self):
        while len(self._bits) % 8:
            self._bits.append(0)

    def align_one(self):
        """cabac_alignment_one_bit (spec 7.3.4)."""
        while len(self._bits) % 8:
            self._bits.append(1)

    def bytes_raw(self, data: bytes):
        assert len(self._bits) % 8 == 0
        for b in data:
            self.u(8, b)

    def trailing_bits(self):
        self._bits.append(1)
        self.align_zero()

    def rbsp(self) -> bytes:
        assert len(self._bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            v = 0
            for b in self._bits[i : i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


def escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes (spec 7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def nal(nal_type: int, ref_idc: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type]) + escape_rbsp(rbsp)


def write_sps(
    mb_w: int,
    mb_h: int,
    *,
    poc_type: int = 0,
    log2_max_frame_num: int = 4,
    log2_max_poc_lsb: int = 6,
    max_num_ref_frames: int = 4,
    offset_for_non_ref_pic: int = 0,
    poc_cycle_offsets: tuple = (2,),
    delta_pic_order_always_zero: bool = False,
    frame_mbs_only: bool = True,  # False = interlaced (PAFF; mb_h is in
    #                               map units, i.e. FIELD height in MBs)
    mbaff: bool = False,  # MBAFF: mb_h is the FRAME height in MBs (even);
    #                       map units are MB pairs (7.4.2.1.1)
    chroma_format_idc: int = 1,  # != 1 selects a High-family profile SPS
    #                              (7.3.2.1.1 chroma/bit-depth block)
    bit_depth_luma: int = 8,  # only written for the High-family SPS block
    bit_depth_chroma: int | None = None,  # defaults to bit_depth_luma
) -> bytes:
    if mbaff:
        assert mb_h % 2 == 0, "MBAFF frame height must be an even MB count"
        frame_mbs_only = False
        mb_h //= 2  # pic_height_in_map_units counts pairs
    w = BitWriter()
    high_block = (
        chroma_format_idc != 1
        or bit_depth_luma != 8
        or (bit_depth_chroma or bit_depth_luma) != 8
    )
    if chroma_format_idc != 1:
        # High 4:2:2 (122) / High 4:4:4 Predictive (244)
        profile = 122 if chroma_format_idc == 2 else 244
    elif high_block:
        profile = 110  # High 10
    else:
        # Baseline forbids interlaced coding tools; PAFF streams declare Main
        profile = 66 if frame_mbs_only else 77
    w.u(8, profile)
    w.u(8, 0)  # constraint flags + reserved
    w.u(8, 30)  # level_idc
    w.ue(0)  # seq_parameter_set_id
    if high_block:
        w.ue(chroma_format_idc)
        if chroma_format_idc == 3:
            w.flag(False)  # separate_colour_plane_flag
        w.ue(bit_depth_luma - 8)
        w.ue((bit_depth_chroma or bit_depth_luma) - 8)
        w.flag(False)  # qpprime_y_zero_transform_bypass_flag
        w.flag(False)  # seq_scaling_matrix_present_flag
    w.ue(log2_max_frame_num - 4)
    w.ue(poc_type)
    if poc_type == 0:
        w.ue(log2_max_poc_lsb - 4)
    elif poc_type == 1:
        w.flag(delta_pic_order_always_zero)
        w.se(offset_for_non_ref_pic)
        w.se(0)  # offset_for_top_to_bottom_field
        w.ue(len(poc_cycle_offsets))
        for off in poc_cycle_offsets:
            w.se(off)
    w.ue(max_num_ref_frames)
    w.flag(False)  # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.flag(frame_mbs_only)
    if not frame_mbs_only:
        w.flag(mbaff)  # mb_adaptive_frame_field_flag (PAFF vs MBAFF)
    w.flag(True)  # direct_8x8_inference_flag
    w.flag(False)  # frame_cropping_flag
    w.flag(False)  # vui_parameters_present_flag
    w.trailing_bits()
    return nal(7, 3, w.rbsp())


def write_pps(
    *,
    num_slice_groups: int = 1,
    map_type: int = 0,
    run_lengths: list | None = None,
    top_left: list | None = None,
    bottom_right: list | None = None,
    change_direction: bool = False,
    change_rate: int = 1,
    slice_group_id: list | None = None,
    num_ref_l0: int = 1,
    cabac: bool = False,
) -> bytes:
    w = BitWriter()
    w.ue(0)  # pic_parameter_set_id
    w.ue(0)  # seq_parameter_set_id
    w.flag(cabac)  # entropy_coding_mode_flag
    w.flag(False)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(num_slice_groups - 1)
    if num_slice_groups > 1:
        w.ue(map_type)
        if map_type == 0:
            for r in run_lengths:
                w.ue(r - 1)
        elif map_type == 2:
            for tl, br in zip(top_left, bottom_right):
                w.ue(tl)
                w.ue(br)
        elif map_type in (3, 4, 5):
            w.flag(change_direction)
            w.ue(change_rate - 1)
        elif map_type == 6:
            w.ue(len(slice_group_id) - 1)
            bits = max(1, (num_slice_groups - 1).bit_length())
            for g in slice_group_id:
                w.u(bits, g)
    w.ue(num_ref_l0 - 1)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.flag(False)  # weighted_pred_flag
    w.u(2, 0)  # weighted_bipred_idc
    w.se(0)  # pic_init_qp_minus26
    w.se(0)  # pic_init_qs_minus26
    w.se(0)  # chroma_qp_index_offset
    w.flag(True)  # deblocking_filter_control_present_flag
    w.flag(False)  # constrained_intra_pred_flag
    w.flag(False)  # redundant_pic_cnt_present_flag
    w.trailing_bits()
    return nal(8, 3, w.rbsp())


def _slice_header(
    w: BitWriter,
    *,
    first_mb: int,
    slice_type: int,  # 7.4.3 value as written (e.g. 7 = all-I, 5 = all-P)
    frame_num: int,
    idr: bool,
    ref_idc: int,
    poc_type: int = 0,
    poc_lsb: int = 0,
    log2_max_frame_num: int = 4,
    log2_max_poc_lsb: int = 6,
    delta_poc: int | None = None,
    idr_pic_id: int = 0,
    long_term_reference_flag: bool = False,
    mmco_ops: list | None = None,  # [(op, value...), ...]
    ref_list_mod: list | None = None,  # [(idc, value), ...]
    num_ref_override: int | None = None,
    num_groups_cycle_bits: int = 0,
    change_cycle: int = 0,
    field: int | None = None,  # None = frame; 0 = top field, 1 = bottom
    interlaced_sps: bool = False,  # SPS has frame_mbs_only=0
    cabac: bool = False,  # PPS entropy_coding_mode_flag (for cabac_init_idc)
    direct_spatial: bool = True,  # B slices: direct_spatial_mv_pred_flag
    sp_switch: bool = False,  # SP slices: sp_for_switch_flag
    qs_delta: int = 0,  # SP/SI slices: slice_qs_delta
    deblock: bool = False,  # disable_deblocking_filter_idc 0 vs 1
):
    is_p = slice_type % 5 in (0, 3)  # P and SP share the ref-list fields
    is_b = slice_type % 5 == 1
    w.ue(first_mb)
    w.ue(slice_type)
    w.ue(0)  # pic_parameter_set_id
    w.u(log2_max_frame_num, frame_num)
    if interlaced_sps or field is not None:
        w.flag(field is not None)  # field_pic_flag
        if field is not None:
            w.flag(bool(field))  # bottom_field_flag
    if idr:
        w.ue(idr_pic_id)
    if poc_type == 0:
        w.u(log2_max_poc_lsb, poc_lsb)
    elif poc_type == 1 and delta_poc is not None:
        w.se(delta_poc)
    if is_b:
        w.flag(direct_spatial)  # direct_spatial_mv_pred_flag
    if is_p or is_b:
        if num_ref_override is not None:
            w.flag(True)
            w.ue(num_ref_override - 1)
            if is_b:
                w.ue(num_ref_override - 1)
        else:
            w.flag(False)
        # ref_pic_list_modification (7.3.3.1)
        if ref_list_mod:
            w.flag(True)
            for idc, val in ref_list_mod:
                w.ue(idc)
                w.ue(val)
            w.ue(3)
        else:
            w.flag(False)
        if is_b:
            w.flag(False)  # ref_pic_list_modification_flag_l1
    if ref_idc:
        if idr:
            w.flag(False)  # no_output_of_prior_pics_flag
            w.flag(long_term_reference_flag)
        else:
            if mmco_ops:
                w.flag(True)
                for op, *vals in mmco_ops:
                    w.ue(op)
                    for v in vals:
                        w.ue(v)
                w.ue(0)
            else:
                w.flag(False)
    if cabac and slice_type % 5 not in (2, 4):
        w.ue(0)  # cabac_init_idc
    w.se(0)  # slice_qp_delta
    if slice_type % 5 == 3:  # SP (7.3.3)
        w.flag(sp_switch)
        w.se(qs_delta)
    elif slice_type % 5 == 4:  # SI
        w.se(qs_delta)
    # disable_deblocking_filter_idc: off by default (keeps PCM/skip exact)
    w.ue(0 if deblock else 1)
    if deblock:
        w.se(0)  # slice_alpha_c0_offset_div2
        w.se(0)  # slice_beta_offset_div2
    if num_groups_cycle_bits:
        w.u(num_groups_cycle_bits, change_cycle)


def pcm_mb(w: BitWriter, y16: np.ndarray, cb8: np.ndarray, cr8: np.ndarray,
           in_p_slice: bool, mb_type: int | None = None, bit_depth: int = 8):
    """macroblock_layer() for one I_PCM MB (spec 7.3.5). Chroma sample
    counts follow the planes' shapes (8x8 / 16x8 / 16x16 per format).
    mb_type overrides the coded value (48 = I_PCM in B slices)."""
    if mb_type is None:
        mb_type = 30 if in_p_slice else 25  # I_PCM (+5 in P slices)
    w.ue(mb_type)
    w.align_zero()  # pcm_alignment_zero_bit
    if bit_depth == 8:
        w.bytes_raw(y16.astype(np.uint8).tobytes())
        w.bytes_raw(cb8.astype(np.uint8).tobytes())
        w.bytes_raw(cr8.astype(np.uint8).tobytes())
    else:
        for plane in (y16, cb8, cr8):
            for s in np.asarray(plane, np.int64).flatten():
                w.u(bit_depth, int(s))


def pcm_frame_planes(mb_w: int, mb_h: int, seed: int, chroma_format: int = 1,
                     bit_depth: int = 8):
    """Deterministic per-MB PCM pattern (address-dependent, catches any
    traversal misordering)."""
    rng = np.random.default_rng(seed)
    ch = mb_h * (16 if chroma_format in (2, 3) else 8)
    cw = mb_w * (16 if chroma_format == 3 else 8)
    hi = 1 << bit_depth
    dt = np.uint8 if bit_depth == 8 else np.uint16
    y = rng.integers(0, hi, (mb_h * 16, mb_w * 16), dtype=dt)
    cb = rng.integers(0, hi, (ch, cw), dtype=dt)
    cr = rng.integers(0, hi, (ch, cw), dtype=dt)
    return y, cb, cr


def pcm_slice(
    planes,
    mb_addrs: list[int],
    mb_w: int,
    *,
    slice_type: int = 7,
    frame_num: int = 0,
    idr: bool = True,
    ref_idc: int = 3,
    poc_lsb: int = 0,
    poc_type: int = 0,
    delta_poc: int | None = None,
    long_term_reference_flag: bool = False,
    mmco_ops: list | None = None,
    num_groups_cycle_bits: int = 0,
    change_cycle: int = 0,
    log2_max_frame_num: int = 4,
    field: int | None = None,
    interlaced_sps: bool = False,
    bit_depth: int = 8,
) -> bytes:
    """One slice whose MBs (given in decode order) are all I_PCM."""
    y, cb, cr = planes
    w = BitWriter()
    _slice_header(
        w, first_mb=mb_addrs[0], slice_type=slice_type, frame_num=frame_num,
        idr=idr, ref_idc=ref_idc, poc_type=poc_type, poc_lsb=poc_lsb,
        delta_poc=delta_poc, long_term_reference_flag=long_term_reference_flag,
        mmco_ops=mmco_ops, num_groups_cycle_bits=num_groups_cycle_bits,
        change_cycle=change_cycle, log2_max_frame_num=log2_max_frame_num,
        field=field, interlaced_sps=interlaced_sps,
    )
    in_p = slice_type % 5 == 0
    chh = cb.shape[0] // max(1, y.shape[0] // 16)  # chroma MB height
    chw = cb.shape[1] // mb_w  # chroma MB width
    for addr in mb_addrs:
        mby, mbx = divmod(addr, mb_w)
        if in_p:
            w.ue(0)  # mb_skip_run = 0 before each coded MB
        pcm_mb(
            w,
            y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16],
            cb[mby * chh : (mby + 1) * chh, mbx * chw : (mbx + 1) * chw],
            cr[mby * chh : (mby + 1) * chh, mbx * chw : (mbx + 1) * chw],
            in_p,
            bit_depth=bit_depth,
        )
    w.trailing_bits()
    return nal(5 if idr else 1, ref_idc, w.rbsp())


def pskip_frame(
    n_mbs: int,
    *,
    frame_num: int,
    poc_lsb: int = 0,
    poc_type: int = 0,
    delta_poc: int | None = None,
    ref_idc: int = 0,
    mmco_ops: list | None = None,
    ref_list_mod: list | None = None,
    num_ref_override: int | None = None,
    log2_max_frame_num: int = 4,
    field: int | None = None,
    interlaced_sps: bool = False,
) -> bytes:
    """A P slice that skips every MB: decodes to a copy of RefPicList0[0]."""
    w = BitWriter()
    _slice_header(
        w, first_mb=0, slice_type=5, frame_num=frame_num, idr=False,
        ref_idc=ref_idc, poc_type=poc_type, poc_lsb=poc_lsb,
        delta_poc=delta_poc, mmco_ops=mmco_ops, ref_list_mod=ref_list_mod,
        num_ref_override=num_ref_override, log2_max_frame_num=log2_max_frame_num,
        field=field, interlaced_sps=interlaced_sps,
    )
    w.ue(n_mbs)  # mb_skip_run covering the whole picture
    w.trailing_bits()
    return nal(1, ref_idc, w.rbsp())


# ---------------------------------------------------------------------------
# MBAFF (macroblock-adaptive frame/field, spec 6.4.1 figure 6-6/6-8)
# ---------------------------------------------------------------------------


def mbaff_mb_samples(planes, mbaff_addr: int, mb_w: int, field: bool):
    """Samples covered by one MB of an MBAFF pair: a frame MB takes 16
    consecutive rows of the pair's 32-row strip; a field MB takes every
    second row at its parity."""
    y, cb, cr = planes
    pair, bottom = divmod(mbaff_addr, 2)
    pr, pc = divmod(pair, mb_w)
    if field:
        ys = y[pr * 32 + bottom : pr * 32 + 32 : 2, pc * 16 : pc * 16 + 16]
        cbs = cb[pr * 16 + bottom : pr * 16 + 16 : 2, pc * 8 : pc * 8 + 8]
        crs = cr[pr * 16 + bottom : pr * 16 + 16 : 2, pc * 8 : pc * 8 + 8]
    else:
        r0, c0 = pr * 32 + 16 * bottom, pr * 16 + 8 * bottom
        ys = y[r0 : r0 + 16, pc * 16 : pc * 16 + 16]
        cbs = cb[c0 : c0 + 8, pc * 8 : pc * 8 + 8]
        crs = cr[c0 : c0 + 8, pc * 8 : pc * 8 + 8]
    return np.ascontiguousarray(ys), np.ascontiguousarray(cbs), np.ascontiguousarray(crs)


def mbaff_pcm_slice(
    planes,
    mb_w: int,
    pair_flags,  # per-pair mb_field_decoding_flag, raster pair order
    *,
    slice_type: int = 7,
    frame_num: int = 0,
    idr: bool = True,
    ref_idc: int = 3,
    poc_lsb: int = 0,
    first_pair: int = 0,
    n_pairs: int | None = None,
) -> bytes:
    """CAVLC MBAFF slice whose MBs are all I_PCM (frame or field pairs)."""
    w = BitWriter()
    _slice_header(
        w, first_mb=first_pair, slice_type=slice_type, frame_num=frame_num,
        idr=idr, ref_idc=ref_idc, poc_lsb=poc_lsb, interlaced_sps=True,
    )
    in_p = slice_type % 5 == 0
    end = len(pair_flags) if n_pairs is None else first_pair + n_pairs
    for pair in range(first_pair, end):
        for tb in (0, 1):
            if in_p:
                w.ue(0)  # mb_skip_run
            if tb == 0:
                w.flag(pair_flags[pair])  # mb_field_decoding_flag
            ys, cbs, crs = mbaff_mb_samples(
                planes, 2 * pair + tb, mb_w, pair_flags[pair]
            )
            pcm_mb(w, ys, cbs, crs, in_p)
    w.trailing_bits()
    return nal(5 if idr else 1, ref_idc, w.rbsp())


def mbaff_p_slice(
    planes,
    mb_w: int,
    actions,  # per MBAFF address: ("skip",) | ("p16", mvd_x, mvd_y) | ("pcm",)
    pair_flags,
    *,
    frame_num: int,
    poc_lsb: int = 0,
    ref_idc: int = 0,
) -> bytes:
    """CAVLC MBAFF P slice: P_L0_16x16 MBs (no residual), skip runs (incl.
    mid-pair and whole-pair, exercising the 7.4.4 flag inference and the
    deferred-top-skip path), and I_PCM MBs. Inter pairs must be frame-coded
    (pair_flags False); PCM pairs may be field."""
    w = BitWriter()
    _slice_header(
        w, first_mb=0, slice_type=5, frame_num=frame_num, idr=False,
        ref_idc=ref_idc, poc_lsb=poc_lsb, interlaced_sps=True,
    )
    run = 0
    for addr_m, act in enumerate(actions):
        if act[0] == "skip":
            run += 1
            continue
        w.ue(run)  # mb_skip_run
        if addr_m % 2 == 0 or run > 0:  # 7.3.4 flag presence
            w.flag(pair_flags[addr_m // 2])
        run = 0
        if act[0] == "pcm":
            ys, cbs, crs = mbaff_mb_samples(
                planes, addr_m, mb_w, pair_flags[addr_m // 2]
            )
            pcm_mb(w, ys, cbs, crs, True)
        else:
            _, mvd_x, mvd_y = act
            w.ue(0)  # mb_type P_L0_16x16
            if pair_flags[addr_m // 2]:
                # field MB: the per-field list doubles (7.4.5.1) so with one
                # frame reference ref_idx_l0 is coded — te(cMax 1) single
                # bit, INVERTED (0 -> bit 1); pick index 0 = same parity
                w.u(1, 1)
            w.se(mvd_x)
            w.se(mvd_y)
            w.ue(0)  # coded_block_pattern = 0 (inter me(0))
    if run:
        w.ue(run)  # trailing skip run
    w.trailing_bits()
    return nal(1, ref_idc, w.rbsp())


def mbaff_b_slice(
    planes,
    mb_w: int,
    actions,  # per MBAFF address: ("skip",) | ("pcm",)
    pair_flags,
    *,
    frame_num: int,
    poc_lsb: int = 0,
    ref_idc: int = 0,
    direct_spatial: bool = False,
) -> bytes:
    """CAVLC MBAFF B slice of B_Skip runs (direct prediction — TEMPORAL
    when direct_spatial=False) and I_PCM anchors. A field-coded PCM pair
    seeds the 7.4.4 inference so following fully-skipped pairs decode as
    FIELD B_Skip macroblocks — field temporal direct with a real
    libavcodec oracle."""
    w = BitWriter()
    _slice_header(
        w, first_mb=0, slice_type=6, frame_num=frame_num, idr=False,
        ref_idc=ref_idc, poc_lsb=poc_lsb, interlaced_sps=True,
        direct_spatial=direct_spatial,
    )
    run = 0
    for addr_m, act in enumerate(actions):
        if act[0] == "skip":
            run += 1
            continue
        w.ue(run)  # mb_skip_run
        if addr_m % 2 == 0 or run > 0:  # 7.3.4 flag presence
            w.flag(pair_flags[addr_m // 2])
        run = 0
        assert act[0] == "pcm"
        ys, cbs, crs = mbaff_mb_samples(
            planes, addr_m, mb_w, pair_flags[addr_m // 2]
        )
        # B-slice mb_type: intra offset 23, I_PCM = 25 -> ue(48)
        pcm_mb(w, ys, cbs, crs, True, mb_type=48)
    if run:
        w.ue(run)
    w.trailing_bits()
    return nal(1, ref_idc, w.rbsp())


def cabac_mbaff_pcm_slice(
    planes,
    mb_w: int,
    pair_flags,
    *,
    frame_num: int = 0,
    idr: bool = True,
    ref_idc: int = 3,
    poc_lsb: int = 0,
    qp: int = 26,
) -> bytes:
    """CABAC MBAFF I slice of I_PCM MBs: exercises mb_field_decoding_flag
    (ctx 70-72), the I_PCM terminate bin, per-PCM engine re-init (9.3.1.2),
    and end-of-slice flags read only after bottom MBs."""
    from tests.test_cabac import SpecCabacEncoder

    w = BitWriter()
    _slice_header(
        w, first_mb=0, slice_type=7, frame_num=frame_num, idr=idr,
        ref_idc=ref_idc, poc_lsb=poc_lsb, interlaced_sps=True, cabac=True,
    )
    w.align_one()  # cabac_alignment_one_bit
    out = bytearray(w.rbsp())

    enc = SpecCabacEncoder(qp, True, 0)

    def fresh_engine():
        nonlocal enc
        e2 = SpecCabacEncoder.__new__(SpecCabacEncoder)
        e2.low, e2.range, e2.bits = 0, 510, []
        e2.first, e2.outstanding = True, 0
        e2.states, e2.mps = enc.states, enc.mps  # contexts persist (9.3.1.2)
        enc = e2

    n_pairs = len(pair_flags)
    mb_h = 2 * (n_pairs // mb_w)
    decoded = np.zeros(mb_h * mb_w, bool)  # spatial availability
    field_grid = np.zeros(mb_h * mb_w, bool)  # per-MB pair field flag
    for pair in range(n_pairs):
        pr, pc = divmod(pair, mb_w)
        top_sp = 2 * pr * mb_w + pc
        # mb_field_decoding_flag, ctx 70 + (left pair field) + (above pair field)
        finc = 0
        if pc > 0 and decoded[top_sp - 1]:
            finc += int(field_grid[top_sp - 1])
        if pr > 0 and decoded[top_sp - 2 * mb_w]:
            finc += int(field_grid[top_sp - 2 * mb_w])
        enc.decision(70 + finc, int(pair_flags[pair]))
        for tb in (0, 1):
            sp = top_sp + tb * mb_w
            # mb_type I_PCM: bin0 ctx 3+inc (neighbors all I_PCM: not I_NxN).
            # Above-neighbor per 6.4.10.5: the bottom MB of a FIELD pair
            # neighbors the above PAIR, not its own pair's top MB.
            if tb == 1 and pair_flags[pair]:
                above_ok = pr > 0 and decoded[sp - 2 * mb_w]
            else:
                above_ok = sp >= mb_w and decoded[sp - mb_w]
            inc = int(pc > 0 and decoded[sp - 1]) + int(above_ok)
            enc.decision(3 + inc, 1)
            enc.terminate(1)  # I_PCM suffix bin (ctx 276) + engine flush
            ys, cbs, crs = mbaff_mb_samples(planes, 2 * pair + tb, mb_w, pair_flags[pair])
            out += enc.tobytes()  # zero-pads = pcm_alignment_zero_bit
            out += ys.tobytes() + cbs.tobytes() + crs.tobytes()
            fresh_engine()
            decoded[sp] = True
            field_grid[sp] = pair_flags[pair]
            if tb == 1:  # end_of_slice_flag after bottom MBs only
                last = pair == n_pairs - 1
                enc.terminate(1 if last else 0)
    out += enc.tobytes()
    return nal(5 if idr else 1, ref_idc, bytes(out))


def cabac_si_slice(
    mb_w: int,
    mb_h: int,
    *,
    frame_num: int = 0,
    idr: bool = False,
    poc_lsb: int = 0,
    ref_idc: int = 3,
    qs_delta: int = 0,
    qp: int = 26,
) -> bytes:
    """CABAC SI slice: every MB an SI macroblock (Table 7-12 mb_type 0) with
    predicted Intra_4x4 modes, DC chroma mode and cbp 0 — exercises the
    Table 9-39 SI mb_type prefix (ctxIdxOffset 0, 9.3.3.1.1.3) and the
    9.3.1.1 I-table context init for SI slices. Content-identical to
    si_slice(), so the CAVLC decode is the pixel oracle."""
    from tests.test_cabac import SpecCabacEncoder

    w = BitWriter()
    _slice_header(
        w, first_mb=0, slice_type=9, frame_num=frame_num, idr=idr,
        ref_idc=ref_idc, poc_lsb=poc_lsb, qs_delta=qs_delta, cabac=True,
    )
    w.align_one()  # cabac_alignment_one_bit
    out = bytearray(w.rbsp())
    enc = SpecCabacEncoder(qp, True, 0)
    n_mbs = mb_w * mb_h
    for addr in range(n_mbs):
        mbx, mby = addr % mb_w, addr // mb_w
        # SI prefix, ctx 0 + condTermFlags (neighbors are all SI -> 0)
        enc.decision(0, 0)
        for _blk in range(16):
            enc.decision(68, 1)  # prev_intra4x4_pred_mode_flag: predicted
        # intra_chroma_pred_mode 0 (DC): neighbors all mode 0 -> inc 0
        enc.decision(64, 0)
        # coded_block_pattern 0 (9.3.3.1.1.4); unavailable neighbor luma
        # nibble counts as coded (0x0F), decoded SI MBs carry cbp 0
        cbp_a = 0x0F if mbx == 0 else 0
        cbp_b = 0x0F if mby == 0 else 0
        cbp = 0
        ctx = (0 if cbp_a & 0x02 else 1) + 2 * (0 if cbp_b & 0x04 else 1)
        enc.decision(73 + ctx, 0)
        ctx = (0 if cbp & 0x01 else 1) + 2 * (0 if cbp_b & 0x08 else 1)
        enc.decision(73 + ctx, 0)
        ctx = (0 if cbp_a & 0x08 else 1) + 2 * (0 if cbp & 0x01 else 1)
        enc.decision(73 + ctx, 0)
        ctx = (0 if cbp & 0x04 else 1) + 2 * (0 if cbp & 0x02 else 1)
        enc.decision(73 + ctx, 0)
        ca, cb = (cbp_a >> 4) & 3, (cbp_b >> 4) & 3
        ctx = (1 if ca > 0 else 0) + 2 * (1 if cb > 0 else 0)
        enc.decision(77 + ctx, 0)
        enc.terminate(1 if addr == n_mbs - 1 else 0)  # end_of_slice_flag
    out += enc.tobytes()
    return nal(5 if idr else 1, ref_idc, bytes(out))


# ---------------------------------------------------------------------------
# SP / SI switching slices (spec 7.3.3 SP fields, 7.3.5 Table 7-12)
# ---------------------------------------------------------------------------


def sp_slice(
    n_mbs: int,
    actions,  # per MB: ("skip",) | ("p16", mvd_x, mvd_y)
    *,
    frame_num: int,
    poc_lsb: int = 0,
    ref_idc: int = 0,
    sp_switch: bool = False,
    qs_delta: int = 0,
    deblock: bool = False,
) -> bytes:
    """CAVLC SP slice (slice_type 8): P_L0_16x16 MBs without residual plus
    skip runs. Reconstruction runs the 8.6.1 transform-domain chain even
    with zero levels, so the output differs observably from a P slice."""
    w = BitWriter()
    _slice_header(
        w, first_mb=0, slice_type=8, frame_num=frame_num, idr=False,
        ref_idc=ref_idc, poc_lsb=poc_lsb, sp_switch=sp_switch,
        qs_delta=qs_delta, deblock=deblock,
    )
    run = 0
    for act in actions:
        if act[0] == "skip":
            run += 1
            continue
        w.ue(run)
        run = 0
        _, mvd_x, mvd_y = act
        w.ue(0)  # mb_type P_L0_16x16
        w.se(mvd_x)
        w.se(mvd_y)
        w.ue(0)  # coded_block_pattern = 0 (inter me(0))
    if run:
        w.ue(run)
    w.trailing_bits()
    return nal(1, ref_idc, w.rbsp())


def si_slice(
    n_mbs: int,
    *,
    frame_num: int = 0,
    idr: bool = False,
    poc_lsb: int = 0,
    ref_idc: int = 3,
    qs_delta: int = 0,
) -> bytes:
    """CAVLC SI slice (slice_type 9): every MB is an SI macroblock
    (Table 7-12 mb_type 0) with predicted Intra_4x4 modes, DC chroma mode
    and no residual — decoding runs the 8.6.2 chain on the predictions."""
    w = BitWriter()
    _slice_header(
        w, first_mb=0, slice_type=9, frame_num=frame_num, idr=idr,
        ref_idc=ref_idc, poc_lsb=poc_lsb, qs_delta=qs_delta,
    )
    for _ in range(n_mbs):
        w.ue(0)  # mb_type SI
        for _blk in range(16):
            w.flag(True)  # prev_intra4x4_pred_mode_flag (use predicted)
        w.ue(0)  # intra_chroma_pred_mode: DC
        w.ue(3)  # coded_block_pattern: intra me code 3 -> cbp 0
    w.trailing_bits()
    return nal(5 if idr else 1, ref_idc, w.rbsp())


# ---------------------------------------------------------------------------
# CAVLC residual encoder (spec 9.2, inverse of entropy/cavlc.py) — lets the
# synthetic streams carry real coefficient levels (DP partition B/C payloads,
# residual-coded conformance cases). Uses the same generated spec tables as
# the decoder; the encode/decode pair is roundtrip-tested in tests.
# ---------------------------------------------------------------------------

from h264decode_tpu.entropy.cavlc_tables import (  # noqa: E402
    CHROMA_DC_COEFF_TOKEN,
    CHROMA_DC_TOTAL_ZEROS,
    COEFF_TOKEN,
    RUN_BEFORE,
    TOTAL_ZEROS_4x4,
)


def _ct_table_for_nc(nc: int):
    if nc >= 8:
        return COEFF_TOKEN[3]
    if nc >= 4:
        return COEFF_TOKEN[2]
    if nc >= 2:
        return COEFF_TOKEN[1]
    if nc >= 0:
        return COEFF_TOKEN[0]
    return CHROMA_DC_COEFF_TOKEN  # nc == -1 (4:2:0 chroma DC)


def encode_residual_cavlc(w: BitWriter, coeff, start: int, end: int,
                          max_num_coeff: int, nc: int) -> int:
    """Encode one residual block (scan-order coeff[max_num_coeff]) as
    residual_block_cavlc() expects (9.2). Returns TotalCoeff."""
    idxs = [i for i in range(start, end + 1) if coeff[i]]
    total = len(idxs)
    hi_first = [int(coeff[i]) for i in reversed(idxs)]
    t1 = 0
    while t1 < min(3, total) and abs(hi_first[t1]) == 1:
        t1 += 1
    ln, bits = _ct_table_for_nc(nc)[total * 4 + t1]
    assert ln > 0, (total, t1, nc)
    w.u(ln, bits)
    if total == 0:
        return 0
    for i in range(t1):
        w.u(1, 1 if hi_first[i] < 0 else 0)  # trailing one signs
    suffix_length = 1 if (total > 10 and t1 < 3) else 0
    for i in range(t1, total):
        lv = hi_first[i]
        level_code = 2 * lv - 2 if lv > 0 else -2 * lv - 1
        if i == t1 and t1 < 3:
            level_code -= 2
        if suffix_length == 0:
            if level_code < 14:
                prefix, size, suffix = level_code, 0, 0
            elif level_code < 30:
                prefix, size, suffix = 14, 4, level_code - 14
            else:
                prefix, size, suffix = 15, 12, level_code - 30
        else:
            if (level_code >> suffix_length) < 15:
                prefix = level_code >> suffix_length
                size, suffix = suffix_length, level_code & ((1 << suffix_length) - 1)
            else:
                prefix, size = 15, 12
                suffix = level_code - (15 << suffix_length)
        assert 0 <= suffix < (1 << size) if size else suffix == 0, (lv, level_code)
        w.u(prefix + 1, 1)  # level_prefix: `prefix` zeros then a 1
        if size:
            w.u(size, suffix)
        if suffix_length == 0:
            suffix_length = 1
        if abs(lv) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1
    # total_zeros
    n_pos = end - start + 1
    zeros_left = (idxs[-1] - start + 1) - total
    if total < n_pos:
        tz = (CHROMA_DC_TOTAL_ZEROS if max_num_coeff == 4
              else TOTAL_ZEROS_4x4)[total - 1]
        ln, bits = tz[zeros_left]
        assert ln > 0, (total, zeros_left)
        w.u(ln, bits)
    # run_before, highest-frequency first; not transmitted once zerosLeft
    # hits 0 (9.2.3: the remaining runs are all inferred as 0)
    pos = [i - start for i in reversed(idxs)]  # hi-first positions
    for i in range(total - 1):
        if zeros_left <= 0:
            break
        run = pos[i] - pos[i + 1] - 1
        ln, bits = RUN_BEFORE[min(zeros_left, 7) - 1][run]
        assert ln > 0, (zeros_left, run)
        w.u(ln, bits)
        zeros_left -= run


def paff_p_residual_slice(
    mb_w: int,
    mb_h_field: int,
    coeff_at,  # (mb_idx, blk) -> scan position of a single +-1 level, or None
    *,
    frame_num: int,
    field: int,
    poc_lsb: int,
    ref_idc: int = 3,
    deblock: bool = False,
) -> bytes:
    """CAVLC P FIELD picture of P_L0_16x16 MBs with zero MVs and luma-only
    residuals (cbp 15): each 4x4 block carries at most one +-1 level at a
    chosen SCAN position. Field pictures descan with the Table 8-13 FIELD
    scan, so any wrong scan misplaces the coefficient observably."""
    from h264decode_tpu.entropy.cavlc import nc_from_neighbors
    from h264decode_tpu.entropy.cavlc_tables import CBP_ME_CHROMA12_INTER
    from h264decode_tpu.tensors.frame_tensors import LUMA_BLK_XY

    w = BitWriter()
    _slice_header(
        w, first_mb=0, slice_type=5, frame_num=frame_num, idr=False,
        ref_idc=ref_idc, poc_lsb=poc_lsb, field=field, interlaced_sps=True,
        deblock=deblock,
    )
    n_mbs = mb_w * mb_h_field
    totals = {}  # (gx, gy) cell -> TotalCoeff
    cbp_code = CBP_ME_CHROMA12_INTER.index(15)
    for mb in range(n_mbs):
        mby, mbx = divmod(mb, mb_w)
        w.ue(0)  # mb_skip_run
        w.ue(0)  # mb_type P_L0_16x16
        w.se(0)  # mvd_x
        w.se(0)  # mvd_y
        w.ue(cbp_code)  # coded_block_pattern 15 (luma only)
        w.se(0)  # mb_qp_delta
        for blk in range(16):
            bx, by = LUMA_BLK_XY[blk]
            gx, gy = mbx * 4 + bx, mby * 4 + by
            na = totals.get((gx - 1, gy)) if gx > 0 else None
            nb = totals.get((gx, gy - 1)) if gy > 0 else None
            nc = nc_from_neighbors(na, nb)
            coeff = [0] * 16
            pos = coeff_at(mb, blk)
            if pos is not None:
                coeff[pos] = 1 if (mb + blk) % 2 == 0 else -1
            totals[(gx, gy)] = encode_residual_cavlc(w, coeff, 0, 15, 16, nc)
    w.trailing_bits()
    return nal(1, ref_idc, w.rbsp())
