"""MBAFF (macroblock-adaptive frame/field) decoding, validated bit-exactly
against libavcodec on synthesized MBAFF streams.

Coverage:
  * pair-ordered MB addressing (spec 6.4.1) through entropy + reconstruction
    for frame pairs, field pairs, and mixed checkerboards (I_PCM carries an
    address-dependent pattern, so any traversal/placement error misplaces
    pixels);
  * mb_field_decoding_flag presence rules (7.3.4), the 7.4.4 inference for
    fully-skipped pairs, and the deferred decode of a skipped top MB whose
    pair flag arrives with the coded bottom MB;
  * inter decoding over frame pairs: P_L0_16x16 with explicit MVDs, P_Skip
    mid-pair and whole-pair runs, and I_PCM refresh inside P slices;
  * CABAC MBAFF: mb_field_decoding_flag ctx 70-72, the I_PCM terminate bin,
    per-PCM engine re-initialization, end_of_slice only after bottom MBs;
  * multi-slice MBAFF (first_mb_in_slice in pair units, 7.4.3).

The reference only walks MBAFF syntax without decoding
(/root/reference/h264/slice.go:599-630).
"""

import numpy as np
import pytest

from h264decode_tpu.golden import lavc
from h264decode_tpu.pipeline.decoder import Decoder
from tests.synth import (
    cabac_mbaff_pcm_slice,
    mbaff_p_slice,
    mbaff_pcm_slice,
    pcm_frame_planes,
    write_pps,
    write_sps,
)

MB_W, MB_H = 4, 4  # 64x64 frame, 8 MB pairs
N_PAIRS = MB_W * MB_H // 2


def _headers(cabac=False):
    return write_sps(MB_W, MB_H, mbaff=True) + write_pps(cabac=cabac)


def _planes(seed):
    return pcm_frame_planes(MB_W, MB_H, seed=seed)


def _decode_both(data):
    ours = Decoder().decode_stream(data)
    golden = lavc.decode_annexb(data)
    assert len(ours) == len(golden), (len(ours), len(golden))
    for i, (o, g) in enumerate(zip(ours, golden)):
        for name, op, gp in zip("y cb cr".split(), o.planes(), g.planes()):
            assert np.array_equal(np.asarray(op), gp), f"frame {i} plane {name}"
    return ours


@pytest.mark.parametrize(
    "flags",
    [
        pytest.param([False] * N_PAIRS, id="frame-pairs"),
        pytest.param([True] * N_PAIRS, id="field-pairs"),
        pytest.param([bool(i % 2) for i in range(N_PAIRS)], id="mixed-pairs"),
    ],
)
def test_mbaff_pcm(flags):
    planes = _planes(1)
    data = _headers() + mbaff_pcm_slice(planes, MB_W, flags)
    frames = _decode_both(data)
    # PCM carries the exact planes: placement is fully determined
    assert np.array_equal(np.asarray(frames[0].y), planes[0])


def test_mbaff_pcm_multi_slice():
    """Two slices splitting the pair rows; first_mb_in_slice is in pairs."""
    planes = _planes(2)
    flags = [bool((i // MB_W) % 2) for i in range(N_PAIRS)]  # rows alternate
    half = N_PAIRS // 2
    data = _headers() + mbaff_pcm_slice(
        planes, MB_W, flags, first_pair=0, n_pairs=half
    ) + mbaff_pcm_slice(planes, MB_W, flags, first_pair=half, n_pairs=half)
    _decode_both(data)


def test_mbaff_cabac_pcm():
    planes = _planes(3)
    flags = [bool(i % 2) for i in range(N_PAIRS)]
    data = _headers(cabac=True) + cabac_mbaff_pcm_slice(planes, MB_W, flags)
    frames = _decode_both(data)
    assert np.array_equal(np.asarray(frames[0].y), planes[0])


def test_mbaff_p_frame_pairs():
    """P picture over frame pairs: explicit MVDs, skip deferral cases."""
    ref = _planes(4)
    cur = _planes(5)
    no_field = [False] * N_PAIRS
    # exercises: flag read at top with both coded; top skipped + bottom
    # coded (prevMbSkipped flag read); whole pair skipped (7.4.4 inference);
    # coded top + skipped bottom; PCM refresh inside the P slice
    actions = [
        ("p16", 1, -2), ("p16", -3, 2),    # pair 0: both coded
        ("skip",), ("p16", 2, 1),          # pair 1: deferred top skip
        ("skip",), ("skip",),              # pair 2: whole pair skipped
        ("p16", 0, 4), ("skip",),          # pair 3: bottom skipped
        ("pcm",), ("pcm",),                # pair 4: PCM refresh
        ("p16", -1, -1), ("p16", 3, 0),    # pair 5
        ("skip",), ("skip",),              # pair 6 (inference from left)
        ("p16", 5, 2), ("p16", -4, 3),     # pair 7
    ]
    data = _headers() + mbaff_pcm_slice(
        ref, MB_W, no_field, frame_num=0, idr=True
    ) + mbaff_p_slice(
        cur, MB_W, actions, no_field, frame_num=1, poc_lsb=2
    )
    _decode_both(data)


def test_mbaff_p_with_field_pcm_pairs():
    """Field PCM pairs inside an inter MBAFF picture (placement + flag
    reading in P slices); inter pairs stay frame-coded."""
    ref = _planes(6)
    cur = _planes(7)
    flags = [False, False, True, False, True, False, False, False]
    actions = [
        ("p16", 2, -1), ("skip",),         # pair 0
        ("skip",), ("skip",),              # pair 1: inferred (left=frame)
        ("pcm",), ("pcm",),                # pair 2: FIELD PCM
        ("p16", 0, 0), ("p16", 1, 1),      # pair 3
        ("pcm",), ("pcm",),                # pair 4: FIELD PCM
        ("skip",), ("p16", -2, 2),         # pair 5: deferred top skip
        ("p16", 4, -3), ("skip",),         # pair 6
        ("pcm",), ("pcm",),                # pair 7: frame PCM in P slice
    ]
    data = _headers() + mbaff_pcm_slice(
        ref, MB_W, [False] * N_PAIRS, frame_num=0, idr=True
    ) + mbaff_p_slice(cur, MB_W, actions, flags, frame_num=1, poc_lsb=2)
    _decode_both(data)


def test_mbaff_field_pair_p_prediction():
    """Field pairs with predicted (non-PCM) P MBs decode bit-exactly:
    field ref lists (8.4.2.1), field-unit MV prediction (8.4.1.3.2) and
    field MC with parity-interleaved placement."""
    ref = _planes(8)
    cur = _planes(9)
    flags = [True] + [False] * (N_PAIRS - 1)
    actions = [("p16", 0, 0), ("p16", 0, 0)] + [("skip",)] * (2 * N_PAIRS - 2)
    data = _headers() + mbaff_pcm_slice(
        ref, MB_W, [False] * N_PAIRS, frame_num=0, idr=True
    ) + mbaff_p_slice(cur, MB_W, actions, flags, frame_num=1, poc_lsb=2)
    _decode_both(data)


@pytest.mark.parametrize("cabac", [False, True], ids=["cavlc", "cabac"])
def test_mbaff_x264_frame_pairs(cabac):
    """Real x264 MBAFF streams (interlaced=1): full residual/intra/inter
    machinery through the pair-ordered walk, with deblocking on. x264 codes
    this progressive content as all-frame pairs (its stderr reports
    'field mbs: 0.0%'); a field MB would raise, not mis-decode."""
    rng = np.random.default_rng(7)
    h, w = 96, 112
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(6):  # 2 GOPs; P frames carry I4x4/I8x8 refresh MBs
        y = np.clip(
            120 + 60 * np.sin(xx / 13.0 + i * 0.4) * np.cos(yy / 7.0)
            + rng.normal(0, 6, (h, w)),
            0, 255,
        ).astype(np.uint8)
        frames.append((
            y,
            np.full((h // 2, w // 2), 110, np.uint8),
            np.full((h // 2, w // 2), 135, np.uint8),
        ))
    bs = lavc.encode_x264(
        frames, qp=26, profile="high", cabac=cabac, bframes=0,
        preset="fast", gop=3, extra_x264="interlaced=1",
    )
    _decode_both(bs)


def _field_coded_frames(n=4, seed=3, h=96, w=112, mixed=False):
    """Content that drives x264 (interlaced=1) to field-code MB pairs:
    strong interfield motion (odd lines shifted per frame). mixed=True
    shifts only the right half so the left half stays frame-coded —
    exercising every frame/field crossing of the Table 6-4 mapper.
    Chroma varies by ROW as well: a field MB placed with consecutive
    instead of parity-interleaved rows must show (caught a real bug)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        if mixed:
            base = (128 + 60 * np.sin(xx / 11.0 + yy / 9.0 + i * 0.5)).astype(float)
            mask = xx >= w // 2
            shifted = np.roll(base, 6 + 2 * i, axis=1)
            base[1::2] = np.where(mask[1::2], shifted[1::2], base[1::2])
        else:
            base = (128 + 64 * np.sin(xx / 9.0 + (yy // 2) / 5.0 + i * 1.7)).astype(float)
            base[1::2] = np.roll(base[1::2], 7 + 3 * i, axis=1)
        y = np.clip(base + rng.normal(0, 5, (h, w)), 0, 255).astype(np.uint8)
        cyy, cxx = yy[::2, ::2], xx[::2, ::2]
        cb = np.clip(90 + 30 * np.sin(cxx / 7.0 + cyy / 5.0 + i), 0, 255).astype(np.uint8)
        cr = np.clip(150 - 25 * np.cos(cxx / 9.0 - cyy / 6.0 + i), 0, 255).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


@pytest.mark.parametrize("deblock", [False, True], ids=["nodb", "deblock"])
@pytest.mark.parametrize("cabac", [False, True], ids=["cavlc", "cabac"])
@pytest.mark.parametrize("mixed", [False, True], ids=["all-field", "mixed-pairs"])
def test_mbaff_x264_field_intra(mixed, cabac, deblock):
    """Field MB pairs from a real x264 interlaced encode, intra-only:
    field coefficient scans (Table 8-13/8-14), 6.4.10 neighbor mapping for
    nC / CABAC contexts / intra mode prediction / reference samples, and
    parity-interleaved sample placement — bit-exact vs libavcodec. The
    CABAC variant additionally pins the Table 9-40 field ctx offsets and
    the Table 9-43 field 8x8 significance map. x264's stderr reports
    'field mbs: intra: 100%' for the all-field content."""
    frames = _field_coded_frames(mixed=mixed)
    opt = "interlaced=1" + ("" if deblock else ":no-deblock=1")
    bs = lavc.encode_x264(
        frames, qp=24, profile="high", cabac=cabac, bframes=0,
        preset="fast", gop=1, extra_x264=opt,
    )
    _decode_both(bs)


@pytest.mark.parametrize("cabac", [False, True], ids=["cavlc", "cabac"])
@pytest.mark.parametrize("mixed", [False, True], ids=["all-field", "mixed-pairs"])
def test_mbaff_x264_field_p_inter(mixed, cabac):
    """P-slice MBAFF field inter from real x264 interlaced encodes:
    doubled field reference lists (7.4.5.1/8.4.2.1), frame<->field MV
    unit conversion in prediction (8.4.1.3.2), field MC with the 8.4.1.4
    cross-parity chroma shift, P_Skip over field pairs, and field-edge
    deblocking — bit-exact vs libavcodec."""
    frames = _field_coded_frames(n=6, mixed=mixed)
    bs = lavc.encode_x264(
        frames, qp=25, profile="high", cabac=cabac, bframes=0,
        preset="fast", gop=3, extra_x264="interlaced=1",
    )
    _decode_both(bs)


@pytest.mark.parametrize("cabac", [False, True], ids=["cavlc", "cabac"])
@pytest.mark.parametrize("mixed", [False, True], ids=["all-field", "mixed-pairs"])
def test_mbaff_x264_field_b_inter(mixed, cabac):
    """B-slice MBAFF field decoding from real x264 interlaced encodes:
    spatial direct with the 8.4.1.2.1 AFRM colocated crossings (field MB
    over frame colocated pair and vice versa), doubled field lists for
    both directions, implicit bi-prediction weights from FIELD order
    counts, the per-partition direct exclusion in the CABAC ref_idx
    context (9.3.3.1.1.6), and field-edge deblocking — bit-exact vs
    libavcodec."""
    frames = _field_coded_frames(n=7, mixed=mixed)
    bs = lavc.encode_x264(
        frames, qp=25, profile="high", cabac=cabac, bframes=2,
        preset="fast", gop=4, extra_x264="interlaced=1",
    )
    _decode_both(bs)


@pytest.mark.parametrize("spatial", [False, True],
                         ids=["temporal-direct", "spatial-direct"])
def test_mbaff_b_skip_field_direct(spatial):
    """B_Skip over FIELD pairs: a field-coded PCM pair seeds the 7.4.4
    inference so the following fully-skipped pairs decode as field B_Skip
    MBs — direct prediction (8.4.1.2) with field reference lists. The
    temporal variant pins the 8.4.1.2.3 field derivation (AFRM colocated
    crossing, field-list refIdx mapping, field POC distances) against
    libavcodec; the colocated P frame carries real MVs."""
    from tests.synth import mbaff_b_slice

    ref0 = _planes(4)
    colp = _planes(5)
    bpl = _planes(6)
    no_field = [False] * N_PAIRS
    # colocated P: frame pairs with nonzero MVs (Frm_To_Fld crossings for
    # the B picture's field MBs)
    p_actions = []
    mvs = [(4, -8), (-12, 4), (8, 8), (-4, -4)]
    for i in range(N_PAIRS * 2):
        mx, my = mvs[i % 4]
        p_actions.append(("p16", mx, my))
    # B picture: first pair field-coded PCM, everything else skipped (the
    # skipped pairs infer FIELD from the left/above pair chain)
    b_flags = [True] + [False] * (N_PAIRS - 1)
    b_actions = [("pcm",), ("pcm",)] + [("skip",)] * (N_PAIRS * 2 - 2)
    data = (
        _headers()
        + mbaff_pcm_slice(ref0, MB_W, [False] * N_PAIRS, frame_num=0,
                          idr=True, ref_idc=3)
        + mbaff_p_slice(colp, MB_W, p_actions, no_field, frame_num=1,
                        poc_lsb=4, ref_idc=3)
        + mbaff_b_slice(bpl, MB_W, b_actions, b_flags, frame_num=2,
                        poc_lsb=2, ref_idc=0, direct_spatial=spatial)
    )
    _decode_both(data)


def test_mbaff_b_skip_field_temporal_field_col():
    """Field B_Skip temporal direct with a FIELD-CODED colocated picture
    (One_To_One crossing): refIdxCol maps through (frame uid, field
    parity) into the current field list — pins col_ref_parity handling
    vs libavcodec."""
    from tests.synth import mbaff_b_slice

    ref0 = _planes(7)
    colp = _planes(8)
    bpl = _planes(9)
    all_field = [True] * N_PAIRS
    p_actions = []
    mvs = [(6, -10), (-14, 6), (10, 2), (-2, -6)]
    for i in range(N_PAIRS * 2):
        mx, my = mvs[i % 4]
        p_actions.append(("p16", mx, my))
    b_flags = [True] + [False] * (N_PAIRS - 1)
    b_actions = [("pcm",), ("pcm",)] + [("skip",)] * (N_PAIRS * 2 - 2)
    data = (
        _headers()
        + mbaff_pcm_slice(ref0, MB_W, [False] * N_PAIRS, frame_num=0,
                          idr=True, ref_idc=3)
        + mbaff_p_slice(colp, MB_W, p_actions, all_field, frame_num=1,
                        poc_lsb=4, ref_idc=3)
        + mbaff_b_slice(bpl, MB_W, b_actions, b_flags, frame_num=2,
                        poc_lsb=2, ref_idc=0, direct_spatial=False)
    )
    _decode_both(data)
