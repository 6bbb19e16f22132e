"""Packed-word MC gather kernels vs the per-pixel spec formulation.

The device MC (kernels/mc.py) gathers pair-packed words (2 consecutive
reference columns per index) from the pre-packed DPB ring; exactness at the
picture edges relies on the flat PAD margins. These tests check the packed
kernels bit-exactly against a straight numpy transcription of the per-pixel
8.4.2.2 sampling (clamped per-pixel coordinates), over random AND
edge-targeted MVs that hit every saturation case (ref: the oracle
pipeline/inter.py; spec Table 8-12 / 8.4.2.2.2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from h264decode_tpu.kernels import mc as mc_k
from h264decode_tpu.kernels.mc import PAD, _QPEL_TAB

RH = RW = H = W = 48
R = 2
Hp, Wp = RH + 2 * PAD, RW + 2 * PAD
H4, W4 = H // 4, W // 4


@pytest.fixture(scope="module")
def stacks():
    rng = np.random.default_rng(1)
    refs = rng.integers(0, 256, (R, RH, RW), dtype=np.uint8)
    planes = np.stack([np.asarray(jax.jit(mc_k.half_pel_planes)(r)) for r in refs])
    packed = np.asarray(jax.jit(mc_k.pack_pair8)(jnp.asarray(planes)))
    return rng, planes, packed


def _ref_luma(planes, slot, mv):
    flat = planes.reshape(-1)

    def px4(a):
        return np.repeat(np.repeat(a, 4, 0), 4, 1)

    frac = (mv[..., 0] & 3) + 4 * (mv[..., 1] & 3)
    t = _QPEL_TAB[frac]
    base_c = np.maximum(slot, 0) * (4 * Hp * Wp)
    mvx, mvy = px4(mv[..., 0]), px4(mv[..., 1])
    yy, xx = np.mgrid[0:H, 0:W]
    xi = np.clip(xx + (mvx >> 2), -PAD, RW - 1 + PAD) + PAD
    yi = np.clip(yy + (mvy >> 2), -PAD, RH - 1 + PAD) + PAD
    x1 = np.minimum(xi + px4(t[..., 2]), Wp - 1)
    y1 = np.minimum(yi + px4(t[..., 1]), Hp - 1)
    x2 = np.minimum(xi + px4(t[..., 5]), Wp - 1)
    y2 = np.minimum(yi + px4(t[..., 4]), Hp - 1)
    idx1 = px4(base_c + t[..., 0] * (Hp * Wp)) + y1 * Wp + x1
    idx2 = px4(base_c + t[..., 3] * (Hp * Wp)) + y2 * Wp + x2
    single = px4(t[..., 6])
    s1 = flat[idx1].astype(np.int64)
    s2 = flat[idx2].astype(np.int64)
    return np.where(single == 1, s1, (s1 + s2 + 1) >> 1)


def test_luma_pair_packed_exact(stacks):
    rng, planes, packed = stacks
    slot = rng.integers(-1, R, (H4, W4)).astype(np.int32)
    jl = jax.jit(lambda p, s, m: mc_k.luma_mc(p, s, m, H, W))
    edge = [-4 * RW - 40, -33, -32, -31, -5, -4, -3, -2, -1, 0, 1, 2, 3,
            4 * (RW - 1) - 1, 4 * (RW - 1), 4 * RW + 29, 4 * RW + 200]
    for trial in range(6):
        if trial >= 2:
            mv = np.stack(
                [rng.choice(edge, (H4, W4)), rng.choice(edge, (H4, W4))], -1
            ).astype(np.int32) + rng.integers(0, 4, (H4, W4, 2)).astype(np.int32)
        else:
            mv = rng.integers(-4 * (RW + 30), 4 * (RW + 30), (H4, W4, 2)).astype(np.int32)
        want = _ref_luma(planes, slot, mv)
        got = np.asarray(jl(packed, slot, mv))
        assert np.array_equal(want, got), f"trial {trial}"


def test_chroma_pair_packed_exact(stacks):
    rng, _, _ = stacks
    RHc, RWc, Hc, Wc = RH // 2, RW // 2, H // 2, W // 2
    Hpc, Wpc = RHc + 2 * PAD, RWc + 2 * PAD
    cb = rng.integers(0, 256, (R, RHc, RWc), dtype=np.uint8)
    cr = rng.integers(0, 256, (R, RHc, RWc), dtype=np.uint8)
    cbp = np.stack([np.asarray(jax.jit(mc_k.chroma_pad)(r)) for r in cb])
    crp = np.stack([np.asarray(jax.jit(mc_k.chroma_pad)(r)) for r in cr])
    refs16 = cbp.astype(np.uint16) | (crp.astype(np.uint16) << 8)
    cpacked = np.asarray(jax.jit(mc_k.pack_pair16)(jnp.asarray(refs16)))
    slot = rng.integers(-1, R, (H4, W4)).astype(np.int32)

    def ref_chroma(slot, mv):
        flat = refs16.reshape(-1).astype(np.int64)
        mvp = np.repeat(np.repeat(mv, 2, 0), 2, 1)
        sl = np.repeat(np.repeat(np.maximum(slot, 0), 2, 0), 2, 1)
        yy, xx = np.mgrid[0:Hc, 0:Wc]
        xi = np.clip(xx + (mvp[..., 0] >> 3), -PAD, RWc - 1 + PAD) + PAD
        yi = np.clip(yy + (mvp[..., 1] >> 3), -PAD, RHc - 1 + PAD) + PAD
        fx = mvp[..., 0] & 7
        fy = mvp[..., 1] & 7
        xi1 = np.minimum(xi + 1, Wpc - 1)
        yi1 = np.minimum(yi + 1, Hpc - 1)
        base = sl * (Hpc * Wpc)
        A = flat[base + yi * Wpc + xi]
        B = flat[base + yi * Wpc + xi1]
        C = flat[base + yi1 * Wpc + xi]
        D = flat[base + yi1 * Wpc + xi1]

        def bil(a, b, c, d):
            return ((8 - fx) * (8 - fy) * a + fx * (8 - fy) * b
                    + (8 - fx) * fy * c + fx * fy * d + 32) >> 6

        return bil(A & 255, B & 255, C & 255, D & 255), bil(A >> 8, B >> 8, C >> 8, D >> 8)

    jc = jax.jit(lambda p, s, m: mc_k.chroma_mc_pair(p, s, m, Hc, Wc))
    edge = [-8 * RWc - 70, -65, -64, -63, -9, -8, -7, -1, 0, 1, 7, 8,
            8 * (RWc - 1), 8 * RWc + 63, 8 * RWc + 300]
    for trial in range(4):
        if trial >= 2:
            mvc = np.stack(
                [rng.choice(edge, (H4, W4)), rng.choice(edge, (H4, W4))], -1
            ).astype(np.int32) + rng.integers(0, 8, (H4, W4, 2)).astype(np.int32)
        else:
            mvc = rng.integers(-8 * (RWc + 30), 8 * (RWc + 30), (H4, W4, 2)).astype(np.int32)
        w1, w2 = ref_chroma(slot, mvc)
        g1, g2 = jc(cpacked, slot, mvc)
        assert np.array_equal(w1, np.asarray(g1)), f"cb trial {trial}"
        assert np.array_equal(w2, np.asarray(g2)), f"cr trial {trial}"
