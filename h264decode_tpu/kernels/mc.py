"""Motion compensation on device (spec 8.4.2.2/8.4.2.3), TPU-native design.

Instead of the oracle's per-block windows, each reference picture gets three
half-pel planes precomputed once by separable 6-tap filters over the whole
(edge-padded) frame — pure shift-add convolutions that XLA fuses and
vectorizes. Per-pixel prediction is then a handful of gathers from the
{G, b, h, j} plane stack plus quarter-pel averaging selected by the MV
fraction, and a generalized weighted combine (default bi = weights 32/32,
logWD 5, exactly (p0+p1+1)>>1).

All arithmetic int32; bit-exact vs pipeline/inter.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PAD = 8  # flat-extension margin; any value >= 4 is exact (see oracle clamping)


def _filt6(a0, a1, a2, a3, a4, a5):
    return a0 - 5 * a1 + 20 * a2 + 20 * a3 - 5 * a4 + a5


def half_pel_planes(ref: jnp.ndarray) -> jnp.ndarray:
    """ref: [H, W] uint8 -> [4, H+2*PAD, W+2*PAD] uint8 stack (G, b, h, j).

    b = horizontal half-pel (right of G), h = vertical half-pel (below G),
    j = center half-pel. Computed over the edge-replicated canvas so any MV
    (after coordinate clamping into the padded range) is exact."""
    g = jnp.pad(ref.astype(jnp.int32), PAD, mode="edge")  # [H+2P, W+2P]
    ge = jnp.pad(g, ((2, 3), (2, 3)), mode="edge")  # margins for the 6-tap
    # b_raw at integer rows (incl. the vertical filter margins)
    b_raw = _filt6(
        ge[:, 0:-5], ge[:, 1:-4], ge[:, 2:-3], ge[:, 3:-2], ge[:, 4:-1], ge[:, 5:]
    )  # [H+2P+5, W+2P]
    b = jnp.clip((b_raw[2:-3] + 16) >> 5, 0, 255)
    h_raw = _filt6(
        ge[0:-5], ge[1:-4], ge[2:-3], ge[3:-2], ge[4:-1], ge[5:]
    )  # [H+2P, W+2P+5]
    h = jnp.clip((h_raw[:, 2:-3] + 16) >> 5, 0, 255)
    j_raw = _filt6(
        b_raw[0:-5], b_raw[1:-4], b_raw[2:-3], b_raw[3:-2], b_raw[4:-1], b_raw[5:]
    )  # [H+2P, W+2P]
    j = jnp.clip((j_raw + 512) >> 10, 0, 255)
    return jnp.stack([g, b, h, j]).astype(jnp.uint8)


def chroma_pad(ref: jnp.ndarray) -> jnp.ndarray:
    """[Hc, Wc] uint8 -> padded [Hc+2*PAD, Wc+2*PAD] uint8."""
    return jnp.pad(ref, PAD, mode="edge")


# Table 8-12 quarter-sample selection as 2 samples from the {G,b,h,j} stack:
# per frac class (fx + 4*fy): (plane1, dy1, dx1, plane2, dy2, dx2, single).
# The predicted sample is s1 when single, else (s1 + s2 + 1) >> 1.
_QPEL_TAB = np.array(
    [
        (0, 0, 0, 0, 0, 0, 1),  # G
        (0, 0, 0, 1, 0, 0, 0),  # avg(G, b)
        (1, 0, 0, 1, 0, 0, 1),  # b
        (1, 0, 0, 0, 0, 1, 0),  # avg(b, G[x+1])
        (0, 0, 0, 2, 0, 0, 0),  # avg(G, h)
        (1, 0, 0, 2, 0, 0, 0),  # avg(b, h)
        (1, 0, 0, 3, 0, 0, 0),  # avg(b, j)
        (1, 0, 0, 2, 0, 1, 0),  # avg(b, h[x+1])
        (2, 0, 0, 2, 0, 0, 1),  # h
        (2, 0, 0, 3, 0, 0, 0),  # avg(h, j)
        (3, 0, 0, 3, 0, 0, 1),  # j
        (2, 0, 1, 3, 0, 0, 0),  # avg(h[x+1], j)
        (2, 0, 0, 0, 1, 0, 0),  # avg(h, G[y+1])
        (2, 0, 0, 1, 1, 0, 0),  # avg(h, b[y+1])
        (1, 1, 0, 3, 0, 0, 0),  # avg(b[y+1], j)
        (2, 0, 1, 1, 1, 0, 0),  # avg(h[x+1], b[y+1])
    ],
    np.int32,
)


def luma_mc(
    planes: jnp.ndarray,  # [R, 4, H+2P, W+2P] uint8 half-pel stacks
    slot: jnp.ndarray,  # [H4, W4] int32 (valid where >= 0; clamped by caller)
    mv: jnp.ndarray,  # [H4, W4, 2] int32 quarter-pel
    H: int,
    W: int,
) -> jnp.ndarray:
    """Per-pixel luma prediction [H, W] int32 for one reference list.

    TPU cost model: exactly two flat 1-D gathers per pixel (the Table 8-12
    sample pair) with linear indices into the flattened plane stack. The
    Table 8-12 lookup runs at CELL resolution (the frac class is per-MV,
    16x fewer elements), and the index arithmetic is fenced off from the
    gathers with an optimization_barrier: letting XLA fuse the index
    computation into the gather loop scalarizes it (~40x slower at 1080p,
    measured — tools/perf_probe.py ablations)."""
    # reference geometry from the plane stack itself (may exceed the output
    # band in the row-sharded path, where refs are all-gathered)
    RH = planes.shape[-2] - 2 * PAD
    RW = planes.shape[-1] - 2 * PAD
    Hp, Wp = RH + 2 * PAD, RW + 2 * PAD
    flat = planes.reshape(-1)

    def px4(a):
        return jnp.repeat(jnp.repeat(a, 4, axis=0), 4, axis=1)

    # cell-resolution Table 8-12 entries and plane bases
    frac = (mv[..., 0] & 3) + 4 * (mv[..., 1] & 3)  # [H4, W4]
    t = jnp.asarray(_QPEL_TAB)[frac]  # [H4, W4, 7]
    base_c = jnp.maximum(slot, 0) * (4 * Hp * Wp)
    mvx, mvy = px4(mv[..., 0]), px4(mv[..., 1])
    yy, xx = jnp.mgrid[0:H, 0:W]
    # clamp into the padded canvas (flat margins make this exact)
    xi = jnp.clip(xx + (mvx >> 2), -PAD, RW - 1 + PAD) + PAD
    yi = jnp.clip(yy + (mvy >> 2), -PAD, RH - 1 + PAD) + PAD
    x1 = jnp.minimum(xi + px4(t[..., 2]), Wp - 1)
    y1 = jnp.minimum(yi + px4(t[..., 1]), Hp - 1)
    x2 = jnp.minimum(xi + px4(t[..., 5]), Wp - 1)
    y2 = jnp.minimum(yi + px4(t[..., 4]), Hp - 1)
    idx1 = px4(base_c + t[..., 0] * (Hp * Wp)) + y1 * Wp + x1
    idx2 = px4(base_c + t[..., 3] * (Hp * Wp)) + y2 * Wp + x2
    single = px4(t[..., 6])
    idx1, idx2, single = jax.lax.optimization_barrier((idx1, idx2, single))
    s1 = jnp.take(flat, idx1).astype(jnp.int32)
    s2 = jnp.take(flat, idx2).astype(jnp.int32)
    return jnp.where(single == 1, s1, (s1 + s2 + 1) >> 1)


def chroma_mc(
    refs: jnp.ndarray,  # [R, Hc+2P, Wc+2P] uint8 padded chroma planes
    slot: jnp.ndarray,  # [H4, W4] int32 (luma-cell granularity)
    mv: jnp.ndarray,  # [H4, W4, 2] int32 quarter-pel luma MV
    Hc: int,
    Wc: int,
) -> jnp.ndarray:
    """Per-pixel chroma prediction [Hc, Wc] int32 (1/8-pel bilinear)."""
    # each luma 4x4 cell covers a 2x2 chroma block
    RH = refs.shape[-2] - 2 * PAD
    RW = refs.shape[-1] - 2 * PAD
    mvp = jnp.repeat(jnp.repeat(mv, 2, axis=0), 2, axis=1)  # [Hc, Wc, 2]
    sl = jnp.repeat(jnp.repeat(jnp.maximum(slot, 0), 2, axis=0), 2, axis=1)
    yy, xx = jnp.mgrid[0:Hc, 0:Wc]
    xi = xx + (mvp[..., 0] >> 3)
    yi = yy + (mvp[..., 1] >> 3)
    fx = mvp[..., 0] & 7
    fy = mvp[..., 1] & 7
    xi = jnp.clip(xi, -PAD, RW - 1 + PAD) + PAD
    yi = jnp.clip(yi, -PAD, RH - 1 + PAD) + PAD
    xi1 = jnp.minimum(xi + 1, RW - 1 + 2 * PAD)
    yi1 = jnp.minimum(yi + 1, RH - 1 + 2 * PAD)
    # flat 1-D gathers (cheaper than N-d gathers on TPU; see luma_mc), with
    # the index math fenced off so XLA cannot scalarize it into the gather
    Hp, Wp = RH + 2 * PAD, RW + 2 * PAD
    flat = refs.reshape(-1)
    base = sl * (Hp * Wp)
    iA = base + yi * Wp + xi
    iB = base + yi * Wp + xi1
    iC = base + yi1 * Wp + xi
    iD = base + yi1 * Wp + xi1
    iA, iB, iC, iD = jax.lax.optimization_barrier((iA, iB, iC, iD))
    A = jnp.take(flat, iA).astype(jnp.int32)
    B = jnp.take(flat, iB).astype(jnp.int32)
    C = jnp.take(flat, iC).astype(jnp.int32)
    D = jnp.take(flat, iD).astype(jnp.int32)
    return (
        (8 - fx) * (8 - fy) * A + fx * (8 - fy) * B + (8 - fx) * fy * C + fx * fy * D + 32
    ) >> 6


def chroma_mc_pair(
    refs16: jnp.ndarray,  # [R, Hc+2P, Wc+2P] uint16: Cb | (Cr << 8)
    slot: jnp.ndarray,  # [H4, W4] int32 (luma-cell granularity)
    mv: jnp.ndarray,  # [H4, W4, 2] int32 quarter-pel luma MV
    Hc: int,
    Wc: int,
):
    """Both chroma components in ONE gather pass: Cb and Cr share every
    source coordinate, so gathering from the byte-interleaved uint16 plane
    halves the gather-index count (XLA TPU gathers cost ~8 ns per INDEX on
    the device trace; the chroma corners were 16 serial 4.2 ms fusions).
    Returns (pred_cb, pred_cr) int32 planes."""
    RH = refs16.shape[-2] - 2 * PAD
    RW = refs16.shape[-1] - 2 * PAD
    mvp = jnp.repeat(jnp.repeat(mv, 2, axis=0), 2, axis=1)
    sl = jnp.repeat(jnp.repeat(jnp.maximum(slot, 0), 2, axis=0), 2, axis=1)
    yy, xx = jnp.mgrid[0:Hc, 0:Wc]
    xi = jnp.clip(xx + (mvp[..., 0] >> 3), -PAD, RW - 1 + PAD) + PAD
    yi = jnp.clip(yy + (mvp[..., 1] >> 3), -PAD, RH - 1 + PAD) + PAD
    fx = mvp[..., 0] & 7
    fy = mvp[..., 1] & 7
    Hp, Wp = RH + 2 * PAD, RW + 2 * PAD
    xi1 = jnp.minimum(xi + 1, Wp - 1)
    yi1 = jnp.minimum(yi + 1, Hp - 1)
    flat = refs16.reshape(-1)
    base = sl * (Hp * Wp)
    iA = base + yi * Wp + xi
    iB = base + yi * Wp + xi1
    iC = base + yi1 * Wp + xi
    iD = base + yi1 * Wp + xi1
    iA, iB, iC, iD = jax.lax.optimization_barrier((iA, iB, iC, iD))
    A = jnp.take(flat, iA).astype(jnp.int32)
    B = jnp.take(flat, iB).astype(jnp.int32)
    C = jnp.take(flat, iC).astype(jnp.int32)
    D = jnp.take(flat, iD).astype(jnp.int32)

    def bil(a, b, c, d):
        return (
            (8 - fx) * (8 - fy) * a + fx * (8 - fy) * b
            + (8 - fx) * fy * c + fx * fy * d + 32
        ) >> 6

    return (
        bil(A & 255, B & 255, C & 255, D & 255),
        bil(A >> 8, B >> 8, C >> 8, D >> 8),
    )


def weighted_combine(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    use0: jnp.ndarray,  # bool per pixel
    use1: jnp.ndarray,
    w0: jnp.ndarray,
    o0: jnp.ndarray,
    w1: jnp.ndarray,
    o1: jnp.ndarray,
    log_wd: jnp.ndarray,
) -> jnp.ndarray:
    """Generalized spec 8.4.2.3 combine: bi uses (p0*w0 + p1*w1 + 2^lwd) >>
    (lwd+1) + (o0+o1+1)>>1; uni uses the one-sided formula. Host supplies
    neutral weights (uni: w=1,o=0,lwd=0; bi default: w=32,lwd=5) so unweighted
    prediction falls out exactly."""
    bi = use0 & use1
    uni = (
        jnp.where(
            log_wd >= 1,
            ((jnp.where(use0, p0, p1) * jnp.where(use0, w0, w1)
              + (1 << jnp.maximum(log_wd - 1, 0))) >> log_wd),
            jnp.where(use0, p0, p1) * jnp.where(use0, w0, w1),
        )
        + jnp.where(use0, o0, o1)
    )
    bi_val = ((p0 * w0 + p1 * w1 + (1 << log_wd)) >> (log_wd + 1)) + (
        (o0 + o1 + 1) >> 1
    )
    return jnp.clip(jnp.where(bi, bi_val, uni), 0, 255)
