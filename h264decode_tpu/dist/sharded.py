"""Multi-chip sharded reconstruction step (shard_map over a ("gop", "row")
mesh).

Parallel decomposition (SURVEY.md section 2.a):
- "gop": independent GOPs/streams — embarrassingly parallel; each gop slot
  decodes its own frame batch (data parallelism, DCN-friendly across hosts).
- "row": macroblock tile-row bands within a frame. Residual transforms,
  (weighted) motion compensation and PCM placement are exactly row-parallel
  for ANY stream; reference pictures are exchanged with an all_gather over
  the row axis (the DPB collective, riding ICI).

Two intra/deblock modes, chosen per stream:

aligned (halo=False)
    Band-local intra wavefront + deblocking, fully parallel. Exact when
    encoder slices align to the row bands (one slice per band) so no intra
    prediction or filtering crosses a band boundary — the standard
    production configuration for parallel H.264.

halo (halo=True)
    Exact for ANY stream, including single-slice encodes. The inherently
    sequential cross-band dependencies (intra MB row 0 predicts from the
    band above's unfiltered bottom row; deblocking's top MB-row edges read
    and modify the band above's filtered bottom rows) run as an n_row-step
    band pipeline with `jax.lax.ppermute` halo exchanges over ICI:
    each step activates one band — masked `kind`/`bs` grids collapse the
    inactive shards' wavefront loops to zero iterations — then sends the
    band's pre-deblock bottom pixel row down (intra neighbors), its
    filtered bottom 4 rows down (deblock halo), and receives the
    boundary-modified rows back up. The MXU-heavy stages stay parallel;
    only the spec-serial boundary chain serializes, which is the hardware
    floor for H.264's raster dependencies.

All shapes are static per stream geometry; the step jits once and reruns
per frame batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..kernels import mc as mc_k
from ..kernels.deblock import LPAD, deblock_frame_tpu
from ..kernels.intra import intra_wavefront
from ..pipeline.tpu_pipeline import _base_planes


def _band_pixels(loc, prep, mb_hl: int, mb_w: int, n_row: int,
                 apply_deblock: bool, halo: bool, qp_offsets,
                 has_l8: bool, has_pcm: bool):
    """Band-local pixel path: shared _base_planes (residuals + weighted MC +
    PCM, identical program to the single-chip pipeline/tpu_pipeline.py),
    then intra + deblock either band-locally (aligned) or as the sequential
    halo pipeline across the "row" axis."""
    W, Wc = mb_w * 16, mb_w * 8
    row_idx = jax.lax.axis_index("row")
    row0 = row_idx.astype(jnp.int32) * (mb_hl * 16)
    band = dict(loc)
    band["qp_offsets"] = qp_offsets
    # band-local MVs gather from the full (all-gathered) reference stack:
    # shift the vertical component by the band origin (quarter-pel luma;
    # chroma MC interprets the same value as 1/8-pel, so one shift is exact
    # for both planes)
    band["mv_parts"] = loc["mv_parts"].astype(jnp.int32).at[..., 1].add(4 * row0)
    base_y, base_cb, base_cr, ry, rcb, rcr = _base_planes(
        band, mb_hl, mb_w, has_l8, has_pcm
    )
    kind = loc["kind"].astype(jnp.int32)
    modes4 = loc["modes4"].astype(jnp.int32)
    i16m = loc["i16mode"].astype(jnp.int32)
    cmode = loc["cmode"].astype(jnp.int32)
    avail = (loc["avl"], loc["avt"], loc["avtr"], loc["avtl"])

    if not halo:
        y, cb, cr = intra_wavefront(
            base_y, base_cb, base_cr, ry, rcb, rcr,
            kind, modes4, i16m, cmode, *avail, mb_hl, mb_w,
        )
        y, cb, cr = (a.astype(jnp.uint8) for a in (y, cb, cr))
        if apply_deblock:
            y, cb, cr = deblock_frame_tpu(y, cb, cr, prep, mb_hl, mb_w)
        return y, cb, cr

    down = [(j, j + 1) for j in range(n_row - 1)]
    up = [(j, j - 1) for j in range(1, n_row)]
    y, cb, cr = base_y, base_cb, base_cr  # int32 carries through the pipeline
    ih = (
        jnp.zeros((W,), jnp.int32),
        jnp.zeros((Wc,), jnp.int32),
        jnp.zeros((Wc,), jnp.int32),
    )
    dh = (
        jnp.zeros((LPAD, W), jnp.uint8),
        jnp.zeros((LPAD, Wc), jnp.uint8),
        jnp.zeros((LPAD, Wc), jnp.uint8),
    )
    for i in range(n_row):
        active = row_idx == i
        # inactive shards: all-zero kind collapses the wavefront to 0 steps
        kind_m = jnp.where(active, kind, 0)
        y2, cb2, cr2 = intra_wavefront(
            y, cb, cr, ry, rcb, rcr,
            kind_m, modes4, i16m, cmode, *avail, mb_hl, mb_w, top=ih,
        )
        y = jnp.where(active, y2, y)
        cb = jnp.where(active, cb2, cb)
        cr = jnp.where(active, cr2, cr)
        # intra predicts from UNFILTERED neighbors (spec 8.3.1): capture the
        # pre-deblock bottom row now, before deblocking overwrites it
        ih_send = (y[-1], cb[-1], cr[-1])
        if apply_deblock:
            prep_m = dict(prep)
            prep_m["bs_v"] = jnp.where(active, prep["bs_v"], 0)
            prep_m["bs_h"] = jnp.where(active, prep["bs_h"], 0)
            (y3, cb3, cr3), (uy, ucb, ucr) = deblock_frame_tpu(
                y, cb, cr, prep_m, mb_hl, mb_w, halo=dh
            )
            y = jnp.where(active, y3.astype(jnp.int32), y)
            cb = jnp.where(active, cb3.astype(jnp.int32), cb)
            cr = jnp.where(active, cr3.astype(jnp.int32), cr)
            if i > 0:
                # the boundary edge modified up to 3 luma / 1 chroma rows of
                # the band above: send them back up and paste
                uy = jax.lax.ppermute(uy, "row", up)
                ucb = jax.lax.ppermute(ucb, "row", up)
                ucr = jax.lax.ppermute(ucr, "row", up)
                paste = row_idx == (i - 1)
                y = jnp.where(paste, y.at[-3:].set(uy[1:].astype(jnp.int32)), y)
                cb = jnp.where(
                    paste, cb.at[-1:].set(ucb[-1:].astype(jnp.int32)), cb
                )
                cr = jnp.where(
                    paste, cr.at[-1:].set(ucr[-1:].astype(jnp.int32)), cr
                )
        if i < n_row - 1:
            ih = tuple(jax.lax.ppermute(t, "row", down) for t in ih_send)
            if apply_deblock:
                dh = tuple(
                    jax.lax.ppermute(t[-LPAD:].astype(jnp.uint8), "row", down)
                    for t in (y, cb, cr)
                )
    return (
        jnp.clip(y, 0, 255).astype(jnp.uint8),
        jnp.clip(cb, 0, 255).astype(jnp.uint8),
        jnp.clip(cr, 0, 255).astype(jnp.uint8),
    )


# per-(SPS,PPS) scaling tables: identical on every shard of every gop
_REPLICATED = ("ls4_y", "ls8_y", "ls4_c")

# per-slice weighted-prediction tables: per-gop (each gop slot decodes its
# own frames), replicated over "row"
_WEIGHT_KEYS = (
    "w_tab", "o_tab", "wc_tab", "oc_tab", "lwd_tab",
    "pw0", "pw1", "pwc0", "pwc1",
)


def make_sharded_step(mesh: Mesh, mb_h: int, mb_w: int, n_refs: int,
                      apply_deblock: bool = True, qp_offsets=(0, 0),
                      halo: bool = False, has_l8: bool = True,
                      has_pcm: bool = False):
    """Build the jitted multi-chip decode step.

    Global input shapes (G = gop-axis size, leading axis):
      per-MB arrays      [G, nMB, ...]        sharded P("gop", "row")
      per-cell grids     [G, (2,) H4, W4,...] row axis sharded
      PCM pixel planes   [G, H, W] (x3)       row axis sharded (has_pcm)
      reference planes   [G, R, H, W] (x3)    sharded P("gop", None, "row")
      scaling + weight tables                 replicated
    Output: (y, cb, cr) planes [G, H, W] / [G, Hc, Wc], row-sharded.
    """
    n_row = mesh.shape["row"]
    assert mb_h % n_row == 0, "mb_h must divide by row shards"
    mb_hl = mb_h // n_row

    mb_spec = P("gop", "row")
    specs = {
        "luma_ac": mb_spec, "luma_dc": mb_spec, "luma8_ac": mb_spec,
        "chroma_dc": mb_spec, "chroma_ac": mb_spec,
        "qp": mb_spec, "is_i16": mb_spec, "is_t8": mb_spec, "is_intra": mb_spec,
        "kind": mb_spec, "modes4": mb_spec, "i16mode": mb_spec, "cmode": mb_spec,
        "avl": mb_spec, "avt": mb_spec, "avtr": mb_spec, "avtl": mb_spec,
        "slice_mb": mb_spec, "ridx_parts": mb_spec,
        "slot_parts": mb_spec,
        "mv_parts": mb_spec,
        "ref_luma_raw": P("gop", None, "row"),
        "ref_cb_raw": P("gop", None, "row"),
        "ref_cr_raw": P("gop", None, "row"),
    }
    for k in _REPLICATED:
        specs[k] = P()
    for k in _WEIGHT_KEYS:
        specs[k] = P("gop")
    if has_pcm:
        specs.update({"pcm_y": mb_spec, "pcm_cb": mb_spec, "pcm_cr": mb_spec})
    if apply_deblock:
        specs.update({
            "db_bs_v": mb_spec, "db_bs_h": mb_spec,
            "db_ia_v": mb_spec, "db_ib_v": mb_spec,
            "db_ia_h": mb_spec, "db_ib_h": mb_spec,
            "db_ca_v": P("gop", None, "row"), "db_cb_v": P("gop", None, "row"),
            "db_ca_h": P("gop", None, "row"), "db_cb_h": P("gop", None, "row"),
        })
    out_spec = (P("gop", "row"), P("gop", "row"), P("gop", "row"))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=out_spec,
        check_rep=False,
    )
    def step(inp):
        # local gop slice has leading dim 1; squeeze it (replicated tables
        # carry no gop axis)
        loc = {k: (v if k in _REPLICATED else v[0]) for k, v in inp.items()}
        # ---- DPB exchange: reassemble full reference frames over "row" (ICI)
        ref_y = jax.lax.all_gather(loc["ref_luma_raw"], "row", axis=1, tiled=True)
        ref_cb = jax.lax.all_gather(loc["ref_cb_raw"], "row", axis=1, tiled=True)
        ref_cr = jax.lax.all_gather(loc["ref_cr_raw"], "row", axis=1, tiled=True)
        # half-pel planes for the gathered refs, in the pair-packed MC
        # layouts the gather kernels consume (kernels/mc.py)
        loc["ref_luma"] = jax.vmap(
            lambda r: mc_k.pack_pair8(mc_k.half_pel_planes(r))
        )(ref_y)

        def _pack_c(cb, cr):
            c16 = mc_k.chroma_pad(cb).astype(jnp.uint16) | (
                mc_k.chroma_pad(cr).astype(jnp.uint16) << 8
            )
            return mc_k.pack_pair16(c16)

        loc["ref_cb"] = jax.vmap(_pack_c)(ref_cb, ref_cr)
        loc.pop("ref_cr_raw", None)
        prep = {k[3:]: v for k, v in loc.items() if k.startswith("db_")}
        y, cb, cr = _band_pixels(
            loc, prep, mb_hl, mb_w, n_row, apply_deblock, halo,
            qp_offsets, has_l8, has_pcm,
        )
        return y[None], cb[None], cr[None]

    return jax.jit(step)
