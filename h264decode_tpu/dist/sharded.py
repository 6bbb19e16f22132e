"""Multi-chip sharded reconstruction step (shard_map over a ("gop", "row")
mesh).

Parallel decomposition (SURVEY.md section 2.a):
- "gop": independent GOPs/streams — embarrassingly parallel; each gop slot
  decodes its own frame batch (data parallelism, DCN-friendly across hosts).
- "row": macroblock tile-row bands within a frame. Transforms and MC are
  exactly row-parallel; reference pictures are exchanged with an
  all_gather over the row axis (the DPB collective, riding ICI). The intra
  wavefront and deblocking run band-locally, which is bit-exact whenever
  encoder slices are aligned to bands with slice-boundary filtering
  disabled (disable_deblocking_filter_idc == 2) — the standard production
  configuration for parallel H.264 decode; tile-boundary halo exchange via
  ppermute is the planned refinement for unaligned streams.

All shapes are static per stream geometry; the step jits once and reruns
per frame batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..kernels import mc as mc_k
from ..kernels import transform as tr_k
from ..kernels.deblock import deblock_frame_tpu
from ..kernels.deblock_prep_dev import expand_slot_mv
from ..kernels.intra import intra_wavefront


def _band_recon(inp, mb_hl: int, mb_w: int, apply_deblock: bool, qp_offsets=(0, 0)):
    """Reconstruct one row band (local geometry mb_hl x mb_w MBs).
    Mirrors pipeline/tpu_pipeline.frame_fn on band-local tensors; `inp`
    holds band-local per-MB/cell arrays plus FULL reference plane stacks."""
    H, W = mb_hl * 16, mb_w * 16
    Hc, Wc = mb_hl * 8, mb_w * 8
    ry = tr_k.luma_residual_plane(
        inp["luma_ac"], inp["luma_dc"], inp["luma8_ac"], inp["qp"],
        inp["is_i16"], inp["is_t8"], inp["is_intra"],
        inp["ls4_y"], inp["ls8_y"], mb_hl, mb_w,
    )
    rcb, rcr = tr_k.chroma_residual_planes(
        inp["chroma_dc"], inp["chroma_ac"], inp["qp"], inp["is_intra"],
        inp["ls4_c"], qp_offsets, mb_hl, mb_w,
    )
    # MC: band-local MVs gather from the full (all-gathered) reference stack;
    # row offset maps band coordinates into frame coordinates via the MV.
    slot, mv = expand_slot_mv(
        inp["slot_parts"], inp["mv_parts"], inp["is_intra"], mb_hl, mb_w
    )
    row0 = inp["band_row0"]  # scalar int32: first luma row of this band
    mv0 = mv[0].at[..., 1].add(4 * row0)  # quarter-pel vertical shift
    mv1 = mv[1].at[..., 1].add(4 * row0)
    p0y = mc_k.luma_mc(inp["ref_luma"], slot[0], mv0, H, W)
    p1y = mc_k.luma_mc(inp["ref_luma"], slot[1], mv1, H, W)
    use0 = jnp.repeat(jnp.repeat(slot[0] >= 0, 4, 0), 4, 1)
    use1 = jnp.repeat(jnp.repeat(slot[1] >= 0, 4, 0), 4, 1)
    pred_y = jnp.where(use0 & use1, (p0y + p1y + 1) >> 1, jnp.where(use0, p0y, p1y))
    inter_y = jnp.clip(pred_y + ry, 0, 255)
    mv0c = mv[0].at[..., 1].add(8 * (row0 // 2))
    mv1c = mv[1].at[..., 1].add(8 * (row0 // 2))
    use0c = jnp.repeat(jnp.repeat(slot[0] >= 0, 2, 0), 2, 1)
    use1c = jnp.repeat(jnp.repeat(slot[1] >= 0, 2, 0), 2, 1)
    planes_c = []
    for refs, rc in ((inp["ref_cb"], rcb), (inp["ref_cr"], rcr)):
        p0 = mc_k.chroma_mc(refs, slot[0], mv0c, Hc, Wc)
        p1 = mc_k.chroma_mc(refs, slot[1], mv1c, Hc, Wc)
        pred = jnp.where(use0c & use1c, (p0 + p1 + 1) >> 1, jnp.where(use0c, p0, p1))
        planes_c.append(jnp.clip(pred + rc, 0, 255))
    inter_mb = (~inp["is_intra"]).reshape(mb_hl, mb_w)
    base_y = jnp.where(
        jnp.repeat(jnp.repeat(inter_mb, 16, 0), 16, 1), inter_y, 0
    )
    base_cb = jnp.where(jnp.repeat(jnp.repeat(inter_mb, 8, 0), 8, 1), planes_c[0], 0)
    base_cr = jnp.where(jnp.repeat(jnp.repeat(inter_mb, 8, 0), 8, 1), planes_c[1], 0)
    y, cb, cr = intra_wavefront(
        base_y, base_cb, base_cr, ry, rcb, rcr,
        inp["kind"], inp["modes4"], inp["i16mode"], inp["cmode"],
        inp["avl"], inp["avt"], inp["avtr"], inp["avtl"],
        mb_hl, mb_w,
    )
    y = y.astype(jnp.uint8)
    cb = cb.astype(jnp.uint8)
    cr = cr.astype(jnp.uint8)
    if apply_deblock:
        prep = {k[3:]: v for k, v in inp.items() if k.startswith("db_")}
        y, cb, cr = deblock_frame_tpu(y, cb, cr, prep, mb_hl, mb_w)
    return y, cb, cr


def make_sharded_step(mesh: Mesh, mb_h: int, mb_w: int, n_refs: int,
                      apply_deblock: bool = True, qp_offsets=(0, 0)):
    """Build the jitted multi-chip decode step.

    Global input shapes (G = gop-axis size, leading axis):
      per-MB arrays      [G, nMB, ...]        sharded P("gop", "row")
      per-cell grids     [G, (2,) H4, W4,...] row axis sharded
      reference planes   [G, R, H, W] (x3)    sharded P("gop", None, "row")
      scaling tables     replicated
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
        "ls4_y": P(), "ls8_y": P(), "ls4_c": P(),
        "slot_parts": mb_spec,
        "mv_parts": mb_spec,
        "ref_luma_raw": P("gop", None, "row"),
        "ref_cb_raw": P("gop", None, "row"),
        "ref_cr_raw": P("gop", None, "row"),
    }
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
        # local gop slice has leading dim 1; squeeze it (the replicated
        # scaling tables carry no gop axis)
        replicated = ("ls4_y", "ls8_y", "ls4_c")
        loc = {k: (v if k in replicated else v[0]) for k, v in inp.items()}
        # ---- DPB exchange: reassemble full reference frames over "row" (ICI)
        ref_y = jax.lax.all_gather(loc["ref_luma_raw"], "row", axis=1, tiled=True)
        ref_cb = jax.lax.all_gather(loc["ref_cb_raw"], "row", axis=1, tiled=True)
        ref_cr = jax.lax.all_gather(loc["ref_cr_raw"], "row", axis=1, tiled=True)
        # half-pel planes for the gathered refs
        hp = jax.vmap(mc_k.half_pel_planes)(ref_y)
        cbs = jax.vmap(mc_k.chroma_pad)(ref_cb)
        crs = jax.vmap(mc_k.chroma_pad)(ref_cr)
        row_idx = jax.lax.axis_index("row")
        band = dict(loc)
        band["ref_luma"] = hp
        band["ref_cb"] = cbs
        band["ref_cr"] = crs
        band["band_row0"] = row_idx.astype(jnp.int32) * (mb_hl * 16)
        y, cb, cr = _band_recon(band, mb_hl, mb_w, apply_deblock, qp_offsets)
        return y[None], cb[None], cr[None]

    return jax.jit(step)
