"""Sharded stream decoding: drive the shard_map row-band pipeline with real
FrameTensors from the entropy stage.

Exactness contract (see dist/sharded.py): transforms and MC are exactly
row-parallel for any stream; the band-local intra wavefront and deblocking
require encoder slices aligned to the row bands (one slice per band) with
either deblocking disabled or slice-boundary filtering off — the standard
parallel decode configuration. `ShardedDecoder` asserts the alignment.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..kernels.intra import K_I4, K_I8, K_I16
from ..pipeline.decoder import Decoder
from ..pipeline.tpu_pipeline import _mb_avail_grids
from ..kernels import transform as tr_k
from ..tensors.frame_tensors import MB_I_16X16, MB_I_NXN
from .sharded import make_sharded_step


class ShardedDecoder(Decoder):
    """Decodes one stream with the pixel pipeline sharded over a
    ("gop"=1, "row"=n) mesh. Requires slice-per-band streams; deblocking is
    applied only when slice-boundary filtering permits band locality."""

    def __init__(self, mesh, apply_deblock: bool = False):
        super().__init__(apply_deblock=apply_deblock)
        self.mesh = mesh
        self.n_row = mesh.shape["row"]
        self._step = None
        self._step_geom = None

    def _reconstruct(self, ft, sps, pps, slices, ref_lists, weight_ctx, poc):
        mb_h, mb_w = ft.mb_h, ft.mb_w
        assert mb_h % self.n_row == 0, "frame rows must divide by row shards"
        band_mbs = (mb_h // self.n_row) * mb_w
        for sid, (hdr, *_rest) in enumerate(slices):
            assert hdr.first_mb_in_slice % band_mbs == 0, (
                "encoder slices must align to row bands "
                f"(slice {sid} starts at MB {hdr.first_mb_in_slice})"
            )
        n_refs = max(1, sps.max_num_ref_frames + 1)
        qp_offs = (pps.chroma_qp_index_offset, pps.second_chroma_qp_index_offset)
        if self._step is None or self._step_geom != (mb_h, mb_w, n_refs, qp_offs):
            self._step = make_sharded_step(
                self.mesh, mb_h, mb_w, n_refs,
                apply_deblock=self.apply_deblock, qp_offsets=qp_offs,
            )
            self._step_geom = (mb_h, mb_w, n_refs, qp_offs)

        # reference stacks (raw planes; half-pel computed in-shard)
        uid_to_pic = {}
        for l0, l1 in ref_lists:
            for p in l0 + l1:
                uid_to_pic.setdefault(p.uid, p)
        pics = list(uid_to_pic.values())[:n_refs]
        uid_slot = {p.uid: i for i, p in enumerate(pics)}
        H, W = mb_h * 16, mb_w * 16
        ref_y = np.zeros((n_refs, H, W), np.uint8)
        ref_cb = np.zeros((n_refs, H // 2, W // 2), np.uint8)
        ref_cr = np.zeros((n_refs, H // 2, W // 2), np.uint8)
        for p, i in ((p, uid_slot[p.uid]) for p in pics):
            ref_y[i] = np.asarray(p.y)
            ref_cb[i] = np.asarray(p.cb)
            ref_cr[i] = np.asarray(p.cr)

        slot_lut = np.full(self.uid_counter + 2, -1, np.int32)
        for uid, sidx in uid_slot.items():
            slot_lut[uid] = sidx
        rp = ft.ref_pic  # [n, 2, 4] picture uids
        slot_parts = np.where(
            rp >= 0, slot_lut[np.clip(rp, 0, len(slot_lut) - 1)], -1
        ).astype(np.int8)

        kind = np.zeros(ft.n_mbs, np.int32)
        kind[(ft.mb_class == MB_I_NXN) & ~ft.transform_8x8] = K_I4
        kind[(ft.mb_class == MB_I_NXN) & ft.transform_8x8] = K_I8
        kind[ft.mb_class == MB_I_16X16] = K_I16
        avl, avt, avtr, avtl = _mb_avail_grids(ft, pps)

        s4 = pps.effective_scaling_4x4(sps)
        s8 = pps.effective_scaling_8x8(sps)
        ls4_y = np.stack(
            [tr_k.level_scale_tables_4x4(s4[0]), tr_k.level_scale_tables_4x4(s4[3])]
        )
        ls8_y = np.stack(
            [tr_k.level_scale_tables_8x8(s8[0]), tr_k.level_scale_tables_8x8(s8[1])]
        )
        ls4_c = np.stack(
            [
                np.stack([tr_k.level_scale_tables_4x4(s4[1]), tr_k.level_scale_tables_4x4(s4[2])]),
                np.stack([tr_k.level_scale_tables_4x4(s4[4]), tr_k.level_scale_tables_4x4(s4[5])]),
            ]
        )
        l8 = ft.luma8_ac if ft.luma8_ac is not None else np.zeros((ft.n_mbs, 4, 64), np.int16)

        def g(a, dtype=None):
            a = np.asarray(a)
            if dtype is not None:
                a = a.astype(dtype)
            return jnp.asarray(a[None])  # add the gop axis (G=1)

        inp = {
            "luma_ac": g(ft.luma_ac, np.int32),
            "luma_dc": g(ft.luma_dc, np.int32),
            "luma8_ac": g(l8, np.int32),
            "chroma_dc": g(ft.chroma_dc, np.int32),
            "chroma_ac": g(ft.chroma_ac, np.int32),
            "qp": g(ft.qp, np.int32),
            "is_i16": g(ft.mb_class == MB_I_16X16),
            "is_t8": g(ft.transform_8x8),
            "is_intra": g(ft.mb_class < 3),
            "kind": g(kind),
            "modes4": g(ft.intra4x4_modes, np.int32),
            "i16mode": g(ft.intra16_mode, np.int32),
            "cmode": g(ft.chroma_mode, np.int32),
            "avl": g(avl.reshape(-1)),
            "avt": g(avt.reshape(-1)),
            "avtr": g(avtr.reshape(-1)),
            "avtl": g(avtl.reshape(-1)),
            "slot_parts": g(slot_parts),
            "mv_parts": g(ft.mv),
            "ref_luma_raw": g(ref_y),
            "ref_cb_raw": g(ref_cb),
            "ref_cr_raw": g(ref_cr),
            "ls4_y": jnp.asarray(ls4_y),
            "ls8_y": jnp.asarray(ls8_y),
            "ls4_c": jnp.asarray(ls4_c),
        }
        if self.apply_deblock:
            from ..pipeline.deblock_prep import prepare_deblock

            for k, v in prepare_deblock(ft, sps, pps).items():
                inp["db_" + k] = jnp.asarray(np.asarray(v)[None])
        y, cb, cr = self._step(inp)
        return np.asarray(y[0]), np.asarray(cb[0]), np.asarray(cr[0])
