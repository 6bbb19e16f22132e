"""Sharded stream decoding: drive the shard_map row-band pipeline with real
FrameTensors from the entropy stage.

Exactness contract (see dist/sharded.py): residual transforms, weighted
motion compensation and PCM placement are exactly row-parallel for any
stream. Intra prediction and deblocking either run band-locally (fast path,
exact when encoder slices align to the row bands) or through the
ppermute halo pipeline (exact for ANY stream, including single-slice
encodes). `ShardedDecoder` picks the mode per stream automatically.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..kernels.intra import K_I4, K_I8, K_I16
from ..pipeline.decoder import Decoder
from ..pipeline.tpu_pipeline import (
    R_W_DEFAULT,
    _mb_avail_grids,
    _weight_tables,
)
from ..kernels import transform as tr_k
from ..tensors.frame_tensors import MB_I_16X16, MB_I_NXN
from .sharded import _REPLICATED as _REPLICATED_KEYS
from .sharded import make_sharded_step


class ShardedDecoder(Decoder):
    """Decodes one stream with the pixel pipeline sharded over a
    ("gop"=1, "row"=n) mesh. Slice-per-band streams use the fully parallel
    band-local path; anything else uses the halo-exchange pipeline."""

    def __init__(self, mesh, apply_deblock: bool = True):
        super().__init__(apply_deblock=apply_deblock)
        self.mesh = mesh
        self.n_row = mesh.shape["row"]
        self._step = None
        self._step_geom = None
        self._r_w = R_W_DEFAULT

    def _aligned(self, ft, slices) -> bool:
        """True when the band-local fast path is exact: every band boundary
        is a slice start (no slice straddles a boundary), and — when
        deblocking is on — no slice filters across its boundaries
        (disable_deblocking_filter_idc 1 or 2). Anything else routes to the
        halo-exchange pipeline."""
        band_mbs = (ft.mb_h // self.n_row) * ft.mb_w
        starts = {h.first_mb_in_slice for h, *_ in slices}
        if any(s % band_mbs for s in starts):
            return False
        if not set(range(0, ft.n_mbs, band_mbs)) <= starts:
            return False
        if self.apply_deblock and not all(
            h.disable_deblocking_filter_idc in (1, 2) for h, *_ in slices
        ):
            return False
        return True

    def _reconstruct(self, ft, sps, pps, slices, ref_lists, weight_ctx, poc):
        if (
            slices[0][0].field_pic_flag
            or slices[0][0].mbaff_frame_flag
            # mono rides the 4:2:0 sharded step exactly like the single-chip
            # device path (no coded chroma -> mid-gray converges exactly)
            or sps.chroma_array_type not in (0, 1)
            or sps.bit_depth_luma != 8
            or any(h.is_sp or h.is_si for h, *_ in slices)
            or (sps.qpprime_y_zero_transform_bypass_flag and (ft.qp == 0).any())
        ):
            # PAFF/MBAFF geometry, SP/SI transform-domain requant and
            # lossless bypass run on the numpy oracle: never mis-decode
            # silently on the sharded fast path
            for l0, l1 in ref_lists:
                for p in l0 + l1:
                    if not isinstance(p.y, np.ndarray):
                        p.y, p.cb, p.cr = (
                            np.asarray(p.y), np.asarray(p.cb), np.asarray(p.cr)
                        )
            return super()._reconstruct(
                ft, sps, pps, slices, ref_lists, weight_ctx, poc
            )
        mb_h, mb_w = ft.mb_h, ft.mb_w
        assert mb_h % self.n_row == 0, "frame rows must divide by row shards"
        halo = not self._aligned(ft, slices)
        n_refs = max(1, sps.max_num_ref_frames + 1)
        qp_offs = (pps.chroma_qp_index_offset, pps.second_chroma_qp_index_offset)
        has_pcm = bool(ft.pcm_samples)
        geom = (mb_h, mb_w, n_refs, qp_offs, halo, has_pcm)
        if self._step is None or self._step_geom != geom:
            self._step = make_sharded_step(
                self.mesh, mb_h, mb_w, n_refs,
                apply_deblock=self.apply_deblock, qp_offsets=qp_offs,
                halo=halo, has_l8=True, has_pcm=has_pcm,
            )
            self._step_geom = geom
        raw = self.build_inputs(
            ft, sps, pps, slices, ref_lists, weight_ctx, poc,
            n_refs=n_refs, has_pcm=has_pcm,
        )

        def g(a):
            return jnp.asarray(a[None])  # add the gop axis (G=1)

        inp = {
            k: (jnp.asarray(v) if k in _REPLICATED_KEYS else g(v))
            for k, v in raw.items()
        }
        y, cb, cr = self._step(inp)
        return np.asarray(y[0]), np.asarray(cb[0]), np.asarray(cr[0])

    def build_inputs(self, ft, sps, pps, slices, ref_lists, weight_ctx, poc,
                     *, n_refs: int, has_pcm: bool, s_pad: int | None = None
                     ) -> dict[str, np.ndarray]:
        """Host-side tensor assembly for one frame of one gop slot: every
        array the sharded step consumes, WITHOUT the gop axis (the caller
        adds it — ShardedDecoder with G=1, dist/gop.py stacking G slots)."""
        mb_h, mb_w = ft.mb_h, ft.mb_w
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

        # per-slice weighted-prediction tables (identity unless weighted)
        if s_pad is None:
            s_pad = 1 << max(0, len(slices) - 1).bit_length()
        max_list = max(
            [1]
            + [len(l0) for l0, _ in ref_lists]
            + [len(l1) for _, l1 in ref_lists]
        )
        while self._r_w < max_list:
            self._r_w *= 2
        wt = _weight_tables(weight_ctx, ref_lists, poc, s_pad, self._r_w)

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
            return a

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
            "slice_mb": g(ft.slice_id, np.int16),
            "ridx_parts": g(ft.ref_idx),
            "slot_parts": g(slot_parts),
            "mv_parts": g(ft.mv),
            "ref_luma_raw": g(ref_y),
            "ref_cb_raw": g(ref_cb),
            "ref_cr_raw": g(ref_cr),
            "ls4_y": ls4_y,
            "ls8_y": ls8_y,
            "ls4_c": ls4_c,
        }
        for k, v in wt.items():
            inp[k] = v
        if has_pcm:
            pcm_y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
            pcm_cb = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
            pcm_cr = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
            for addr, (py, pcb, pcr) in ft.pcm_samples.items():
                mbx, mby = ft.mb_xy(addr)
                pcm_y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = py
                pcm_cb[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = pcb
                pcm_cr[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = pcr
            inp["pcm_y"] = pcm_y
            inp["pcm_cb"] = pcm_cb
            inp["pcm_cr"] = pcm_cr
        if self.apply_deblock:
            from ..pipeline.deblock_prep import prepare_deblock

            for k, v in prepare_deblock(ft, sps, pps).items():
                inp["db_" + k] = np.asarray(v)
        return inp
