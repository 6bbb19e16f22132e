#!/usr/bin/env python3
"""Device-time attribution probe for the frame pipeline.

Captures the real per-frame inputs of frame_step from a bench-style stream
decode, then replays the program (and ablated variants) in steady state to
split the device wall into stages: full step, no-deblock, no-intra(+deblock),
MC-only, unpack-only. Run on the real TPU:

    python tools/perf_probe.py [frames]
"""
from __future__ import annotations

import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import bench as benchmod
    from h264decode_tpu.pipeline import tpu_pipeline as tp

    bs = benchmod.make_stream(1080, 1920, n_frames)

    captured = []
    orig = tp.frame_step

    def spy(buf, ry, rcb, rcr, dyn, mb_h, mb_w, n_refs, flags, meta):
        # snapshot the rings to host: the real call donates them
        captured.append(
            dict(buf=np.asarray(buf), ry=np.asarray(ry), rcb=np.asarray(rcb),
                 rcr=np.asarray(rcr), dyn=dyn,
                 mb_h=mb_h, mb_w=mb_w, n_refs=n_refs, flags=flags, meta=meta)
        )
        return orig(buf, ry, rcb, rcr, dyn, mb_h, mb_w, n_refs, flags, meta)

    tp.frame_step = spy
    try:
        dec = tp.TpuDecoder()
        frames = dec.decode_stream(bs)
        for f in frames:
            f.sync()
    finally:
        tp.frame_step = orig
    print(f"captured {len(captured)} frame steps", file=sys.stderr)

    # replay each captured frame N times in steady state. Donation: pass
    # fresh copies of the ring each iteration (copy cost measured separately).
    import jax.numpy as jnp
    from functools import partial

    def timeit(fn, *args, reps=6, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args, **kw)
            jax.block_until_ready(out)
        return (time.time() - t0) / reps

    # non-donating wrapper so we can replay without copies
    @partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
    def step_nodonate(buf, ry, rcb, rcr, dyn, mb_h, mb_w, n_refs, flags, meta):
        return orig.__wrapped__(buf, ry, rcb, rcr, dyn, mb_h, mb_w,
                                n_refs, flags, meta)

    # ablations of the device program
    from h264decode_tpu.pipeline.tpu_pipeline import (
        _base_planes, _deblock_core, _densify_residuals, _frame_core, _unpack,
    )
    from h264decode_tpu.kernels import mc as mc_k

    def build_inp(buf, ry, rcb, rcr, dyn, mb_h, mb_w, flags, meta):
        has_l8, has_pcm, apply_db, sparse = flags
        inp = dict(dyn)
        inp.update(_unpack(buf, meta))
        f8 = inp.pop("flags8")
        m4n = inp.pop("modes4n")
        inp["modes4"] = (
            jnp.stack([m4n & 0x0F, m4n >> 4], axis=-1)
            .reshape(m4n.shape[0], 16).astype(jnp.int32) - 1
        )
        if "slice_mb" in inp and "slice_arr" not in inp:
            inp["slice_arr"] = inp["slice_mb"]
        inp["is_i16"] = (f8 & 1) != 0
        inp["is_t8"] = (f8 & 2) != 0
        inp["is_intra"] = (f8 & 4) != 0
        inp["avl"] = (f8 & 8) != 0
        inp["avt"] = (f8 & 16) != 0
        inp["avtr"] = (f8 & 32) != 0
        inp["avtl"] = (f8 & 64) != 0
        if "nnz_bits" in inp:
            nb = inp.pop("nnz_bits")
            bits = (nb[:, None] >> jnp.arange(7, -1, -1, dtype=nb.dtype)) & 1
            inp["nnz_grid"] = (
                bits.reshape(-1)[: mb_h * 4 * mb_w * 4].reshape(mb_h * 4, mb_w * 4)
            )
        if sparse:
            _densify_residuals(inp, mb_h * mb_w, has_l8)
        if "mv8_parts" in inp:
            n = mb_h * mb_w
            m8 = inp["mv8_parts"].astype(jnp.int32).reshape(n, 2, 2, 1, 2, 1, 2)
            inp["mv_parts"] = jnp.broadcast_to(
                m8, (n, 2, 2, 2, 2, 2, 2)).reshape(n, 2, 16, 2)
        else:
            inp["mv_parts"] = inp["mv_parts"].astype(jnp.int32)
        inp["ref_luma"] = ry
        inp["ref_cb"] = rcb
        inp["ref_cr"] = rcr
        return inp

    def mk(stage):
        @partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
        def f(buf, ry, rcb, rcr, dyn, mb_h, mb_w, n_refs, flags, meta):
            has_l8, has_pcm, apply_db, sparse = flags
            inp = build_inp(buf, ry, rcb, rcr, dyn, mb_h, mb_w, flags, meta)
            if stage == "unpack":
                return jax.tree.map(
                    lambda a: jnp.sum(a.astype(jnp.int32)) if hasattr(a, "astype") else a,
                    {k: v for k, v in inp.items() if k not in ("ref_luma", "ref_cb", "ref_cr")})
            if stage == "base":
                by, bcb, bcr, ryp, rcbp, rcrp = _base_planes(
                    inp, mb_h, mb_w, has_l8, has_pcm)
                return by, bcb, bcr
            y, cb, cr = _frame_core(inp, mb_h, mb_w, n_refs, has_l8, has_pcm)
            if stage == "recon":
                return y, cb, cr
            y, cb, cr = _deblock_core((y, cb, cr), inp, mb_h, mb_w)
            if stage == "deblock":
                return y, cb, cr
            hp = mc_k.half_pel_planes(y)
            cbp = mc_k.chroma_pad(cb)
            crp = mc_k.chroma_pad(cr)
            packed = jnp.concatenate([y, jnp.concatenate([cb, cr], axis=1)], axis=0)
            return hp, cbp, crp, packed
        return f

    stages = ["unpack", "base", "recon", "deblock", "full"]
    fns = {s: mk(s) for s in stages}
    fns["step_nodonate"] = step_nodonate

    # use frame 1 (a typical inter frame) and frame 0 (the I frame)
    for fi in [0, min(1, len(captured) - 1), min(3, len(captured) - 1)]:
        c = captured[fi]
        ry = jax.device_put(c["ry"])
        rcb = jax.device_put(c["rcb"])
        rcr = jax.device_put(c["rcr"])
        buf = jax.device_put(c["buf"])
        print(f"--- frame {fi} flags={c['flags']}", file=sys.stderr)
        for s in stages:
            dt = timeit(fns[s], buf, ry, rcb, rcr, c["dyn"], c["mb_h"],
                        c["mb_w"], c["n_refs"], c["flags"], c["meta"])
            print(f"  {s:10s}: {dt*1e3:8.2f} ms", file=sys.stderr)
        dt = timeit(fns["step_nodonate"], buf, ry, rcb, rcr, c["dyn"],
                    c["mb_h"], c["mb_w"], c["n_refs"], c["flags"], c["meta"])
        print(f"  fullstep  : {dt*1e3:8.2f} ms (incl. ring update)", file=sys.stderr)


if __name__ == "__main__":
    main()
