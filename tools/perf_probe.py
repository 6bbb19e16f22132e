#!/usr/bin/env python3
"""Device-time attribution probe for the frame pipeline.

Captures the real per-frame inputs of frame_step from a bench-style stream
decode, then replays the program and ablated sub-stages in steady state on
the real TPU. Each replay iteration perturbs an unused wire byte so the
axon execution service cannot memoize identical calls (repeating byte-
identical executions returns in ~0.1 ms regardless of true cost).

    python tools/perf_probe.py [frames]
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import jax.numpy as jnp

    import bench as benchmod
    from h264decode_tpu.kernels import mc as mc_k
    from h264decode_tpu.pipeline import tpu_pipeline as tp
    from h264decode_tpu.pipeline.tpu_pipeline import (
        _base_planes,
        _deblock_core,
        _frame_core,
        _prepare_inp,
    )

    bs = benchmod.make_stream(1080, 1920, n_frames)
    captured = []
    orig = tp.frame_step

    def spy(wire, ry, rcb, rcr, dyn, mb_h, mb_w, n_refs, flags):
        captured.append(
            dict(wire={k: np.asarray(v) for k, v in wire.items()},
                 dyn=dyn, mb_h=mb_h, mb_w=mb_w, n_refs=n_refs, flags=flags)
        )
        return orig(wire, ry, rcb, rcr, dyn, mb_h, mb_w, n_refs, flags)

    tp.frame_step = spy
    try:
        dec = tp.TpuDecoder()
        for f in dec.decode_stream(bs):
            f.sync()
    finally:
        tp.frame_step = orig
    print(f"captured {len(captured)} frame steps", file=sys.stderr)

    def mk(stage):
        @partial(jax.jit, static_argnums=(5, 6, 7, 8))
        def f(wire, ry, rcb, rcr, dyn, mb_h, mb_w, n_refs, flags):
            has_l8, has_pcm, apply_db, sparse = flags[:4]
            inp = _prepare_inp(wire, dyn, ry, rcb, rcr, mb_h, mb_w, flags)
            if stage == "prep":
                return sum(
                    v.astype(jnp.int32).sum()
                    for k, v in inp.items()
                    if k not in ("ref_luma", "ref_cb", "ref_cr", "qp_offsets")
                )
            if stage == "base":
                by, bcb, bcr, *_ = _base_planes(inp, mb_h, mb_w, has_l8, has_pcm)
                return by.sum() + bcb.sum() + bcr.sum()
            y, cb, cr = _frame_core(inp, mb_h, mb_w, n_refs, has_l8, has_pcm)
            if stage == "recon":
                return y.sum() + cb.sum() + cr.sum()
            y, cb, cr = _deblock_core((y, cb, cr), inp, mb_h, mb_w)
            if stage == "deblock":
                return y.sum() + cb.sum() + cr.sum()
            hp = mc_k.half_pel_planes(y)
            return hp.sum() + cb.sum() + cr.sum()

        return f

    c = captured[min(1, len(captured) - 1)]  # a typical inter frame
    n_refs, mbh, mbw = c["n_refs"], c["mb_h"], c["mb_w"]
    H, W = mbh * 16, mbw * 16
    P = mc_k.PAD
    rings = [
        jnp.zeros((n_refs, 4, H + 2 * P, W + 2 * P), jnp.uint8),
        jnp.zeros((n_refs, H // 2 + 2 * P, W // 2 + 2 * P), jnp.uint8),
        jnp.zeros((n_refs, H // 2 + 2 * P, W // 2 + 2 * P), jnp.uint8),
    ]
    for stage in ["prep", "base", "recon", "deblock", "full"]:
        fn = mk(stage)
        wires = []
        for i in range(7):
            w = dict(c["wire"])
            q = w["qp"].copy()
            w["qp"] = q  # same values; fresh buffer identity per iteration
            w["slot_idx"] = w["slot_idx"].copy()
            w["slot_idx"][...] = (i % n_refs)  # defeats service memoization
            wires.append(jax.device_put(w))
        r = fn(wires[0], *rings, c["dyn"], mbh, mbw, n_refs, c["flags"])
        jax.block_until_ready(r)
        t0 = time.time()
        for i in range(1, 7):
            r = fn(wires[i], *rings, c["dyn"], mbh, mbw, n_refs, c["flags"])
            jax.block_until_ready(r)
        print(f"  {stage:8s}: {(time.time() - t0) / 6 * 1e3:8.1f} ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()
