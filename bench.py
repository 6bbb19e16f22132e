#!/usr/bin/env python3
"""Headline benchmark: 1080p Main-profile decode on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is decode throughput per chip: frames fully reconstructed
(residuals + MC + intra + deblock, bit-exact vs libavcodec) with the
output planes resident on device, which is where a TPU serving pipeline
consumes them. The bench VALIDATES bit-exactness of every benched frame
against libavcodec after the timed pass, and separately reports e2e
throughput including the device->host pixel download — on this machine
that download rides the axon tunnel at ~9 MB/s (a test-harness transport,
~350 ms/frame at 1080p; PCIe on a real deployment moves the same frame in
~1 ms), so it is reported but not the headline.

The reference (mrmod/h264decode) publishes no numbers and cannot decode
pixels at all (BASELINE.md), so vs_baseline is reported against the
BASELINE.json north-star target of 60 fps/chip.

Configuration via env:
  BENCH_FRAMES  (default 8)    frames of the stream to decode
  BENCH_SIZE    (default 1080p) one of 1080p|720p|qcif
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def make_stream(h, w, n_frames, gop=None):
    """Bench content. BENCH_CONTENT=hard produces a high-motion, textured,
    multi-slice encode (slower encoder preset, 4 slices, full partitions)
    so entropy and wire costs reflect production streams rather than the
    default smooth tracking-friendly pattern."""
    from h264decode_tpu.golden import lavc

    hard = os.environ.get("BENCH_CONTENT", "") == "hard"
    if gop is None:
        gop = max(4, n_frames)
    tag = ("hard_" if hard else "") + (f"g{gop}_" if gop != max(4, n_frames) else "")
    cache = f"/tmp/h264tpu_bench_{tag}{w}x{h}_{n_frames}.264"
    if os.path.exists(cache):
        return open(cache, "rb").read()
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    if hard:
        base = np.clip(
            128
            + 70 * np.sin(xx / 5.0 + np.cos(yy / 7.0) * 3.0)
            + 40 * np.sign(np.sin(xx / 37.0) * np.sin(yy / 29.0))
            + rng.normal(0, 24, (h, w)),
            0, 255,
        ).astype(np.uint8)
        for i in range(n_frames):
            # large, direction-changing displacements + per-frame noise:
            # defeats skip/zero-MV shortcuts and loads every bench stage
            dx = int(18 * np.sin(i * 1.3)) + 7 * i
            dy = int(11 * np.cos(i * 0.9)) + 3 * i
            y = np.roll(np.roll(base, dx, axis=1), dy, axis=0)
            y = np.clip(
                y.astype(np.int16) + rng.normal(0, 6, (h, w)).astype(np.int16),
                0, 255,
            ).astype(np.uint8)
            cb = np.clip(
                110 + 60 * np.sin(xx[: h // 2, : w // 2] / 9.0 + i * 0.7),
                0, 255,
            ).astype(np.uint8)
            cr = np.clip(
                140 + 50 * np.cos(yy[: h // 2, : w // 2] / 11.0 - i * 0.5),
                0, 255,
            ).astype(np.uint8)
            frames.append((y, cb, cr))
        bs = lavc.encode_x264(
            frames, qp=24, profile="high", cabac=True, bframes=2,
            preset="medium", gop=gop,
            extra_x264="slices=4:8x8dct=1:partitions=all:ref=3",
        )
    else:
        base = np.clip(
            128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
            + rng.normal(0, 8, (h, w)),
            0,
            255,
        ).astype(np.uint8)
        for i in range(n_frames):
            y = np.roll(np.roll(base, 2 * i, axis=1), i, axis=0)
            cb = np.clip(110 + 40 * np.sin(xx[: h // 2 : 1, : w // 2 : 1] / 31.0 + i * 0.1), 0, 255).astype(np.uint8)[: h // 2, : w // 2]
            cr = np.full((h // 2, w // 2), 128, np.uint8)
            frames.append((y, cb, cr))
        bs = lavc.encode_x264(
            frames, qp=28, profile="main", cabac=True, bframes=2, preset="fast", gop=gop
        )
    with open(cache, "wb") as f:
        f.write(bs)
    return bs


def bench_mesh(size, h, w, n_frames, mesh_spec):
    """Multi-chip throughput: decode a multi-GOP stream with the GOP+row
    sharded pipeline over a ("gop"=G, "row"=R) device mesh (BENCH_MESH=GxR).
    Produces the N-host/chip scaling number of BASELINE.md the day the
    hardware has G*R chips; on a 1-chip machine only 1x1 runs."""
    import jax

    from h264decode_tpu.dist.gop import GopParallelDecoder
    from h264decode_tpu.dist.mesh import make_mesh
    from h264decode_tpu.golden import lavc

    G, R = (int(x) for x in mesh_spec.lower().split("x"))
    if G * R > len(jax.devices()):
        print(
            json.dumps(
                {
                    "metric": f"{size}_mesh{G}x{R}_fps",
                    "value": 0.0,
                    "unit": "frames/s",
                    "vs_baseline": 0.0,
                    "error": f"needs {G * R} devices, have {len(jax.devices())}",
                }
            )
        )
        return
    mesh = make_mesh(G, R)
    # MB rows must divide by the row shards: round the height up
    h = ((h + 16 * R - 1) // (16 * R)) * (16 * R)
    # one closed GOP per gop slot (plus one spare round) so DP is real:
    # G gop slots need >= G independent closed GOPs in the stream
    bs = make_stream(h, w, n_frames, gop=max(1, n_frames // (G + 1)))
    dec = GopParallelDecoder(mesh)
    frames = dec.decode_stream(bs)  # warm-up + compile
    t0 = time.time()
    dec2 = GopParallelDecoder(mesh)
    frames = dec2.decode_stream(bs)
    dt = time.time() - t0
    fps = len(frames) / dt
    golden = lavc.decode_annexb(bs)
    bit_exact = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for g, o in zip(golden, frames)
        for a, b in zip(g.planes(), o.planes())
    )
    assert bit_exact, "sharded decode differs from libavcodec"
    print(
        json.dumps(
            {
                "metric": f"{size}_main_cabac_fps_mesh{G}x{R}",
                "value": round(fps, 4),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 5),
            }
        )
    )
    print(
        f"# mesh {G}x{R}: {len(frames)} frames in {dt:.2f}s -> {fps:.2f} fps "
        f"(bit-exact: {bit_exact})",
        file=sys.stderr,
    )


def main():
    size = os.environ.get("BENCH_SIZE", "1080p")
    h, w = {"1080p": (1080, 1920), "720p": (720, 1280), "qcif": (144, 176)}[size]
    n_frames = int(os.environ.get("BENCH_FRAMES", "8"))
    mesh_spec = os.environ.get("BENCH_MESH")
    if mesh_spec:
        bench_mesh(size, h, w, n_frames, mesh_spec)
        return
    bs = make_stream(h, w, n_frames)

    from h264decode_tpu.pipeline.tpu_pipeline import TpuDecoder
    from h264decode_tpu.utils.metrics import DecodeMetrics

    # warm-up decode compiles the XLA pipeline for this geometry (persistent
    # compile cache at /tmp/jax_h264_cache makes this fast across processes)
    t_warm = time.time()
    dec = TpuDecoder()
    frames = dec.decode_stream(bs)
    for f in frames:
        f.sync()
    warm_s = time.time() - t_warm
    assert len(frames) == n_frames

    # timed pass (fresh decoder state, compiled cache hot): decode until
    # every output frame's packed planes exist on device. Downloads are
    # deferred past the timing fence (eager_download=False): on this
    # harness the device link is a narrow tunnel, and production frames
    # stay on device or stream out at link speed regardless of decode rate
    metrics = DecodeMetrics()
    dec2 = TpuDecoder(metrics=metrics, eager_download=False)
    t0 = time.time()
    frames = dec2.decode_stream(bs)
    for f in frames:
        f.sync()
    dt = time.time() - t0
    fps = len(frames) / dt

    # device->host transport (separately timed): e2e = decode + download
    t1 = time.time()
    out = [f.planes() for f in frames]
    dl = time.time() - t1
    e2e_fps = len(frames) / (dt + dl)

    # correctness gate: every benched frame bit-exact vs libavcodec
    from h264decode_tpu.golden import lavc

    golden = lavc.decode_annexb(bs)
    assert len(golden) == len(out), (len(golden), len(out))
    bit_exact = all(
        np.array_equal(a, b)
        for g, o in zip(golden, out)
        for a, b in zip(g.planes(), o)
    )
    assert bit_exact, "decoded planes differ from libavcodec"

    content = "_hard" if os.environ.get("BENCH_CONTENT", "") == "hard" else ""
    print(
        json.dumps(
            {
                "metric": f"{size}_main_cabac_fps_per_chip{content}",
                "value": round(fps, 4),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 5),
            }
        )
    )
    s = metrics.summary()
    print(
        f"# {len(frames)} frames decoded in {dt:.2f}s -> {fps:.2f} fps/chip "
        f"(bit-exact vs libavcodec: {bit_exact}); warm-up incl. compile: "
        f"{warm_s:.1f}s; per-stage: {s}",
        file=sys.stderr,
    )
    print(
        f"# e2e incl. device->host pixel download: {e2e_fps:.2f} fps "
        f"(download {dl:.2f}s for {len(frames)} frames over the axon tunnel "
        f"at ~{sum(p.nbytes for fr in out for p in fr)/max(dl,1e-9)/1e6:.1f} MB/s "
        f"— harness transport, not decode)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
