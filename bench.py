#!/usr/bin/env python3
"""Headline benchmark: 1080p Main-profile end-to-end decode on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference (mrmod/h264decode) publishes no numbers and cannot decode
pixels at all (BASELINE.md), so vs_baseline is reported against the
BASELINE.json north-star target of 60 fps/chip.

Configuration via env:
  BENCH_FRAMES  (default 4)   frames of the 1080p stream to decode
  BENCH_SIZE    (default 1080p) one of 1080p|720p|qcif
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def make_stream(h, w, n_frames):
    from h264decode_tpu.golden import lavc

    cache = f"/tmp/h264tpu_bench_{w}x{h}_{n_frames}.264"
    if os.path.exists(cache):
        return open(cache, "rb").read()
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    base = np.clip(
        128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0) + rng.normal(0, 8, (h, w)),
        0,
        255,
    ).astype(np.uint8)
    for i in range(n_frames):
        y = np.roll(np.roll(base, 2 * i, axis=1), i, axis=0)
        cb = np.clip(110 + 40 * np.sin(xx[: h // 2 : 1, : w // 2 : 1] / 31.0 + i * 0.1), 0, 255).astype(np.uint8)[: h // 2, : w // 2]
        cr = np.full((h // 2, w // 2), 128, np.uint8)
        frames.append((y, cb, cr))
    bs = lavc.encode_x264(
        frames, qp=28, profile="main", cabac=True, bframes=2, preset="fast", gop=max(4, n_frames)
    )
    with open(cache, "wb") as f:
        f.write(bs)
    return bs


def main():
    size = os.environ.get("BENCH_SIZE", "1080p")
    h, w = {"1080p": (1080, 1920), "720p": (720, 1280), "qcif": (144, 176)}[size]
    n_frames = int(os.environ.get("BENCH_FRAMES", "8"))
    bs = make_stream(h, w, n_frames)

    from h264decode_tpu.pipeline.tpu_pipeline import TpuDecoder
    from h264decode_tpu.utils.metrics import DecodeMetrics

    # warm-up decode compiles the XLA pipeline for this geometry (persistent
    # compile cache at /tmp/jax_h264_cache makes this fast across processes)
    dec = TpuDecoder()
    t_warm = time.time()
    frames = dec.decode_stream(bs)
    for f in frames:
        f.planes()  # materialize: planes download lazily
    warm_s = time.time() - t_warm
    assert len(frames) == n_frames

    # timed pass (fresh decoder state, compiled cache hot)
    metrics = DecodeMetrics()
    dec2 = TpuDecoder(metrics=metrics)
    t0 = time.time()
    frames = dec2.decode_stream(bs)
    for f in frames:
        f.planes()  # e2e includes the device->host download
    dt = time.time() - t0
    fps = len(frames) / dt

    print(
        json.dumps(
            {
                "metric": f"{size}_main_cabac_fps_per_chip_e2e",
                "value": round(fps, 4),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 5),
            }
        )
    )
    s = metrics.summary()
    t_down = s.get("t_download_s", 0.0)
    decode_fps = len(frames) / max(1e-9, dt - t_down)
    print(
        f"# {len(frames)} frames in {dt:.2f}s (warm-up incl. compile: "
        f"{warm_s:.1f}s); per-stage: {s}",
        file=sys.stderr,
    )
    print(
        f"# decode-only (excl. device->host pixel download, which rides the "
        f"axon tunnel at ~{s.get('bytes_down_per_s', 0)/1e6:.1f} MB/s on this "
        f"machine): {decode_fps:.2f} fps",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
