#!/usr/bin/env python3
"""Aggregate per-op durations from the xplane trace tools/trace_decode.py
captured: total serial device time and the top ops by accumulated
duration/instance count — the round-5 optimization loop ran on exactly
this output (see README Performance)."""
import os, glob, re
os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
from tensorflow.tsl.profiler.protobuf import xplane_pb2
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(glob.glob("/tmp/h264_trace_r5/**/*.xplane.pb", recursive=True)[0], "rb").read())
for plane in xs.planes:
    if not (plane.name.endswith("TPU:0") or "/device:TPU:0" in plane.name):
        continue
    evmeta = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        agg = {}
        for e in line.events:
            n = evmeta.get(e.metadata_id, "?")
            key = n.split(" = ")[0]  # %fusion.106 etc.
            shape = n.split(" = ")[1].split(" ")[0] if " = " in n else ""
            a = agg.setdefault(key, [0, 0, shape])
            a[0] += e.duration_ps
            a[1] += 1
        tot = sum(a[0] for a in agg.values())
        print(f"total serial {tot/1e9:.0f}ms over {sum(a[1] for a in agg.values())} events")
        for k, (d, c, shape) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:45]:
            print(f"  {d/1e9:8.2f}ms n={c:4d} avg={d/c/1e6:8.1f}us  {k}  {shape[:60]}")
