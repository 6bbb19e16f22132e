#!/usr/bin/env python3
"""Capture a real device trace of a bench-style 1080p decode.

Decodes the bench stream twice (warm-up + traced pass) under
jax.profiler; the xplane protobuf lands in /tmp/h264_trace_r5 for
tools/trace_parse.py. This pair of scripts is the ONLY trustworthy
device-time attribution on the axon runtime (the execution service
memoizes byte-identical dispatches, so replay micro-benchmarks lie).
"""
import os, sys, time, glob
os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax
import bench as benchmod
from h264decode_tpu.pipeline.tpu_pipeline import TpuDecoder

bs = benchmod.make_stream(1080, 1920, 8)
dec = TpuDecoder()
fr = dec.decode_stream(bs)
for f in fr: f.sync()          # warm-up/compile
tdir = "/tmp/h264_trace_r5"
os.system(f"rm -rf {tdir}")
jax.profiler.start_trace(tdir)
dec2 = TpuDecoder()
t0 = time.time()
fr = dec2.decode_stream(bs)
for f in fr: f.sync()
dt = time.time() - t0
jax.profiler.stop_trace()
print("timed:", dt, "s for", len(fr), "frames", flush=True)

# parse xplane
from tensorflow.tsl.profiler.protobuf import xplane_pb2
pbs = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(pbs[0], "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name or "#" in plane.name and "TPU:0" not in plane.name:
        pass
    if plane.name.endswith("TPU:0") or "/device:TPU:0" in plane.name:
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = [(e.offset_ps, e.duration_ps, evmeta.get(e.metadata_id, "?"))
                   for e in line.events]
            evs.sort()
            # find a steady-state frame_step span: group events into spans by gaps
            # simply take events in the middle third and aggregate by op name
            if not evs: continue
            t_lo = evs[0][0] + (evs[-1][0]-evs[0][0])*0.45
            t_hi = evs[0][0] + (evs[-1][0]-evs[0][0])*0.60
            win = [e for e in evs if t_lo <= e[0] <= t_hi]
            total = sum(d for _,d,_ in win)/1e6
            print(f"window ops={len(win)} total={total:.1f}us")
            agg = {}
            for _, d, n in win:
                key = n.split(".")[0].split("%")[-1]
                agg[key] = agg.get(key, 0) + d
            for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
                print(f"  {v/1e6:9.1f} us  {k}")
