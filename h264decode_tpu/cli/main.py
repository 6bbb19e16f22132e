"""Command-line interface: decode / probe / serve / bench.

`serve` keeps capability parity with the reference's only entry point — a
TCP listener that ingests an Annex-B byte stream per connection
(/root/reference/main.go:7-23) — but decodes to pixels instead of stopping
at syntax parsing, with configurable port/paths instead of the reference's
hardcoded ones (h264/server.go:115).

Usage:
  python -m h264decode_tpu decode in.264 out.y4m [--backend tpu|numpy] [--no-deblock]
  python -m h264decode_tpu probe in.264
  python -m h264decode_tpu serve [--port 8000] [--out-dir /tmp]
  python -m h264decode_tpu bench
"""

from __future__ import annotations

import argparse
import os
import socket
import sys
import threading
import time


def _parse_mesh(spec: str):
    """"GxR" mesh spec -> ("gop","row") Mesh (e.g. --mesh 2x4)."""
    from ..dist.mesh import make_mesh

    if not spec:
        return make_mesh()
    g, r = (int(v) for v in spec.lower().split("x"))
    return make_mesh(g, r)


def _make_decoder(backend: str, apply_deblock: bool, mesh_spec: str = ""):
    if backend == "tpu":
        from ..pipeline.tpu_pipeline import TpuDecoder

        return TpuDecoder(apply_deblock=apply_deblock)
    if backend == "sharded":
        from ..dist.decoder import ShardedDecoder

        return ShardedDecoder(_parse_mesh(mesh_spec), apply_deblock=apply_deblock)
    if backend == "gop":
        from ..dist.gop import GopParallelDecoder

        return GopParallelDecoder(_parse_mesh(mesh_spec), apply_deblock=apply_deblock)
    from ..pipeline.decoder import Decoder

    return Decoder(apply_deblock=apply_deblock)


def cmd_decode(args) -> int:
    from ..io.writers import write_npz, write_y4m
    from ..utils.metrics import GLOBAL as metrics

    data = open(args.input, "rb").read()
    if args.seek:
        from ..pipeline.seek import decode_from, scan_access_points

        pts = scan_access_points(data)
        if not pts:
            print("no access points found", file=sys.stderr)
            return 1
        pt = next(
            (p for p in pts if p.picture_index >= args.seek), pts[-1]
        )
        dec = _make_decoder(args.backend, not args.no_deblock, args.mesh)
        t0 = time.time()
        frames = list(decode_from(data, pt, decoder=dec))
        dt = time.time() - t0
    else:
        dec = _make_decoder(args.backend, not args.no_deblock, args.mesh)
        t0 = time.time()
        with metrics.timer("decode"):
            frames = dec.decode_stream(data)
        dt = time.time() - t0
    metrics.count("frames", len(frames))
    if args.output.endswith(".npz"):
        write_npz(args.output, frames)
    else:
        write_y4m(args.output, frames)
    print(
        f"decoded {len(frames)} frames in {dt:.2f}s "
        f"({len(frames) / dt:.2f} fps) -> {args.output}"
    )
    if args.metrics:
        print(metrics.dump())
    return 0


def cmd_probe(args) -> int:
    from ..bitstream.annexb import iter_nalus
    from ..syntax import nal as nal_mod
    from ..syntax.nal import parse_nal_unit
    from ..syntax.pps import parse_pps
    from ..syntax.slice_header import parse_slice_header
    from ..syntax.sps import parse_sps

    data = open(args.input, "rb").read()
    if getattr(args, "access_points", False):
        from ..pipeline.seek import scan_access_points

        for pt in scan_access_points(data):
            extra = (
                f" recovery_frame_cnt {pt.recovery_frame_cnt}"
                f" exact {pt.exact_match}" if pt.kind == "recovery" else ""
            )
            print(
                f"{pt.kind:8s} byte {pt.offset:<10d} picture "
                f"{pt.picture_index}{extra}"
            )
        return 0
    sps_map, pps_map = {}, {}
    for raw in iter_nalus(data):
        nal = parse_nal_unit(raw)
        if nal.type == nal_mod.NAL_SPS:
            s = parse_sps(nal.rbsp)
            sps_map[s.seq_parameter_set_id] = s
            print(
                f"SPS {s.seq_parameter_set_id}: profile {s.profile_idc} "
                f"level {s.level_idc} {s.width}x{s.height} "
                f"chroma {s.chroma_format_idc} refs {s.max_num_ref_frames}"
            )
        elif nal.type == nal_mod.NAL_PPS:
            p = parse_pps(nal.rbsp, sps_map)
            pps_map[p.pic_parameter_set_id] = p
            print(
                f"PPS {p.pic_parameter_set_id}: "
                f"{'CABAC' if p.entropy_coding_mode_flag else 'CAVLC'} "
                f"init_qp {p.pic_init_qp} t8x8 {p.transform_8x8_mode_flag}"
            )
        elif nal.is_vcl:
            h, s, p, _ = parse_slice_header(nal.rbsp, nal, sps_map, pps_map)
            print(
                f"slice {h.type_name}{' IDR' if h.idr_pic_flag else ''} "
                f"frame_num {h.frame_num} qp {h.slice_qp(p)} "
                f"first_mb {h.first_mb_in_slice}"
            )
        else:
            print(f"NAL {nal.type}: {nal.name} ({len(raw)} bytes)")
    return 0


def cmd_serve(args) -> int:
    """TCP Annex-B ingest (reference parity: main.go accept loop)."""
    from ..io.writers import write_y4m

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((args.host, args.port))
    srv.listen(4)
    print(f"listening on {args.host}:{args.port}; writing to {args.out_dir}")
    n = [0]

    def handle(conn, idx):
        def chunks():
            while True:
                b = conn.recv(1 << 16)
                if not b:
                    return
                yield b

        # frames stream straight from the socket to the writer as the DPB
        # bumps them (C.4.5.3): constant memory for arbitrarily long streams
        dec = _make_decoder(args.backend, True)
        out = os.path.join(args.out_dir, f"stream_{idx}.y4m")
        try:
            n = write_y4m(out, dec.decode_iter(chunks()))
        finally:
            conn.close()
        print(f"[conn {idx}] {n} frames -> {out}")

    try:
        while True:
            conn, _ = srv.accept()
            idx = n[0]
            n[0] += 1
            threading.Thread(target=handle, args=(conn, idx), daemon=True).start()
            if args.once:
                time.sleep(0.5)
                break
    except KeyboardInterrupt:
        pass
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="h264decode_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("decode", help="decode an Annex-B file to y4m/npz")
    d.add_argument("input")
    d.add_argument("output")
    d.add_argument(
        "--backend",
        choices=["tpu", "numpy", "sharded", "gop"],
        default="tpu",
        help="tpu: single-chip jitted pipeline; sharded: row-band mesh; "
        "gop: GOP+row data-parallel mesh; numpy: oracle",
    )
    d.add_argument(
        "--mesh", default="",
        help='("gop","row") mesh shape as GxR, e.g. 2x4 (sharded/gop backends)',
    )
    d.add_argument(
        "--seek", type=int, default=0, metavar="N",
        help="resume decoding at the first access point at/after picture N",
    )
    d.add_argument("--no-deblock", action="store_true")
    d.add_argument("--metrics", action="store_true")
    d.set_defaults(fn=cmd_decode)
    p = sub.add_parser("probe", help="print stream structure")
    p.add_argument("input")
    p.add_argument(
        "--access-points", action="store_true",
        help="list random-access points (IDR / recovery-point SEI)",
    )
    p.set_defaults(fn=cmd_probe)
    s = sub.add_parser("serve", help="TCP Annex-B ingest server")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8000)
    s.add_argument("--out-dir", default="/tmp")
    s.add_argument("--backend", choices=["tpu", "numpy"], default="numpy")
    s.add_argument("--once", action="store_true")
    s.set_defaults(fn=cmd_serve)
    b = sub.add_parser("bench", help="run the headline benchmark")
    b.set_defaults(fn=lambda a: os.system(f"{sys.executable} bench.py") >> 8)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
