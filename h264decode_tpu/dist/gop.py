"""GOP-parallel decoding over the "gop" mesh axis (data parallelism).

Closed GOPs (IDR to next IDR) are independent decode problems — the
decoder-native analogue of data-parallel batching (SURVEY.md section 2.a).
The stream is split at IDR access units (pipeline/seek.scan_access_points),
GOPs are assigned round-robin to the G gop slots, and G slot decoders run
in LOCKSTEP:

- host side: per-slot threads run the per-GOP entropy stage concurrently
  (the native engine is stateless per call and releases the GIL inside its
  C entry points, so the threads genuinely overlap);
- device side: each step reconstructs G frames at once — per-slot inputs
  stacked on the gop axis, sharded P("gop", "row"), weight tables per-gop;
  slots whose GOPs are exhausted contribute zero-work dummy frames (all-
  zero kind/bs grids collapse their wavefronts, see dist/sharded.py).

Multi-host (`multihost=True`, after dist.multihost.initialize): the gop
axis spans processes over DCN while "row" stays intra-host; every process
decodes only the GOPs of its local gop slots, per-key global arrays are
assembled with jax.make_array_from_process_local_data, and the batch
schedule is DETERMINISTIC — every process derives the same global batch
count from the same stream scan, so the SPMD steps stay in lockstep with
no extra coordination traffic. The reference has no concurrency beyond
goroutine-per-connection (/root/reference/main.go:20).
"""

from __future__ import annotations

import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..bitstream.annexb import to_annexb
from ..pipeline.decoder import DecodedFrame
from ..pipeline.seek import _first_mb_is_zero, _iter_nalus_offsets, scan_access_points
from ..syntax.nal import parse_nal_unit
from .decoder import ShardedDecoder, _REPLICATED_KEYS
from .multihost import coordination_barrier
from .sharded import _WEIGHT_KEYS, make_sharded_step

# identity fill values for weight tables padded to a common shape
_TABLE_FILL = {
    "w_tab": 32, "o_tab": 0, "wc_tab": 32, "oc_tab": 0, "lwd_tab": 5,
    "pw0": 32, "pw1": 32, "pwc0": 32, "pwc1": 32,
}


def split_gops(data: bytes) -> list[tuple[bytes, int]]:
    """Split an Annex-B stream at IDR access units into self-contained
    (segment_bytes, picture_count) pairs; each segment is prefixed with its
    active parameter sets."""
    pts = [p for p in scan_access_points(data) if p.kind == "idr"]
    if not pts:
        return [(data, _count_pictures(data))]
    total = _count_pictures(data)
    segs = []
    for i, p in enumerate(pts):
        end = pts[i + 1].offset if i + 1 < len(pts) else len(data)
        n = (pts[i + 1].picture_index if i + 1 < len(pts) else total) - p.picture_index
        prefix = to_annexb(list(p.sps_nals.values()) + list(p.pps_nals.values()))
        segs.append((prefix + data[p.offset : end], n))
    return segs


def _count_pictures(data: bytes) -> int:
    n = 0
    in_pic = False
    for _, raw in _iter_nalus_offsets(data):
        nal = parse_nal_unit(raw)
        if nal.is_vcl:
            if not in_pic or _first_mb_is_zero(nal.rbsp):
                n += 1
                in_pic = True
        else:
            in_pic = False
    return n


class _SlotDecoder(ShardedDecoder):
    """Per-gop-slot decoder: entropy runs in this slot's thread; pixel
    reconstruction rendezvouses with the coordinator's lockstep device step."""

    def __init__(self, coord: "GopParallelDecoder", slot: int):
        super().__init__(coord.mesh, apply_deblock=coord.apply_deblock)
        self._coord = coord
        self._slot = slot

    def _reconstruct(self, ft, sps, pps, slices, ref_lists, weight_ctx, poc):
        n_refs = max(1, sps.max_num_ref_frames + 1)
        raw = self.build_inputs(
            ft, sps, pps, slices, ref_lists, weight_ctx, poc,
            n_refs=n_refs, has_pcm=True, s_pad=self._coord.s_pad,
        )
        qp_offs = (pps.chroma_qp_index_offset, pps.second_chroma_qp_index_offset)
        return self._coord.submit(
            self._slot, raw, (ft.mb_h, ft.mb_w, n_refs, qp_offs)
        )


class GopParallelDecoder:
    """Decode a multi-GOP stream with real data parallelism on the gop axis
    (plus row-band sharding within each frame, halo-exact for any stream)."""

    def __init__(self, mesh, apply_deblock: bool = True, s_pad: int = 8,
                 multihost: bool = False):
        self.mesh = mesh
        self.apply_deblock = apply_deblock
        self.G = mesh.shape["gop"]
        self.s_pad = s_pad
        self.multihost = multihost
        self._barrier_seq = 0
        if multihost:
            n_proc = jax.process_count()
            assert self.G % n_proc == 0, "gop axis must divide by processes"
            self.g_local = self.G // n_proc
            self.g0 = jax.process_index() * self.g_local
        else:
            self.g_local = self.G
            self.g0 = 0
        self._step = None
        self._geom = None
        self._cv = threading.Condition()
        self._waiting: dict[int, dict] = {}
        self._results: dict[int, tuple] = {}
        self._remaining: dict[int, int] = {}
        self._template: dict | None = None
        self._errors: list = []

    # ----------------------------------------------------------- lockstep

    def submit(self, slot: int, raw: dict, geom) -> tuple:
        with self._cv:
            # geometry rides with the submission (per-slot, not a shared
            # last-writer-wins field): _run_batches asserts every slot in a
            # batch agrees before applying one geometry to the whole stack
            self._waiting[slot] = (raw, geom)
            self._cv.notify_all()
            while slot not in self._results and not self._errors:
                self._cv.wait()
            if self._errors:
                raise RuntimeError("gop coordinator failed") from self._errors[0]
            return self._results.pop(slot)

    def _pad_tables(self, raws: dict[int, dict]):
        """Pad per-slot weight tables to a common (S, R) so they stack."""
        for k in _WEIGHT_KEYS:
            shapes = [r[k].shape for r in raws.values()]
            tgt = tuple(max(s[d] for s in shapes) for d in range(len(shapes[0])))
            for r in raws.values():
                if r[k].shape != tgt:
                    out = np.full(tgt, _TABLE_FILL[k], r[k].dtype)
                    sl = tuple(slice(0, s) for s in r[k].shape)
                    out[sl] = r[k]
                    r[k] = out

    def _run_batches(self, n_batches: int):
        """Main-thread loop: exactly n_batches lockstep device steps (the
        SAME count on every process — derived from the stream scan), each
        waiting for every local slot that still owes frames."""
        for _ in range(n_batches):
            with self._cv:
                while (
                    not self._errors
                    and any(
                        g not in self._waiting
                        for g, r in self._remaining.items()
                        if r > 0
                    )
                ):
                    self._cv.wait()
                if self._errors:
                    return
                raws = {g: r for g, (r, _) in self._waiting.items()}
                geoms = {g: gm for g, (_, gm) in self._waiting.items()}
                self._waiting.clear()
                for g in raws:
                    self._remaining[g] -= 1
                if raws:
                    uniq = set(geoms.values())
                    if len(uniq) != 1:
                        e = RuntimeError(
                            "gop slots disagree on frame geometry within a "
                            f"lockstep batch: {geoms} — a mid-stream SPS "
                            "geometry change is not batchable"
                        )
                        self._errors.append(e)
                        self._cv.notify_all()
                        raise e
                    geom = uniq.pop()
                else:
                    geom = self._geom_last
                self._geom_last = geom
            try:
                outs = self._step_batch(raws, geom)
            except Exception as e:  # propagate to the blocked slot threads
                with self._cv:
                    self._errors.append(e)
                    self._cv.notify_all()
                raise
            with self._cv:
                self._results.update(outs)
                self._cv.notify_all()

    def _globalize(self, key: str, local: np.ndarray):
        """One global device array from this process's local gop slice."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if key in _REPLICATED_KEYS:
            return jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, P()), local
            )
        spec = P("gop", *([None] * (local.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, spec), local
        )

    def _step_batch(self, raws: dict[int, dict], geom):
        mb_h, mb_w, n_refs, qp_offs = geom
        fresh_step = self._step is None or self._geom != geom
        if fresh_step:
            self._step = make_sharded_step(
                self.mesh, mb_h, mb_w, n_refs,
                apply_deblock=self.apply_deblock, qp_offsets=qp_offs,
                halo=True, has_l8=True, has_pcm=True,
            )
            self._geom = geom
        if self._template is None:
            any_raw = next(iter(raws.values()))
            self._template = {
                k: (
                    np.full_like(v, _TABLE_FILL[k])
                    if k in _WEIGHT_KEYS
                    else np.zeros_like(v)
                )
                for k, v in any_raw.items()
                if k not in _REPLICATED_KEYS
            }
        self._pad_tables(raws)
        any_raw = next(iter(raws.values())) if raws else None
        inp = {}
        local_slots = range(self.g0, self.g0 + self.g_local)
        for k in self._template.keys() | set(_REPLICATED_KEYS):
            if k in _REPLICATED_KEYS:
                v = (any_raw or self._template_repl)[k]
                if self.multihost:
                    inp[k] = self._globalize(k, np.asarray(v))
                else:
                    inp[k] = jnp.asarray(v)
                continue
            parts = []
            for g in local_slots:
                if g in raws:
                    parts.append(raws[g][k])
                else:  # exhausted slot: zero-work dummy frame
                    t = self._template[k]
                    if (
                        k in _WEIGHT_KEYS
                        and any_raw is not None
                        and t.shape != any_raw[k].shape
                    ):
                        t = np.full(any_raw[k].shape, _TABLE_FILL[k], t.dtype)
                    parts.append(t)
            stacked = np.stack(parts)
            inp[k] = self._globalize(k, stacked) if self.multihost else jnp.asarray(stacked)
        if any_raw is not None:
            self._template_repl = {k: any_raw[k] for k in _REPLICATED_KEYS}
        if self.multihost and fresh_step:
            # Compile the new executable on every rank FIRST (per-rank
            # duration is arbitrary — minutes on CPU dryruns), then
            # rendezvous on the coordination service (long gRPC deadline)
            # so all ranks ENTER the collective program together. The
            # per-executable CPU-collective (Gloo) communicator initializes
            # lazily inside the first execution with a ~30 s window that
            # compile-time skew otherwise blows (reproduced: the "flaky"
            # multihost dryrun tracked compile-cache state, not network
            # health). The jit call below re-resolves via the persistent
            # compile cache in seconds, keeping ranks inside the window.
            self._step.lower(inp).compile()
            coordination_barrier(f"h264_gop_step_ready_{self._barrier_seq}")
            self._barrier_seq += 1
        y, cb, cr = self._step(inp)
        if self.multihost:
            ys = _local_gop_planes(y)
            cbs = _local_gop_planes(cb)
            crs = _local_gop_planes(cr)
            return {g: (ys[g], cbs[g], crs[g]) for g in raws}
        y, cb, cr = np.asarray(y), np.asarray(cb), np.asarray(cr)
        return {g: (y[g - self.g0], cb[g - self.g0], cr[g - self.g0]) for g in raws}

    # ------------------------------------------------------------- driver

    def decode_stream(self, data: bytes) -> list[DecodedFrame]:
        segs = split_gops(data)
        G = self.G
        per_slot = [b"".join(s for s, _ in segs[g::G]) for g in range(G)]
        totals = [sum(n for _, n in segs[g::G]) for g in range(G)]
        # global lockstep schedule: the longest slot sets the batch count —
        # identical on every process because it derives from the same scan
        n_batches = max(totals) if totals else 0
        local_slots = [
            g
            for g in range(self.g0, self.g0 + self.g_local)
            if totals[g] > 0
        ]
        slot_frames: dict[int, list[DecodedFrame]] = {}
        self._remaining = {g: totals[g] for g in local_slots}
        self._errors.clear()
        self._results.clear()
        self._waiting.clear()
        self._geom_last = None

        def run(slot: int):
            try:
                dec = _SlotDecoder(self, slot)
                slot_frames[slot] = dec.decode_stream(per_slot[slot])
            except Exception as e:
                with self._cv:
                    self._errors.append(e)
                    self._remaining[slot] = 0
                    self._cv.notify_all()

        threads = [
            threading.Thread(target=run, args=(g,), daemon=True)
            for g in local_slots
        ]
        for t in threads:
            t.start()
        self._run_batches(n_batches)
        for t in threads:
            t.join()
        if self._errors:
            raise self._errors[0]
        # stream order: segment j was decoded by slot j % G as its
        # (j // G)-th IDR group; multihost processes return only local slots
        out: list[DecodedFrame] = []
        for j in range(len(segs)):
            if (j % G) in slot_frames:
                out.extend(
                    f for f in slot_frames[j % G] if f.idr_group == j // G
                )
        return out


def _local_gop_planes(arr) -> dict[int, np.ndarray]:
    """Assemble this process's gop frames from the addressable row shards of
    a global [G, H, W] array sharded P("gop", "row")."""
    by_gop: dict[int, dict[int, np.ndarray]] = {}
    for sh in arr.addressable_shards:
        g = sh.index[0].start or 0
        r = sh.index[1].start or 0
        by_gop.setdefault(g, {})[r] = np.asarray(sh.data)[0]
    return {
        g: np.concatenate([v for _, v in sorted(rows.items())])
        for g, rows in by_gop.items()
    }
