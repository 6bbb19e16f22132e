"""Multi-host runtime: jax.distributed initialization + the global mesh.

GOP data parallelism maps across hosts over DCN (closed GOPs exchange
nothing during decode; only the work assignment and the output gather touch
the network), while the "row" axis stays intra-host on ICI. Collectives are
XLA's (Gloo on CPU dryruns, ICI/DCN transports on real pods) — there is no
hand-rolled NCCL/MPI layer to maintain (SURVEY.md section 2.a).

Dryrun shape (tests/test_dist.py): two processes, each with N virtual CPU
devices, form a ("gop" x "row") mesh whose gop axis spans the processes;
each process entropy-decodes its own GOPs and the SPMD step runs in
deterministic lockstep (dist/gop.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize behind one call. Arguments fall back to
    the H264_TPU_COORDINATOR / H264_TPU_NPROCS / H264_TPU_PROC env vars; on
    real TPU pods all three are auto-detected and may stay None."""
    coordinator_address = coordinator_address or os.environ.get(
        "H264_TPU_COORDINATOR"
    )
    if num_processes is None and "H264_TPU_NPROCS" in os.environ:
        num_processes = int(os.environ["H264_TPU_NPROCS"])
    if process_id is None and "H264_TPU_PROC" in os.environ:
        process_id = int(os.environ["H264_TPU_PROC"])
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_global_mesh(n_row: int | None = None) -> Mesh:
    """("gop", "row") mesh over ALL processes' devices: gop spans processes
    (DCN), row spans each process's local devices (ICI)."""
    n_proc = jax.process_count()
    devs = np.array(jax.devices())
    n_local = len(devs) // n_proc
    if n_row is None:
        n_row = n_local
    assert n_local % n_row == 0, (n_local, n_row)
    gop_per_proc = n_local // n_row
    # order devices so the gop axis is process-major: slot p*g+i lives
    # entirely on process p's devices
    by_proc = sorted(devs, key=lambda d: (d.process_index, d.id))
    grid = np.array(by_proc).reshape(n_proc * gop_per_proc, n_row)
    mesh = Mesh(grid, axis_names=("gop", "row"))
    if n_proc > 1:
        # Establish the collective transport NOW with a trivial barrier.
        # The transport clique (Gloo on CPU) initializes lazily at the
        # FIRST collective, with a ~30 s rendezvous deadline — if that
        # first collective sits behind the multi-minute frame-pipeline
        # compile, per-rank compile-time variance blows the window and the
        # whole run dies with "Gloo context initialization failed /
        # GetKeyValue timed out" (reproduced; the flake tracked compile
        # cache state, not network health). A tiny all-device sync
        # compiles in seconds on every rank, so the clique forms while
        # ranks are still closely synchronized.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("h264_collective_warmup")
    return mesh


def coordination_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Rendezvous all processes on the coordination service (gRPC, long
    deadline) — unlike data-plane collectives, this tolerates arbitrary
    per-rank skew (e.g. compile-time variance). No-op single-process."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
