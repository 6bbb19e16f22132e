"""Device mesh construction for multi-chip / multi-host decode.

Decoder-native parallel axes (SURVEY.md section 2.a):
  "gop"  — independent closed GOPs / streams (data parallelism; DCN-friendly)
  "row"  — macroblock tile-row bands within a frame (spatial/tensor
           parallelism; halo + DPB collectives ride ICI)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_gop: int | None = None, n_row: int | None = None) -> Mesh:
    devs = np.array(jax.devices())
    n = len(devs)
    if n_gop is None or n_row is None:
        # favor the row axis (intra-host ICI) over gop
        n_row = 1
        while n_row * 2 <= n and (n // (n_row * 2)) * (n_row * 2) == n:
            n_row *= 2
        n_row = min(n_row, n)
        n_gop = n // n_row
    assert n_gop * n_row <= n, f"mesh {n_gop}x{n_row} > {n} devices"
    return Mesh(
        devs[: n_gop * n_row].reshape(n_gop, n_row), axis_names=("gop", "row")
    )
