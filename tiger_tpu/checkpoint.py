"""Checkpoint / hot-start support.

The reference *specifies* cold/hot initial conditions in its config schema
(config_loader.hpp:20-23, data/config.yaml initial.mode) but never implements
them.  Here: cold start = common y0 vector broadcast over systems (the
reference's hard-coded y0_common, main.cpp:377); hot start = restore the full
[S, N] state from a state file, which doubles as checkpoint/resume.

State files use the final-state NetCDF layout (system, variable) plus a
``sim_time_minutes`` attribute, so a run's final output can be fed back as the
next run's hot start.
"""

from __future__ import annotations

from typing import Optional, Tuple

import h5py
import numpy as np

from tiger_tpu.io.output import write_final_netcdf


def save_state(path: str, y: np.ndarray, link_ids: np.ndarray, sim_time_minutes: float) -> None:
    """Write a hot-start/checkpoint state file ATOMICALLY.

    Periodic checkpoints overwrite the previous one; writing in place would
    destroy the only resume point exactly when a crash lands mid-write
    (the event checkpoints exist for).  Write to a sibling temp file and
    ``os.replace`` it over the target.
    """
    import os

    tmp = path + ".tmp"
    write_final_netcdf(tmp, np.asarray(y), np.asarray(link_ids))
    with h5py.File(tmp, "a") as f:
        f.attrs["sim_time_minutes"] = float(sim_time_minutes)
        f.flush()
    # fsync the data BEFORE the rename: on ext4/xfs the rename can become
    # durable while the file contents are still in the page cache, which on
    # power loss leaves a truncated file atomically renamed over the only
    # resume point.
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp, path)


def load_state(
    path: str, link_ids: Optional[np.ndarray] = None, require_time: bool = False
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Read (y [S, N], link_ids [S], sim_time_minutes) from a state file.

    If ``link_ids`` is given, rows are re-ordered to match it (a hot start may
    use a subset/permutation of the checkpointed basin, e.g. when the shard
    layout changed between runs); missing links raise.  ``require_time``
    (crash resume): a file WITHOUT the sim_time_minutes attribute is not a
    resumable checkpoint (e.g. a plain final_*.nc) — raise instead of
    silently defaulting to t=0 and re-running the whole span.
    """
    with h5py.File(path, "r") as f:
        y = np.asarray(f["outputs"], np.float64)
        ids = np.asarray(f["system"], np.int64)
        if require_time and "sim_time_minutes" not in f.attrs:
            raise ValueError(
                f"{path} has no sim_time_minutes attribute — it is a plain "
                "state/final file, not a resumable checkpoint"
            )
        t = float(f.attrs.get("sim_time_minutes", 0.0))
    if link_ids is not None:
        link_ids = np.asarray(link_ids, np.int64)
        order = np.argsort(ids, kind="stable")
        pos = np.searchsorted(ids[order], link_ids)
        pos = np.clip(pos, 0, len(ids) - 1)
        found = ids[order][pos] == link_ids
        if not found.all():
            raise KeyError(f"Hot-start file missing links: {link_ids[~found][:10]}")
        y = y[order][pos]
        ids = link_ids
    return y, ids, t


def cold_state(y0_common, num_systems: int) -> np.ndarray:
    """Broadcast a per-variable cold-start vector over the basin."""
    y0 = np.asarray(y0_common, np.float64)
    return np.tile(y0, (num_systems, 1))
