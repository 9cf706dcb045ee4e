"""Two-process jax.distributed end-to-end: per-process shards == single run.

The reference's multi-rank story (mpirun -np N, rank-0 scatter, per-rank
output files, src/main.cpp:257-310 + 796-797) maps to: each process slices
its own row range, solves it on local devices, writes rank-tagged shards.
This launches TWO real `jax.distributed` CPU processes through the CLI and
checks the concatenated shards equal a single-process run — including the
cross-rank routed discharge (round-1 bug: topology was built per-slice,
dropping upstream contributions at the rank boundary).
"""

import socket
import subprocess
import sys

import h5py
import numpy as np
import pytest

from tests.test_cli import make_scenario


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _read(path, var="outputs"):
    with h5py.File(path) as f:
        return np.asarray(f[var])


def test_two_process_distributed_matches_single(tmp_path):
    sc = make_scenario(tmp_path)
    cfg = str(sc["cfg_path"])
    out = sc["tmp_path"] / "out"
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/local/bin:/usr/bin:/bin",
           "HOME": "/root"}

    # Single-process reference run.
    ref = subprocess.run(
        [sys.executable, "-m", "tiger_tpu.run", "--config", cfg, "--cpu"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert ref.returncode == 0, ref.stderr[-2000:]
    final_1p = _read(out / "final_basin_rank_0.nc")
    dense_1p = _read(out / "dense_basin_rank_0.nc")
    discharge_1p = _read(out / "discharge_basin_rank_0.nc", "discharge")

    # Two-process run into a fresh output dir.
    out2 = sc["tmp_path"] / "out2"
    cfg2_path = sc["tmp_path"] / "config2.yaml"
    cfg2_path.write_text(
        sc["cfg_path"].read_text().replace(str(out), str(out2))
    )
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tiger_tpu.run", "--config", str(cfg2_path),
             "--cpu", "--distributed", "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]

    # 6 systems -> rows 0-2 on rank 0, rows 3-5 on rank 1 (split_even).
    final_2p = np.concatenate(
        [_read(out2 / f"final_basin_rank_{r}.nc") for r in (0, 1)]
    )
    dense_2p = np.concatenate(
        [_read(out2 / f"dense_basin_rank_{r}.nc") for r in (0, 1)]
    )
    discharge_2p = np.concatenate(
        [_read(out2 / f"discharge_basin_rank_{r}.nc", "discharge") for r in (0, 1)]
    )
    link_2p = np.concatenate(
        [_read(out2 / f"final_basin_rank_{r}.nc", "system") for r in (0, 1)]
    )

    np.testing.assert_array_equal(link_2p, sc["streams"])
    np.testing.assert_array_equal(final_2p, final_1p)
    np.testing.assert_array_equal(dense_2p, dense_1p)
    # Routed discharge crosses the rank boundary (chain topology): the
    # accumulation must be the GLOBAL one, not per-slice.
    np.testing.assert_allclose(discharge_2p, discharge_1p, rtol=1e-12, atol=0)


def test_two_process_chunked_routed_matches_single(tmp_path):
    """Chunked (windowed) multi-process runs with routed discharge: each
    window's routing does a cross-rank allgather + FULL-topology accumulation
    (run.py's routed_fn — previously a NotImplementedError).  Concatenated
    2-process shards must equal a single-process chunked run exactly."""
    sc = make_scenario(tmp_path)
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/local/bin:/usr/bin:/bin",
           "HOME": "/root"}
    out = sc["tmp_path"] / "out"

    def chunked_cfg(path, outdir):
        text = sc["cfg_path"].read_text().replace(str(out), str(outdir))
        text = text.replace("time:", "time:\n  chunk_days: 1")
        path.write_text(text)

    cfg1 = sc["tmp_path"] / "config_c1.yaml"
    chunked_cfg(cfg1, sc["tmp_path"] / "outc1")
    ref = subprocess.run(
        [sys.executable, "-m", "tiger_tpu.run", "--config", str(cfg1), "--cpu"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert ref.returncode == 0, ref.stderr[-2000:]
    d1 = _read(sc["tmp_path"] / "outc1" / "discharge_basin_rank_0.nc", "discharge")
    dense1 = _read(sc["tmp_path"] / "outc1" / "dense_basin_rank_0.nc")

    cfg2 = sc["tmp_path"] / "config_c2.yaml"
    chunked_cfg(cfg2, sc["tmp_path"] / "outc2")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tiger_tpu.run", "--config", str(cfg2),
             "--cpu", "--distributed", "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]

    out2 = sc["tmp_path"] / "outc2"
    d2 = np.concatenate(
        [_read(out2 / f"discharge_basin_rank_{r}.nc", "discharge") for r in (0, 1)]
    )
    dense2 = np.concatenate(
        [_read(out2 / f"dense_basin_rank_{r}.nc") for r in (0, 1)]
    )
    np.testing.assert_array_equal(dense2, dense1)
    # Cross-rank chain topology, accumulated per window: must be global.
    # The default exchange is the ppermute ring (output.routed_exchange:
    # ring) — this run IS the sharded exchange vs the single-process oracle.
    np.testing.assert_allclose(d2, d1, rtol=1e-12, atol=0)

    # Allgather oracle at 2 processes: same discharge as the ring path.
    cfg3 = sc["tmp_path"] / "config_c3.yaml"
    chunked_cfg(cfg3, sc["tmp_path"] / "outc3")
    cfg3.write_text(
        cfg3.read_text().replace(
            "routed_discharge: true",
            "routed_discharge: true\n  routed_exchange: allgather",
        )
    )
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tiger_tpu.run", "--config", str(cfg3),
             "--cpu", "--distributed", "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]
    out3 = sc["tmp_path"] / "outc3"
    d3 = np.concatenate(
        [_read(out3 / f"discharge_basin_rank_{r}.nc", "discharge") for r in (0, 1)]
    )
    np.testing.assert_allclose(d3, d2, rtol=1e-12, atol=0)


def test_global_mesh_stiff_lanes(tmp_path):
    """Stiff systems under a cross-process GLOBAL mesh (previously refused
    with NotImplementedError): the stiff working set is replicated to every
    process (api._host_pull) and the pipeline runs redundantly-identically,
    so the SPMD merges stay consistent.  Two real jax.distributed processes,
    one CPU device each, one global 2-device mesh."""
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/local/bin:/usr/bin:/bin",
           "HOME": "/root", "PYTHONPATH": "."}
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/_global_mesh_stiff_worker.py",
             f"localhost:{port}", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (so[-500:], se[-2000:])
        assert "global-mesh stiff OK" in so
