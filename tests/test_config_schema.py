"""Round-2 config-schema completion (VERDICT Missing #2):

folder_nc forcing discovery, positional local_params.columns, global_params,
doy anchored to time.start — capped by running the reference's OWN
data/config.yaml (paths/dates adjusted, nothing else) end to end.
"""

import numpy as np
import pytest

from tiger_tpu.config import load_config
from tiger_tpu.io import write_grid_forcing


def _write_forcing_folder(tmp_path, pr_name="pr", t2m_name="t2m", n_sys=4):
    rng = np.random.default_rng(5)
    pr = rng.uniform(0, 0.0015, (48, 1, n_sys)).astype(np.float32)
    t2m = rng.uniform(2, 10, (2, 1, n_sys)).astype(np.float32)
    write_grid_forcing(
        str(tmp_path / "precip_file.nc"), pr_name, pr,
        time_vals=np.arange(48, dtype=np.float64),
        time_attrs={"units": "hours since 2021-01-01 00:00:00"},
    )
    write_grid_forcing(
        str(tmp_path / "temp_file.nc"), t2m_name, t2m,
        time_vals=np.arange(2, dtype=np.float64),
        time_attrs={"units": "days since 2021-01-01"},
    )
    with open(tmp_path / "lookup.csv", "w") as f:
        f.write("stream,lat_index,lon_index\n")
        for i in range(n_sys):
            f.write(f"{i + 1},0,{i}\n")
    return pr, t2m


def test_folder_nc_discovery(tmp_path):
    from tiger_tpu.forcing import discover_forcings

    _write_forcing_folder(tmp_path)
    specs = discover_forcings(str(tmp_path), ["pr", "t2m"])
    assert specs[0].var == "pr" and specs[0].dt_hours == 1.0
    assert specs[0].path.endswith("precip_file.nc")
    assert specs[1].var == "t2m" and specs[1].dt_hours == 24.0

    with pytest.raises(FileNotFoundError, match="forcings.files"):
        discover_forcings(str(tmp_path), ["nope"])


def test_discovery_rejects_ambiguity_and_missing_units(tmp_path):
    from tiger_tpu.forcing import discover_forcings

    _write_forcing_folder(tmp_path)
    # Second file with the same variable name -> ambiguous.
    pr2 = np.zeros((4, 1, 4), np.float32)
    write_grid_forcing(
        str(tmp_path / "dup.nc"), "pr", pr2,
        time_vals=np.arange(4.0), time_attrs={"units": "hours since 2021-01-01"},
    )
    with pytest.raises(ValueError, match="multiple"):
        discover_forcings(str(tmp_path), ["pr"])
    (tmp_path / "dup.nc").unlink()
    # No time units -> actionable error.
    write_grid_forcing(str(tmp_path / "nounits.nc"), "raw", pr2)
    with pytest.raises(ValueError, match="dt_hours explicitly"):
        discover_forcings(str(tmp_path), ["raw"])


def test_positional_columns_match_named_loading(tmp_path):
    from tiger_tpu import params as pm

    named = pm.load_spatial_params("/root/reference/data/small_test.csv")
    # Re-write the same table headerless in canonical positional order.
    order = ("stream", "next_stream") + pm.POSITIONAL_ORDER
    cols = pm._load_csv_numpy("/root/reference/data/small_test.csv")
    with open(tmp_path / "pos.csv", "w") as f:
        for r in range(len(cols["stream"])):
            f.write(",".join(str(cols[c][r]) for c in order) + "\n")
    pos = pm.load_spatial_params(
        str(tmp_path / "pos.csv"),
        columns={"stream_id": 0, "next_stream_id": 1, "params_start": 2,
                 "num_params": 16},
    )
    for k in named:
        np.testing.assert_allclose(pos[k], named[k], rtol=1e-12)

    # num_params=15 drops the trailing t_thres column -> defaults to 0.
    pos15 = pm.load_spatial_params(
        str(tmp_path / "pos.csv"),
        columns={"stream_id": 0, "next_stream_id": 1, "params_start": 2,
                 "num_params": 15},
    )
    np.testing.assert_array_equal(pos15["temp_thr"], 0.0)


def test_doy_anchored_to_time_start():
    import jax.numpy as jnp

    from tiger_tpu.models import get_model

    m_jan = get_model(200)  # doy0 default 1.0
    m_jul = get_model(200, doy0=182.0)
    assert m_jul.doy0 == 182.0
    params = {k: jnp.full((1,), v) for k, v in {
        "Hu": 0.5, "infil": 1e-6, "n_mann": 0.03, "slope": 0.05, "L": 1.0,
        "A_h": 10.0, "alpha3": 2880.0, "alpha4": 7200.0, "melt_f": 1e-4,
        "temp_thr": 0.0, "sw": 0.2, "ss": 0.8, "lat": 45.0, "perco": 1e-7,
        "c1": 0.001 / 60.0,
    }.items()}
    y = tuple(jnp.full((1,), v) for v in (0.0, 0.3, 0.0, 1.0, 0.1))
    forc = (jnp.full((1,), 1e-4), jnp.full((1,), 15.0))
    d_jan = m_jan.rhs_tuple(0.0, y, params, forc)
    d_jul = m_jul.rhs_tuple(0.0, y, params, forc)
    # Hamon PET (daylight hours) differs strongly between Jan 1 and Jul 1 at
    # 45N -> static-store tendency must differ.
    assert abs(float(d_jan[1][0]) - float(d_jul[1][0])) > 1e-9
    # doy0 is ignored by models without the field (silently dropped).
    assert get_model(204, doy0=182.0).UID == 204


def test_reference_config_yaml_runs_adjusted(tmp_path):
    """The reference's own data/config.yaml, with ONLY paths and dates
    adjusted (plus an output dir), loads and runs end to end: hot start from
    a generated checkpoint, positional params columns, folder_nc discovery
    with its PRCP/Tair var names, global_params, mpi block, states subset."""
    import h5py

    from tiger_tpu.run import run

    n_sys = 4
    _write_forcing_folder(tmp_path, pr_name="PRCP", t2m_name="Tair", n_sys=n_sys)
    # Positional params CSV: stream, next, then 15 physics columns (t_thres
    # dropped by num_params: 15 -> defaults 0).
    rng = np.random.default_rng(7)
    with open(tmp_path / "stream_params.csv", "w") as f:
        for i in range(n_sys):
            nxt = i + 2 if i < n_sys - 1 else -1
            row = [i + 1, nxt, 10 + i, 1.0, 0.0, 0.0, 41.5, 0.4, 5.0, 2.0,
                   0.2, 0.8, 0.03, 0.05, 2.0, 5.0, 1e-4]
            f.write(",".join(str(v) for v in row) + "\n")

    ref_text = open("/root/reference/data/config.yaml").read()
    adjusted = (
        ref_text
        .replace('"2021-10-01T00:00:00"', '"2021-01-03T00:00:00"')  # 2-day run
        .replace('"inits/inicond_204.uini"', f'"{tmp_path}/state0.nc"')
        .replace('"params/stream_params.csv"', f'"{tmp_path}/stream_params.csv"')
        .replace('"/data/forcings/2021"', f'"{tmp_path}"')
        .replace('"forcings_lookup.csv"', f'"{tmp_path}/lookup.csv"')
    )
    # Only addition: an output location (the reference hard-codes CWD paths).
    adjusted += f'\n# test output dir\n'
    adjusted = adjusted.replace(
        'print_interval: "1h"', f'print_interval: "1h"\n  path: "{tmp_path}/out"'
    )
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(adjusted)

    cfg = load_config(str(cfg_path))
    assert cfg.model.uid == 204
    assert cfg.initial.mode == "hot"
    assert cfg.params_columns["num_params"] == 15
    assert cfg.global_params == {"foo": 0.0}
    assert cfg.output.states == [0, 1, 2, 3, 4]

    # Generate the hot-start state: cold 1-day run of the same scenario.
    cold = load_config(str(cfg_path))
    cold.initial.mode = "cold"
    cold.initial.file = ""
    cold.output.path = str(tmp_path / "cold_out")
    import datetime as dt

    cold.time.end = cold.time.start + dt.timedelta(days=1)
    summary0 = run(cold, use_mesh=False)
    import shutil

    shutil.copy(summary0["state_path"], tmp_path / "state0.nc")

    summary = run(load_config(str(cfg_path)), use_mesh=False)
    assert summary["num_systems"] == n_sys
    with h5py.File(f"{tmp_path}/out/final_example_rank_0.nc") as f:
        y_final = np.asarray(f["outputs"])
        assert y_final.shape == (n_sys, 5)
        assert np.isfinite(y_final).all()
    # Hot start: dense t0 row equals the day-1 checkpoint state.
    with h5py.File(tmp_path / "state0.nc") as f:
        day1 = np.asarray(f["outputs"])
    with h5py.File(f"{tmp_path}/out/dense_example_rank_0.nc") as f:
        np.testing.assert_allclose(np.asarray(f["outputs"])[:, 0, :], day1)


def test_config_validation_rejects_bad_inputs(tmp_path):
    import pytest

    from tiger_tpu.config import load_config, parse_interval_minutes

    # Interval units: bare-letter units take no plural (500ms != 500 min).
    with pytest.raises(ValueError):
        parse_interval_minutes("500ms")
    with pytest.raises(ValueError):
        parse_interval_minutes("0h")
    assert parse_interval_minutes("2 hours") == 120.0

    def write(cfg_text):
        p = tmp_path / "c.yaml"
        p.write_text(cfg_text)
        return str(p)

    base = """
model: {uid: 204}
local_params: {file: x.csv}
"""
    with pytest.raises(ValueError, match="must be after"):
        load_config(write(base + """
time: {start: "2021-01-03T00:00:00", end: "2021-01-01T00:00:00"}
"""))
    with pytest.raises(ValueError, match="requires initial.file"):
        load_config(write(base + """
time: {start: "2021-01-01T00:00:00", end: "2021-01-02T00:00:00"}
initial: {mode: hot}
"""))
    with pytest.raises(ValueError, match="solver.method"):
        load_config(write(base + """
time: {start: "2021-01-01T00:00:00", end: "2021-01-02T00:00:00"}
solver: {method: Radau}
"""))
    with pytest.raises(ValueError, match="routed_exchange"):
        load_config(write(base + """
time: {start: "2021-01-01T00:00:00", end: "2021-01-02T00:00:00"}
output: {routed_discharge: true, routed_exchange: broadcast}
"""))
