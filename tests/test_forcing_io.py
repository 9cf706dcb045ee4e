"""Forcing ingestion pipeline + params loader + output writers."""

import jax.numpy as jnp
import numpy as np
import pytest

from tiger_tpu import params as params_mod
from tiger_tpu.forcing import (
    ForcingSet,
    ForcingSpec,
    gather_forcings_column,
    load_forcings,
    remap_grid_to_systems,
)
from tiger_tpu.io import (
    LookupTable,
    NetCDFReader,
    write_dense_netcdf,
    write_final_netcdf,
    write_grid_forcing,
)


@pytest.fixture
def grid_files(tmp_path):
    """Synthesize ERA5-shaped pr (hourly) and t2m (daily) grids + lookup CSV."""
    rng = np.random.default_rng(3)
    n_lat, n_lon = 4, 6
    pr = rng.uniform(0, 0.002, (48, n_lat, n_lon)).astype(np.float32)
    t2m = rng.uniform(-5, 15, (2, n_lat, n_lon)).astype(np.float32)
    pr_path, t2m_path = str(tmp_path / "pr.nc"), str(tmp_path / "t2m.nc")
    write_grid_forcing(pr_path, "pr", pr)
    write_grid_forcing(t2m_path, "t2m", t2m)

    streams = np.array([101, 202, 303, 404])
    lat_idx = np.array([0, 1, 3, 2])
    lon_idx = np.array([5, 0, 2, 4])
    lookup_path = str(tmp_path / "lookup.csv")
    with open(lookup_path, "w") as f:
        f.write("stream,lat_index,lon_index\n")
        for s, la, lo in zip(streams, lat_idx, lon_idx):
            f.write(f"{s},{la},{lo}\n")
    return dict(
        pr=pr, t2m=t2m, pr_path=pr_path, t2m_path=t2m_path,
        lookup=lookup_path, streams=streams, lat_idx=lat_idx, lon_idx=lon_idx,
        n_lon=n_lon,
    )


def test_netcdf_roundtrip(grid_files):
    with NetCDFReader(grid_files["pr_path"], "pr") as rd:
        assert (rd.time_size, rd.lat_size, rd.lon_size) == grid_files["pr"].shape
        chunk = rd.load_time_chunk(5, 10)
        np.testing.assert_array_equal(chunk, grid_files["pr"][5:15])
        with pytest.raises(IndexError):
            rd.load_time_chunk(47, 5)


def test_lookup_and_remap(grid_files):
    lut = LookupTable.load(grid_files["lookup"])
    flat = lut.flat_index(grid_files["streams"], grid_files["n_lon"])
    expect = grid_files["lat_idx"] * grid_files["n_lon"] + grid_files["lon_idx"]
    np.testing.assert_array_equal(flat, expect)
    remapped = remap_grid_to_systems(grid_files["pr"], flat)
    for s in range(4):
        np.testing.assert_array_equal(
            remapped[:, s],
            grid_files["pr"][:, grid_files["lat_idx"][s], grid_files["lon_idx"][s]],
        )
    with pytest.raises(KeyError):
        lut.flat_index(np.array([999]), grid_files["n_lon"])


def test_load_forcings_end_to_end(grid_files):
    specs = [
        ForcingSpec(grid_files["pr_path"], "pr", 1.0),
        ForcingSpec(grid_files["t2m_path"], "t2m", 24.0),
    ]
    fs = load_forcings(specs, grid_files["streams"], grid_files["lookup"], duration_days=2.0)
    assert fs.meta.n_steps == (48, 2)
    assert fs.meta.dt_min == (60.0, 1440.0)
    assert fs.data.shape == (50, 4)

    # Zero-order-hold gather semantics (rk45_kernel.cu:90-110): floor + clamp.
    col = fs.data[:, 2]
    la, lo = grid_files["lat_idx"][2], grid_files["lon_idx"][2]
    for t, i_pr, i_t2m in [(0.0, 0, 0), (59.9, 0, 0), (60.0, 1, 0), (1439.9, 23, 0),
                           (1440.0, 24, 1), (1e9, 47, 1), (-5.0, 0, 0)]:
        vals = np.asarray(gather_forcings_column(col, fs.meta, jnp.float64(t)))
        assert vals[0] == grid_files["pr"][i_pr, la, lo], t
        assert vals[1] == grid_files["t2m"][i_t2m, la, lo], t


def test_spatial_params_loader_small_test_csv():
    p = params_mod.load_spatial_params("/root/reference/data/small_test.csv")
    assert params_mod.num_systems(p) == 10
    raw = np.loadtxt(
        "/root/reference/data/small_test.csv", delimiter=",", skiprows=1, ndmin=2
    )
    with open("/root/reference/data/small_test.csv") as f:
        header = f.readline().strip().split(",")
    col = {name: raw[:, i] for i, name in enumerate(header)}
    # Unit conversions (parameters_loader.cpp:57-101).
    c1 = 0.001 / 60.0
    np.testing.assert_allclose(p["infil"], col["i2"] * c1)
    np.testing.assert_allclose(p["perco"], col["i3"] * c1)
    np.testing.assert_allclose(p["alpha3"], col["res_ss"] * 1440.0)
    np.testing.assert_allclose(p["alpha4"], col["res_gw"] * 1440.0)
    np.testing.assert_allclose(p["n_mann"], col["n"])
    np.testing.assert_allclose(p["L"], col["length_km"])
    np.testing.assert_allclose(p["A_h"], col["drainage_area_km2"])
    np.testing.assert_array_equal(p["stream"], col["stream"].astype(np.int64))
    # Model-facing dict has exactly the RHS fields.
    from tiger_tpu.models.model204 import PARAM_FIELDS
    assert set(params_mod.model_params(p)) == set(PARAM_FIELDS)


def test_output_writers_roundtrip(tmp_path):
    import h5py

    y_final = np.arange(12, dtype=np.float64).reshape(3, 4)
    dense = np.arange(24, dtype=np.float64).reshape(3, 2, 4)
    qt = np.array([60.0, 120.0])
    links = np.array([11, 22, 33])
    fpath, dpath = str(tmp_path / "final.nc"), str(tmp_path / "dense.nc")
    write_final_netcdf(fpath, y_final, links, compression_level=2)
    write_dense_netcdf(dpath, dense, qt, links, compression_level=2)
    with h5py.File(fpath) as f:
        np.testing.assert_array_equal(f["outputs"][:], y_final)
        np.testing.assert_array_equal(f["system"][:], links)
        assert f["system"].attrs["long_name"] == b"LinkID"
    with h5py.File(dpath) as f:
        np.testing.assert_array_equal(f["outputs"][:], dense)
        np.testing.assert_array_equal(f["time"][:], qt)
        assert f["time"].attrs["units"] == b"minutes since start of simulation"


def test_dense_csv_format(tmp_path):
    from tiger_tpu.io import write_dense_csv, write_final_csv

    dense = np.array([[[1.23456789, 2.0], [3.0, 4.0]]])  # [1, 2, 2]
    path = str(tmp_path / "d.csv")
    write_dense_csv(path, dense, np.array([0.0, 60.0]))
    lines = open(path).read().splitlines()
    assert lines[0] == "time,var0_sys0,var1_sys0"
    assert lines[1].startswith("0.00000000,1.23456789,2")
    fpath = str(tmp_path / "f.csv")
    write_final_csv(fpath, np.array([[1.0, 2.0, 3.0, 4.0, 5.0]]))
    assert open(fpath).read().splitlines()[0] == "h_snow,var1,var2,var3,var4"


@pytest.mark.parity
def test_csv_format_matches_204_artifacts(tmp_path, reference_dir):
    """Our legacy CSV writers reproduce the committed artifacts' exact
    header and number-formatting conventions (main.cpp:734-773)."""
    from tiger_tpu.io import write_dense_csv, write_final_csv

    ref_dense = (reference_dir / "src" / "dense_204_a.csv").read_text().splitlines()
    ref_final = (reference_dir / "src" / "final_204_a.csv").read_text().splitlines()

    dense = np.zeros((5, 2, 5))
    dense[0, 1] = [7.960133076, 177.016677674, 14.936870986, 4.898862287, 0.201160199]
    write_dense_csv(str(tmp_path / "d.csv"), dense, np.array([0.0, 60.0]))
    ours = (tmp_path / "d.csv").read_text().splitlines()
    assert ours[0] == ref_dense[0]  # header: time,var0_sys0,...
    # Formatting: fixed-8-decimal time, 9-significant-digit values.
    assert ours[1].split(",")[0] == "0.00000000"
    assert ours[2].split(",")[0] == "60.00000000"
    assert ours[2].split(",")[1] == "7.96013308"[:10]  # 9 sig digits

    write_final_csv(str(tmp_path / "f.csv"), np.zeros((2, 5)))
    ours_f = (tmp_path / "f.csv").read_text().splitlines()
    assert ours_f[0] == ref_final[0]  # h_snow,var1,var2,var3,var4


def test_netcdf_writer_dtype_modes(tmp_path):
    """None preserves input precision; explicit dtype slab-converts."""
    import h5py

    from tiger_tpu.io import write_dense_netcdf

    dense = np.arange(30, dtype=np.float32).reshape(3, 2, 5)
    qt = np.array([60.0, 120.0])
    links = np.array([7, 8, 9])
    p32 = str(tmp_path / "d32.nc")
    p64 = str(tmp_path / "d64.nc")
    write_dense_netcdf(p32, dense, qt, links)
    write_dense_netcdf(p64, dense, qt, links, dtype=np.float64)
    with h5py.File(p32) as f:
        assert f["outputs"].dtype == np.float32
    with h5py.File(p64) as f:
        assert f["outputs"].dtype == np.float64
        np.testing.assert_allclose(f["outputs"][...], dense)


def test_dense_netcdf_packed_roundtrip(tmp_path):
    """CF int16 packing: decode error < scale/2, NaN -> _FillValue,
    constant and all-NaN states survive, xarray-convention attrs present."""
    import h5py

    from tiger_tpu.io import write_dense_netcdf_packed

    rng = np.random.default_rng(3)
    dense = np.empty((6, 4, 4), np.float32)
    dense[:, :, 0] = rng.uniform(-1e-9, 5e-9, (6, 4))   # tiny range
    dense[:, :, 1] = rng.uniform(0.0, 1.8e4, (6, 4))    # big range
    dense[:, :, 2] = 0.25                               # constant
    dense[:, :, 3] = np.nan                             # all-NaN
    dense[1, 2, 1] = np.nan                             # isolated NaN
    qt = np.arange(1, 5) * 60.0
    links = np.arange(101, 107)
    path = str(tmp_path / "packed.nc")
    write_dense_netcdf_packed(path, dense, qt, links)

    with h5py.File(path) as f:
        for v in range(4):
            ds = f[f"outputs_{v}"]
            assert ds.dtype == np.int16 and ds.shape == (6, 4)
            scale = float(ds.attrs["scale_factor"])
            offset = float(ds.attrs["add_offset"])
            fill = int(ds.attrs["_FillValue"])
            raw = ds[...]
            dec = np.where(raw == fill, np.nan, raw * scale + offset)
            ref = dense[:, :, v]
            assert np.array_equal(np.isnan(dec), np.isnan(ref))
            ok = ~np.isnan(ref)
            if ok.any():
                span = np.nanmax(ref) - np.nanmin(ref)
                tol = max(span, 1e-30) / 65532.0 * 0.51 + 1e-12
                np.testing.assert_allclose(dec[ok], ref[ok], atol=tol, rtol=0)


def test_from_grid_series_matches_host_remap(grid_files):
    """Device-side remap (from_grid_series) is bitwise the host remap path."""
    from tiger_tpu.forcing import ForcingSet

    rng = np.random.default_rng(3)
    n_lat, n_lon = grid_files["pr"].shape[1:]
    flat = rng.integers(0, n_lat * n_lon, 17)
    host = ForcingSet.from_series(
        [
            remap_grid_to_systems(grid_files["pr"], flat),
            remap_grid_to_systems(grid_files["t2m"], flat),
        ],
        [60.0, 1440.0],
    )
    dev = ForcingSet.from_grid_series(
        [
            grid_files["pr"].reshape(grid_files["pr"].shape[0], -1),
            grid_files["t2m"].reshape(grid_files["t2m"].shape[0], -1),
        ],
        flat,
        [60.0, 1440.0],
    )
    assert dev.meta == host.meta
    np.testing.assert_array_equal(np.asarray(dev.data), np.asarray(host.data))


def test_per_forcing_lookup_different_grids(tmp_path):
    """pr and t2m on grids of different resolution, each with its own lookup
    CSV (the reference's pr_lookup/t2m_lookup pair, main.cpp:494-505)."""
    import jax.numpy as jnp

    from tiger_tpu.chunked import netcdf_window_loader
    from tiger_tpu.forcing import ForcingSpec, load_forcings

    rng = np.random.default_rng(11)
    pr = rng.uniform(0, 0.002, (48, 4, 6)).astype(np.float32)
    t2m = rng.uniform(-5, 15, (2, 2, 3)).astype(np.float32)
    write_grid_forcing(str(tmp_path / "pr.nc"), "pr", pr)
    write_grid_forcing(str(tmp_path / "t2m.nc"), "t2m", t2m)

    streams = np.array([7, 14, 21])
    pr_ll = np.array([[0, 5], [3, 2], [1, 1]])
    t2m_ll = np.array([[0, 0], [1, 2], [0, 1]])
    for name, ll in (("pr_lookup.csv", pr_ll), ("t2m_lookup.csv", t2m_ll)):
        with open(tmp_path / name, "w") as f:
            f.write("stream,lat_index,lon_index\n")
            for s, (la, lo) in zip(streams, ll):
                f.write(f"{s},{la},{lo}\n")

    specs = [
        ForcingSpec(str(tmp_path / "pr.nc"), "pr", 1.0,
                    lookup=str(tmp_path / "pr_lookup.csv")),
        ForcingSpec(str(tmp_path / "t2m.nc"), "t2m", 24.0,
                    lookup=str(tmp_path / "t2m_lookup.csv")),
    ]
    # Run-level lookup deliberately wrong for both grids; per-spec wins.
    fs = load_forcings(specs, streams, str(tmp_path / "pr_lookup.csv"))
    data = np.asarray(fs.data)
    np.testing.assert_array_equal(data[:48], pr[:, pr_ll[:, 0], pr_ll[:, 1]])
    np.testing.assert_array_equal(data[48:], t2m[:, t2m_ll[:, 0], t2m_ll[:, 1]])

    loader = netcdf_window_loader(specs, streams, str(tmp_path / "pr_lookup.csv"))
    w = loader(0.0, 1440.0)
    np.testing.assert_array_equal(np.asarray(w.data)[:24], data[:24])
    np.testing.assert_array_equal(np.asarray(w.data)[24], data[48])


def test_out_of_grid_lookup_fails_loudly(tmp_path, grid_files):
    """Lookup rows outside the grid must raise, not silently clip (the
    device gather would otherwise feed the wrong cell's forcing)."""
    from tiger_tpu.forcing import ForcingSpec, load_forcings

    with open(tmp_path / "bad_lookup.csv", "w") as f:
        f.write("stream,lat_index,lon_index\n101,0,0\n202,9,5\n")
    specs = [ForcingSpec(grid_files["pr_path"], "pr", 1.0)]
    with pytest.raises(ValueError, match="outside the .*-cell grid"):
        load_forcings(specs, np.array([101, 202]), str(tmp_path / "bad_lookup.csv"))


def test_missing_cell_lookup_fails_loudly(tmp_path):
    """A lookup mapping a link onto a _FillValue (ocean) cell must raise."""
    from tiger_tpu.forcing import ForcingSpec, load_forcings
    from tiger_tpu.io import NetCDFReader

    pr = np.random.default_rng(0).uniform(0, 1, (4, 2, 3)).astype(np.float32)
    pr[:, 1, 2] = -9999.0
    write_grid_forcing(str(tmp_path / "pr.nc"), "pr", pr,
                       attrs={"_FillValue": np.float32(-9999.0)})
    with NetCDFReader(str(tmp_path / "pr.nc"), "pr") as rd:
        chunk = rd.load_time_chunk(0, 4)
    assert np.isnan(chunk[:, 1, 2]).all()  # unpacked fill -> NaN

    with open(tmp_path / "lookup.csv", "w") as f:
        f.write("stream,lat_index,lon_index\n1,0,0\n2,1,2\n")
    specs = [ForcingSpec(str(tmp_path / "pr.nc"), "pr", 1.0)]
    with pytest.raises(ValueError, match="missing"):
        load_forcings(specs, np.array([1, 2]), str(tmp_path / "lookup.csv"))


def test_lookup_rejects_out_of_axis_indices(tmp_path):
    """lon_index >= lon_size must raise, not alias into the next grid row."""
    from tiger_tpu.io.lookup import LookupTable

    with open(tmp_path / "lk.csv", "w") as f:
        f.write("stream,lat_index,lon_index\n1,0,0\n2,0,7\n")
    lut = LookupTable.load(str(tmp_path / "lk.csv"))
    with pytest.raises(ValueError, match="lon_index outside"):
        lut.flat_index(np.array([1, 2]), lon_size=5)
    # Within bounds: fine.
    np.testing.assert_array_equal(
        lut.flat_index(np.array([1, 2]), lon_size=8), [0, 7]
    )
