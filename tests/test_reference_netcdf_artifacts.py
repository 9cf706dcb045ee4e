"""Cross-validation against the reference's OWN NetCDF artifacts.

The reference commits ``src/{final,dense}_example.nc`` written by real
libnetcdf (output_series.cpp:18-124, main.cpp:796-818).  These tests open
those files with tiger_tpu's h5py-based IO layer and assert the dims/
coords/attrs our reader and writer assume — the cheapest possible proof
that the layer speaks genuine netcdf-c output, not just its own dialect.
"""

import h5py
import numpy as np
import pytest

import tiger_tpu.io.netcdf as tnc
from tiger_tpu.io.output import write_dense_netcdf, write_final_netcdf

FINAL = "final_example.nc"
DENSE = "dense_example.nc"


@pytest.fixture(scope="module")
def src(reference_dir):
    d = reference_dir / "src"
    if not (d / FINAL).exists():
        pytest.skip("reference .nc artifacts not present")
    return d


def test_final_example_structure(src):
    with h5py.File(src / FINAL, "r") as f:
        assert set(f.keys()) >= {"outputs", "system", "variable"}
        n_sys, n_var = f["outputs"].shape
        assert f["system"].shape == (n_sys,)
        assert f["variable"].shape == (n_var,)
        assert n_var == 5  # Model 204 state count
        assert f["system"].attrs["long_name"] == b"LinkID"
        assert f["variable"].attrs["long_name"] == b"state variable"
        vals = np.array(f["outputs"])
    assert np.isfinite(vals).all()


def test_dense_example_reads_through_netcdf_reader(src):
    """The windowed NetCDFReader (built for (time, lat, lon) forcing grids)
    must open any real libnetcdf 3-D variable and slice its leading dim —
    here (system, time, variable)."""
    r = tnc.NetCDFReader(str(src / DENSE), "outputs")
    try:
        assert (r.time_size, r.lat_size, r.lon_size) == (10, 2881, 5)
        chunk = r.load_time_chunk(0, 2)  # first two systems
        assert chunk.shape == (2, 2881, 5)
        assert np.isfinite(chunk).all()
    finally:
        r.close()
    with h5py.File(src / DENSE, "r") as f:
        t = np.array(f["time"])
        assert f["time"].attrs["units"] == b"minutes since start of simulation"
        assert t[0] == 0.0 and t[-1] == 2880.0
        np.testing.assert_allclose(np.diff(t), 1.0)


def test_writer_layout_matches_reference_artifacts(src, tmp_path):
    """Files produced by tiger_tpu's writers carry the same datasets, dims
    and declared attrs as the reference's libnetcdf output."""
    rng = np.random.default_rng(0)
    link_ids = np.arange(1, 11, dtype=np.int64)
    qt = np.arange(0.0, 2881.0)
    y_final = rng.uniform(size=(10, 5))
    dense = rng.uniform(size=(10, len(qt), 5)).astype(np.float64)

    ours_f = tmp_path / "final_ours.nc"
    ours_d = tmp_path / "dense_ours.nc"
    write_final_netcdf(str(ours_f), y_final, link_ids)
    write_dense_netcdf(str(ours_d), dense, link_ids, qt)

    for ref_name, ours in ((FINAL, ours_f), (DENSE, ours_d)):
        with h5py.File(src / ref_name, "r") as ref, h5py.File(ours, "r") as got:
            assert set(ref.keys()) <= set(got.keys()), (
                f"{ref_name}: reference datasets {set(ref.keys())} missing "
                f"from ours {set(got.keys())}"
            )
            for ds in ref.keys():
                assert got[ds].ndim == ref[ds].ndim, ds
                for attr in ("long_name", "units"):
                    if attr in ref[ds].attrs:
                        assert got[ds].attrs.get(attr) == ref[ds].attrs[attr], (
                            f"{ref_name}:{ds}:{attr}"
                        )
