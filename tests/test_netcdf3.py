"""Classic NetCDF3 reading + CF int16 packing (scale_factor/add_offset)."""

import numpy as np
import pytest

from tiger_tpu.io import NetCDFReader, write_grid_forcing


@pytest.fixture
def classic_file(tmp_path):
    from scipy.io import netcdf_file

    rng = np.random.default_rng(7)
    data = rng.uniform(0, 0.002, (6, 3, 4)).astype(np.float32)
    path = str(tmp_path / "classic.nc")
    f = netcdf_file(path, "w")
    f.createDimension("time", None)
    f.createDimension("lat", 3)
    f.createDimension("lon", 4)
    v = f.createVariable("pr", "f", ("time", "lat", "lon"))
    v[:] = data
    f.close()
    assert open(path, "rb").read(3) == b"CDF"
    return path, data


def test_classic_windowed_read(classic_file):
    path, data = classic_file
    with NetCDFReader(path, "pr") as rd:
        assert (rd.time_size, rd.lat_size, rd.lon_size) == (6, 3, 4)
        np.testing.assert_allclose(rd.load_time_chunk(2, 3), data[2:5], rtol=1e-7)
        with pytest.raises(IndexError):
            rd.load_time_chunk(5, 3)
        with pytest.raises(KeyError):
            NetCDFReader(path, "nope")


def test_packed_era5_style_variable(tmp_path):
    # int16-packed variable with scale/offset and a fill value, NETCDF4 side.
    import h5py

    rng = np.random.default_rng(8)
    true = rng.uniform(250.0, 300.0, (4, 2, 3))
    scale, offset = 0.01, 275.0
    packed = np.round((true - offset) / scale).astype(np.int16)
    packed[0, 0, 0] = -32767  # fill
    path = str(tmp_path / "packed.nc")
    with h5py.File(path, "w") as f:
        ds = f.create_dataset("t2m", data=packed)
        ds.attrs["scale_factor"] = np.float64(scale)
        ds.attrs["add_offset"] = np.float64(offset)
        ds.attrs["_FillValue"] = np.int16(-32767)
    with NetCDFReader(path, "t2m") as rd:
        out = rd.load_time_chunk(0, 4)
        assert np.isnan(out[0, 0, 0])
        mask = ~np.isnan(out)
        np.testing.assert_allclose(
            out[mask], (packed.astype(np.float64) * scale + offset)[mask], rtol=1e-6
        )


def test_forcing_loader_accepts_classic(tmp_path, classic_file):
    path, data = classic_file
    from tiger_tpu.forcing import ForcingSpec, load_forcings

    streams = np.array([1, 2])
    with open(tmp_path / "lookup.csv", "w") as f:
        f.write("stream,lat_index,lon_index\n1,0,0\n2,2,3\n")
    fs = load_forcings(
        [ForcingSpec(path, "pr", 1.0)], streams, str(tmp_path / "lookup.csv")
    )
    np.testing.assert_allclose(np.asarray(fs.data[:, 0]), data[:, 0, 0], rtol=1e-7)
    np.testing.assert_allclose(np.asarray(fs.data[:, 1]), data[:, 2, 3], rtol=1e-7)
