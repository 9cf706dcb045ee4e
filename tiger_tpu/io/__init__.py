"""I/O layer: NetCDF (h5py-backed), lookup remap, result writers."""

from tiger_tpu.io.netcdf import NetCDFReader, NetCDFWriter, write_grid_forcing
from tiger_tpu.io.lookup import LookupTable
from tiger_tpu.io.output import (
    write_dense_csv,
    write_dense_netcdf,
    write_dense_netcdf_packed,
    write_final_csv,
    write_final_netcdf,
)

__all__ = [
    "NetCDFReader",
    "NetCDFWriter",
    "write_grid_forcing",
    "LookupTable",
    "write_dense_csv",
    "write_dense_netcdf",
    "write_dense_netcdf_packed",
    "write_final_csv",
    "write_final_netcdf",
]
