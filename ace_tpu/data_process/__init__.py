"""Dataset ETL: raw model output -> training datasets.

TPU-native equivalent of the reference's scripts/data_process tree
(reference: scripts/data_process/compute_dataset.py, get_stats.py,
compute_repeating_forcing.py, convert_to_monthly_netcdf.py,
create_window_avg_dataset.py). Uses the ace_tpu store layer (h5py +
tensorstore) instead of xarray/dask, streams over time slabs instead of
building a lazy task graph, and runs the optional spherical-harmonic
roundtrip filter on our matmul SHT (the reference needs the CUDA
xtorch_harmonics extension for that step).
"""
