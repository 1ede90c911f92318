"""Cross-filesystem helpers for small files (reference: fme/core/cloud.py).

The zarr path already reaches gs:// and s3:// through tensorstore's
kvstore drivers (data/store.py:kvstore_spec). netCDF files — initial
conditions, restart files, normalization stats — are single HDF5 blobs
that h5py can only open locally, so remote ones are fetched via an
inter-filesystem copy first (reference: fme/core/cloud.py:48
open_dataset_via_inter_filesystem_copy). Small files only.
"""

import os
import shutil
import tempfile


def is_local(path: str) -> bool:
    """True for plain paths and file:// URLs (reference cloud.py:22)."""
    return "://" not in str(path) or str(path).startswith("file://")


def inter_filesystem_copy(source: str, destination: str):
    """Copy between any two filesystems via fsspec streams (reference
    cloud.py:10). Do not use for large files."""
    import fsspec

    with fsspec.open(str(source), "rb") as f_src:
        with fsspec.open(str(destination), "wb") as f_dst:
            shutil.copyfileobj(f_src, f_dst)


def exists(path: str) -> bool:
    """Existence check on any fsspec filesystem (reference cloud.py:34)."""
    if is_local(path):
        return os.path.exists(str(path).removeprefix("file://"))
    import fsspec

    fs, fs_path = fsspec.url_to_fs(str(path))
    return fs.exists(fs_path)


def fetch_to_local(path: str) -> tuple[str, "_TempFetch | None"]:
    """Return a locally-openable path for ``path``.

    Local paths pass through. Remote paths are copied into a temp
    directory; the returned handle keeps the temp dir alive — call
    ``handle.close()`` (or let the owning dataset's close() do it) when
    the file is no longer needed.
    """
    if is_local(path):
        return str(path).removeprefix("file://"), None
    handle = _TempFetch()
    local = os.path.join(handle.dir, os.path.basename(str(path)) or "file")
    inter_filesystem_copy(path, local)
    return local, handle


class _TempFetch:
    def __init__(self):
        self.dir = tempfile.mkdtemp(prefix="ace_tpu_fetch_")

    def close(self):
        shutil.rmtree(self.dir, ignore_errors=True)

    def __del__(self):  # best-effort cleanup
        self.close()
