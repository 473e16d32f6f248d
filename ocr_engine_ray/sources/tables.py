"""Table readers: Lance-preferred seam with Parquet fallback.

BASELINE.json targets Lance tables; this container has no ``lance`` package,
so ``read_table`` prefers Lance when (a) the path is a ``.lance`` dataset and
(b) ``lance`` is importable, and otherwise reads Parquet.  Column pruning is
always pushed to the reader (``columns=[...]``) so only the needed columns
leave storage (a 100 TB table must never be scanned wholesale for a 2-column
transform).
"""

from __future__ import annotations

import os

import ray.data as rd


def _is_lance(path: str) -> bool:
    return path.endswith(".lance") or (
        os.path.isdir(path) and os.path.isdir(os.path.join(path, "_versions"))
    )


def read_table(path: str, *, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    if _is_lance(path):
        try:
            import lance  # noqa: F401
        except ImportError as e:
            # Falling through to read_parquet on a Lance directory would
            # surface as an opaque 'invalid parquet file' — fail clearly.
            raise ImportError(
                f"{path} is a Lance dataset but the 'lance' package is not "
                "installed; install pylance or point at the Parquet copy"
            ) from e
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


def sf_table(sf_dir: str, name: str, *, columns: list[str] | None = None) -> rd.Dataset:
    """Read one driver table (``/root/testdata/sf*/{name}.parquet``)."""
    return read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
