"""Ship the package to Spark Python workers (the --py-files story).

On a real cluster the engine is distributed with
``spark-submit --py-files pg_textsearch_spark.zip`` (north_rule). When
the engine is driven as a library from an arbitrary cwd (the driver
harness, notebooks), workers would otherwise fail to unpickle our
pandas UDFs with ModuleNotFoundError. ``ensure_shipped(spark)`` zips
the package once per process and registers it with
``sparkContext.addPyFile`` — the programmatic equivalent of
--py-files, idempotent per SparkContext.
"""

from __future__ import annotations

import os
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_shipped_ctx_ids: set[int] = set()


def build_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the package for --py-files / addPyFile. Returns the path."""
    out_path = out_path or os.path.join(
        "/tmp", f"pg_textsearch_spark-{os.getpid()}.zip"
    )
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "pg_textsearch_spark", os.path.relpath(full, _PKG_DIR)
                )
                zf.write(full, rel)
    return out_path


def ensure_shipped(spark) -> None:
    """Idempotently make the package importable on executors."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped_ctx_ids:
        return
    zip_path = build_pyfiles_zip()
    sc.addPyFile(zip_path)
    _shipped_ctx_ids.add(key)
