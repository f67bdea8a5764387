"""Ship the package to executors of an externally-created SparkSession.

The grading driver (and any spark-submit without --py-files) builds its
own SparkSession from an arbitrary cwd; Python workers then can't
import ``meme_search_engine_spark``.  ``ensure_shipped`` zips the
package once per process and registers it via ``sc.addPyFile`` — the
programmatic equivalent of ``spark-submit --py-files pkg.zip`` (the
packaging contract in BASELINE.json's north rule)."""

from __future__ import annotations

import os
import tempfile
import zipfile

_shipped: set[int] = set()


def build_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the package sources (deterministic walk order)."""
    if out_path is None:
        out_path = os.path.join(
            tempfile.gettempdir(), f"mse_spark_pyfiles_{os.getpid()}.zip"
        )
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(out_path, "w") as zf:
        for dirpath, dirnames, files in os.walk(pkg_dir):
            dirnames.sort()
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, root))
    return out_path


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    sc.addPyFile(build_pyfiles_zip())
    _shipped.add(key)
