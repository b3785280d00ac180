"""Ship the sparkclone package to executors.

Production runs use ``spark-submit --py-files sparkclone.zip`` (north_rule);
for in-process sessions (tests, the driver's ``entry(spark)`` smoke) this
zips the package to a content-addressed path and ``addPyFile``s it so
Python workers can unpickle UDFs that reference sparkclone modules.
Idempotent per content hash.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_shipped: set[str] = set()


def package_zip() -> str:
    """Build (or reuse) /tmp/sparkclone-{hash}.zip containing the package."""
    pkg_dir = Path(__file__).resolve().parent
    files = sorted(p for p in pkg_dir.rglob("*.py") if "__pycache__" not in p.parts)
    h = hashlib.sha256()
    for p in files:
        h.update(p.name.encode())
        h.update(p.read_bytes())
    digest = h.hexdigest()[:16]
    zip_path = os.path.join(tempfile.gettempdir(), f"sparkclone-{digest}.zip")
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for p in files:
                zf.write(p, arcname=f"sparkclone/{p.relative_to(pkg_dir)}")
        os.replace(tmp, zip_path)
    return zip_path


def ensure_shipped(spark: SparkSession) -> None:
    zip_path = package_zip()
    if zip_path in _shipped:
        return
    spark.sparkContext.addPyFile(zip_path)
    _shipped.add(zip_path)
