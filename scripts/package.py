"""Build dist/beats_spark.zip for spark-submit --py-files.

The zip contains the ``beats_spark`` package only (pure Python, no
binary deps beyond the cluster's pyspark/pandas/numpy), importable from
executors when shipped with --py-files.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(dist_dir: str | None = None) -> str:
    dist = dist_dir or os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "beats_spark.zip")
    pkg = os.path.join(ROOT, "beats_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
