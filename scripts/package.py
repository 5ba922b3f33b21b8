#!/usr/bin/env python
"""Package kamae_spark for spark-submit --py-files execution.

Produces dist/kamae_spark.zip (importable zip of the package) and prints
the spark-submit command for the flagship pipeline job."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIST = os.path.join(REPO, "dist")


def build_zip() -> str:
    os.makedirs(DIST, exist_ok=True)
    out = os.path.join(DIST, "kamae_spark.zip")
    pkg = os.path.join(REPO, "kamae_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    path = build_zip()
    print(f"built {path}")
    print(
        "submit with:\n"
        f"  spark-submit --master <cluster> --py-files {path} \\\n"
        f"    {os.path.join(REPO, 'scripts', 'run_pipeline.py')} \\\n"
        "    --input <transcripts path> --annotations <annotations path> \\\n"
        "    --output <feature table path> --gap-seconds 1800 --n-buckets 256"
    )
