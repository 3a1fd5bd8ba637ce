"""Build the ``--py-files`` artifact for cluster submission.

Zips the ``pyspider_spark`` package (source only, no tests/caches) into
``dist/pyspider_spark.zip`` — the artifact the north rule's
``spark-submit --py-files`` deployment ships to executors. Python-only
(no native extensions), so one zip serves any executor platform.

Usage:
    python scripts/package_pyfiles.py [out_dir]
then:
    spark-submit --master <cluster> --py-files dist/pyspider_spark.zip \
        scripts/submit_crawl.py --total 400000 --rounds 10
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "pyspider_spark.zip")
    pkg = os.path.join(REPO, "pyspider_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
