"""Build the spark-submit --py-files artifact: a deterministic zip of
the ``lynxkite_spark`` package (BASELINE.json north rule: "runs via
spark-submit --py-files on multi-executor clusters").

Usage:
    python tools/package_pyfiles.py [out.zip]          # default dist/lynxkite_spark.zip
    spark-submit --py-files dist/lynxkite_spark.zip your_job.py

Deterministic: fixed timestamps and sorted member order, so the same
tree always produces a byte-identical artifact (content-addressable in
the checkpoint registry's spirit).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    members = []
    pkg_root = os.path.join(REPO, "lynxkite_spark")
    for base, _dirs, files in os.walk(pkg_root):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(base, f)
                members.append((os.path.relpath(full, REPO), full))
    members.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in members:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(info, fh.read(), zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "lynxkite_spark.zip")
    print(build(out))
