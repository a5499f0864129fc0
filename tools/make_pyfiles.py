"""Package the engine for a real cluster: build the --py-files zip.

The north rule runs the job via ``spark-submit --py-files`` on a
multi-executor cluster. Locally (local[N]) the package imports from the repo
checkout; on a cluster every executor needs the code shipped. This builds a
deterministic zip of the ``mysql_secure_agent_spark`` package:

    python tools/make_pyfiles.py [out.zip]
    spark-submit --py-files mysql_secure_agent_spark.zip your_job.py

Deterministic output (fixed timestamps, sorted entries) so repeated builds
are byte-identical — artifact stores and cluster caches dedup them.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "mysql_secure_agent_spark"


def build(out_path: str) -> str:
    src_root = os.path.join(REPO, PKG)
    entries = []
    for dirpath, _dirnames, filenames in os.walk(src_root):
        for fn in filenames:
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(p, REPO), p))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, p in entries:
            with open(p, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, f"{PKG}.zip")
    print(build(out))
