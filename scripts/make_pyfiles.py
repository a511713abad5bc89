"""Package xapian_spark for spark-submit --py-files.

The north-rule launch posture is

    spark-submit --py-files xapian_spark.zip scripts/build_index.py ...

This builds that zip DETERMINISTICALLY: only ``xapian_spark/**/*.py``
(no caches, no tests), entries sorted by archive name, a fixed zip
timestamp, and no compression-level nondeterminism (stored + zlib level
pinned via ZIP_DEFLATED default).  Deterministic bytes mean the artifact
a 1000-executor cluster distributes is reproducible from the git tree —
the same property the warehouse build's content-sha256 invariant gives
the data side.

Run:  python scripts/make_pyfiles.py [--out xapian_spark.zip]
Prints one JSON line: {"out": ..., "files": N, "sha256": ...}.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Fixed DOS timestamp (2020-01-01 00:00:00) so rebuilding from an
# identical tree yields identical bytes regardless of checkout mtimes.
_ZIP_DATE = (2020, 1, 1, 0, 0, 0)


def package_files() -> list[str]:
    """Archive-relative paths of every package source file, sorted."""
    out = []
    pkg_root = os.path.join(REPO, "xapian_spark")
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                out.append(os.path.relpath(full, REPO))
    return sorted(out)


def build_zip(out_path: str) -> dict:
    files = package_files()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel in files:
            with open(os.path.join(REPO, rel), "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), _ZIP_DATE)
            info.external_attr = 0o644 << 16
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    sha = hashlib.sha256(open(out_path, "rb").read()).hexdigest()
    return {"out": out_path, "files": len(files), "sha256": sha}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "xapian_spark.zip"))
    args = ap.parse_args()
    print(json.dumps(build_zip(args.out)))


if __name__ == "__main__":
    main()
