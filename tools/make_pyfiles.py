"""Package llogtail_spark for cluster deployment.

Builds the zip that `spark-submit --py-files` ships to every executor
(the deployment mode the pipeline targets):

    python tools/make_pyfiles.py [--out dist/llogtail_spark.zip]
    spark-submit --py-files dist/llogtail_spark.zip \
        --deploy-mode cluster cli_main.py --conf pipeline.json

Only the library package goes in the zip — tests, benches, and fixtures
stay out. Deterministic output (fixed timestamps, sorted entries) so
re-builds of the same tree are byte-identical and cacheable by the
cluster's file distribution layer.
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "llogtail_spark"
FIXED_DATE = (1980, 1, 1, 0, 0, 0)  # zip epoch -> reproducible builds


def build(out: str) -> list[str]:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    entries = []
    for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, ROOT), full))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    return [a for a, _ in entries]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "dist", "llogtail_spark.zip"))
    args = ap.parse_args()
    names = build(args.out)
    print(f"wrote {args.out}: {len(names)} modules", file=sys.stderr)
    print(args.out)


if __name__ == "__main__":
    main()
