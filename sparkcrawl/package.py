"""Build the ``--py-files`` archive for cluster submission.

The north-rule deployment shape is ``spark-submit --py-files
sparkcrawl.zip cli.py ...`` on a multi-executor cluster: the driver and
every executor's Python workers import ``sparkcrawl`` from the shipped
zip (Arrow UDFs in extract/textops/annsearch are pickled by reference,
so the package must be importable worker-side). This module produces
that zip deterministically — fixed timestamps and sorted entries, so
rebuilding unchanged sources yields a bit-identical archive and cluster
file caches stay warm across submits.

Usage:  python -m sparkcrawl.package /path/sparkcrawl.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

# Fixed DOS timestamp (1980-01-01) => rebuilds are bit-identical.
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build_pyfiles_zip(out_path: str, repo_root: str | None = None) -> str:
    """Zip the ``sparkcrawl`` package (sources only) rooted so that the
    archive itself is a valid ``sys.path`` entry (``sparkcrawl/*.py`` at
    the top level, as spark-submit expects for --py-files)."""
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    pkg = os.path.join(root, "sparkcrawl")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, root).replace(os.sep, "/")
                info = zipfile.ZipInfo(rel, date_time=_EPOCH)
                info.external_attr = 0o644 << 16
                with open(full, "rb") as f:
                    zf.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "sparkcrawl.zip"
    print(build_pyfiles_zip(out))
