#!/usr/bin/env python
"""Package graftpark as a spark-submit ``--py-files`` artifact.

The north rule's deployment path is ``spark-submit --py-files`` on a
multi-executor cluster: executors receive the engine as a shipped zip,
not a shared repo mount. graftpark is pure python with no
``__file__``-relative data access, so a plain package zip is
executor-importable as-is (driver + Python UDF workers).

Usage:
    python tools/make_pyfiles_zip.py [out.zip]     # default /tmp/graftpark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(out_path: str, repo_root: str | None = None) -> str:
    """Zip the graftpark package (sans __pycache__) for --py-files."""
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "graftpark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graftpark.zip"
    print(build_zip(out))
