#!/usr/bin/env python
"""Build jgdtrans_rs_spark.zip for ``spark-submit --py-files`` (north
rule launch shape).  Stdlib only; writes next to the repo root.

Usage:
    python scripts/package_pyfiles.py [out.zip]
    spark-submit --py-files jgdtrans_rs_spark.zip scripts/run_pipeline.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = argv[0] if argv else os.path.join(root, "jgdtrans_rs_spark.zip")
    pkg = os.path.join(root, "jgdtrans_rs_spark")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(filenames):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, root))
                n += 1
    print(f"{out}: {n} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
