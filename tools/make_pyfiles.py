#!/usr/bin/env python
"""Build dist/who_owns_mass_processing_spark.zip for spark-submit --py-files.

    python tools/make_pyfiles.py
    spark-submit --py-files dist/who_owns_mass_processing_spark.zip \
        jobs/dedupe.py --input ... --workdir ...

The zip contains the package only (no tests/tools); executors import it
from the distributed archive — the north rule's submission contract.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "who_owns_mass_processing_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
