#!/usr/bin/env python
"""Build dist/pkg.zip for spark-submit --py-files (north_rule ship format)."""

from __future__ import annotations

import os
import zipfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(_REPO, "dist", "pkg.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(_REPO, "product_deduplication_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, _REPO))
    return out


if __name__ == "__main__":
    print(build())
