#!/usr/bin/env python
"""Build dist/rusty_bloomfilter_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    out = REPO / "dist" / "rusty_bloomfilter_spark.zip"
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "rusty_bloomfilter_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
