#!/usr/bin/env python
"""Build raptor_spark.zip for spark-submit --py-files.

    python tools/make_submit_pkg.py [out.zip]
    spark-submit --master ... --py-files raptor_spark.zip \
        raptor_spark/backfill.py --out s3://... --n-convs ...

(The backfill module is import-safe as a plain file: spark-submit runs
it as __main__ and the zip on the py-files path provides the package.)
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "raptor_spark.zip")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(ROOT, "raptor_spark")):
            if "__pycache__" in dirpath:
                continue
            for f in filenames:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
                    n += 1
    print(f"{out}: {n} files")


if __name__ == "__main__":
    main()
