"""Package search_engine_spark for spark-submit --py-files.

Usage: python scripts/make_pyfiles_zip.py [out.zip]
Then:  spark-submit --py-files search_engine_spark.zip scripts/submit_build.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "search_engine_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "search_engine_spark")
        for base, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith((".pyc",)) or "__pycache__" in base:
                    continue
                p = os.path.join(base, f)
                z.write(p, os.path.relpath(p, ROOT))
    print(out)


if __name__ == "__main__":
    main()
