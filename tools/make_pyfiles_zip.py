"""Package the engine for spark-submit --py-files (north rule run mode).

Usage:
    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files out.zip \
        --master ... \
        $(python -c 'import hypergraph_gpu_label_propagation_spark.cli as m; print(m.__file__)') --hsbm ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "hypergraph_gpu_label_propagation_spark"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
