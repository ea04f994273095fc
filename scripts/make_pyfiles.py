"""Package corenlp_spark (code + committed model weights) into a zip for
``spark-submit --py-files`` deployment (the north rule's cluster launch
mode). The weight artifacts ride inside the archive and load through
importlib.resources (models/perceptron.load_weights zip fallback).

Run: python scripts/make_pyfiles.py [out.zip]   (default /tmp/corenlp_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "corenlp_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith((".py", ".json.gz")):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corenlp_spark.zip"
    print(build(out))
