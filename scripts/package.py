"""Build dist/ragstudio_spark.zip for spark-submit --py-files (code plus
packaged data artifacts — the trained merges.txt rides along so workers
resolve the default tokenizer from inside the zip)."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "ragstudio_spark.zip")
    pkg = os.path.join(REPO, "ragstudio_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith((".py", ".txt")):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
