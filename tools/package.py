"""Build the --py-files zip for spark-submit deployment.

Usage: python tools/package.py [out.zip]
Produces a zip whose root contains the ``endor_blockchain_data_pipeline_spark``
package — the artifact a cluster submit ships to executors:

    spark-submit --master <cluster> \
        --py-files endor_blockchain_data_pipeline_spark.zip \
        your_job.py

``tests/test_submit.py`` runs exactly that end-to-end against a local
master as the deployment smoke test.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "endor_blockchain_data_pipeline_spark"


def build(out: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(root, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                zf.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else f"{PKG}.zip"
    print(build(out))
