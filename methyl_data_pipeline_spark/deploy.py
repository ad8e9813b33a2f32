"""Self-shipping: make the package importable on executor workers.

Python workers do not inherit the driver's ``sys.path`` mutations, so a
pandas UDF whose body imports ``methyl_data_pipeline_spark`` fails on a
cluster (or any session whose PYTHONPATH lacks the repo). The standard
deployment idiom is to ship the package as a zip via
``SparkContext.addPyFile`` — done here lazily, once per session, by
every operator that executes Python on workers (BMIQ, ComBat EB step,
p-value UDFs).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_SESSIONS: set[int] = set()


def ensure_importable(spark) -> None:
    """Zip this package and addPyFile it, once per SparkContext."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as z:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            pkg_name, os.path.relpath(full, pkg_dir)
                        )
                        z.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED_SESSIONS.add(key)
