"""Self-deployment of this package to Spark executors.

Python-side operators (applyInPandas / mapInPandas closures) reference
functions in this package by module path; executor Python workers must be
able to import it. On a real cluster that's ``--py-files``; here the package
zips itself and registers via ``addPyFile`` so any host process (the
external driver, a notebook, bench.py) can run the Python-path operators
without arranging PYTHONPATH. Idempotent per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_ADDED: set[str] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
    sc = spark.sparkContext
    # applicationId is stable per context and never reused by a successor
    # context at the same interpreter address (id(sc) could be — a stopped
    # context's address can be recycled, silently skipping the deploy).
    key = sc.applicationId
    if key in _ADDED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"mapreduce_framework_spark_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(dirpath, fname)
                    zf.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    _ADDED.add(key)
