"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All entries live in :mod:`openeo_odc_driver_spark.registry` (cube
operators, SURVEY §2) and :mod:`openeo_odc_driver_spark.registry_pipeline`
(dedup / similarity / text / multimodal / streaming extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the engine importable regardless of the caller's cwd (and ship the
# repo to local-mode Python workers via PYTHONPATH for pandas-UDF closures)
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    if os.environ.get("PYTHONPATH")
    else _REPO_ROOT
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's golden
    NDVI pipeline shape (tests/process_graphs/NDVI_Bolzano_median.json) —
    load_collection → per-pixel normalized difference → median over time."""
    from openeo_odc_driver_spark.registry import flagship_ndvi

    return flagship_ndvi(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + pipeline ops."""
    from openeo_odc_driver_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (bit-exact by
    construction; see registry docstrings). Keys absent here
    (fit_curve_harmonic, multimodal_decode, multimodal_audio_decode) are
    non-SQL-expressible and get the driver's rows-only check."""
    from openeo_odc_driver_spark.registry import ORACLE

    return dict(ORACLE)
