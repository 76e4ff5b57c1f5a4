"""Fixture collection catalog for ``load_collection``.

The reference resolves collection ids against an OpenDataCube/STAC
catalog (odc_backend.py:244-305, load_odc_collection.py:35-226); here a
catalog maps collection id → loader building a Cube from the synthetic /
parquet fixtures. Grid coordinates of the 4326 collection are dyadic
degrees so both engines see exact doubles.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pyspark.sql import SparkSession

from ..core.cube import Cube
from ..sources.synthetic import (
    DEFAULT_SPEC,
    CubeSpec,
    cube_sql,
    lineitem_cube,
    synthetic_cube,
)

# Sentinel-2-like daily fixture over the reference's Bolzano bbox
# (NDVI_Bolzano_median.json: 11.283..11.407 E, 46.456..46.522 N).
# Dyadic grid: x0 = 11 + 37/128, resx = 1/128, y0 = 46 + 133/256,
# resy = 1/256 — every coordinate is an exact double.
S2_L2A_SPEC = CubeSpec(
    bands=("B04", "B08"),
    n_times=30,
    ny=16,
    nx=16,
    t0="2022-06-01 00:00:00",
    time_unit="DAY",
    x0=11.2890625,
    y0=46.51953125,
    resx=0.0078125,
    resy=0.00390625,
)

COLLECTION_SPECS: Dict[str, CubeSpec] = {
    "s2_l2a": S2_L2A_SPEC,
    "synthetic": DEFAULT_SPEC,
}


def load_collection_cube(
    spark: SparkSession,
    collection_id: str,
    sf_dir: Optional[str] = None,
) -> Cube:
    if collection_id in COLLECTION_SPECS:
        return synthetic_cube(spark, COLLECTION_SPECS[collection_id])
    if collection_id == "lineitem":
        if sf_dir is None:
            raise ValueError("lineitem collection needs sf_dir")
        return lineitem_cube(spark, sf_dir)
    raise ValueError(f"unknown collection {collection_id!r}")


def collection_duck_sql(collection_id: str) -> str:
    """DuckDB twin of the synthetic collections (oracle building)."""
    return cube_sql(COLLECTION_SPECS[collection_id], "duckdb")
