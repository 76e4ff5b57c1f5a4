"""Fixed-expected-value oracles (the ``ann_recall`` pattern, generalized).

Some registry queries are not ANSI-SQL-expressible (iterative Gauss-Newton
fits, pandas-UDF decoders), and the driver has no rows-only tier — so they
can only go green with a *literal* oracle: the expected output on the
deterministic sf0.01 fixture, captured once by ``scratch/gen_fixed_oracles.py``
and replayed as a DuckDB ``VALUES`` table. The Spark side quantizes float
outputs (round to 7 decimals) and is bit-deterministic by construction
(sorted per-group inputs, content-addressed payloads), so the hash compare
is exact. A refactor that changes any output value breaks the row — which
is the point: these are regression tripwires, not tautologies.

Fixture format (``fixtures/<name>.json``)::

    {"columns": [{"name": "a0", "type": "DOUBLE"}, ...],
     "rows": [[...], ...]}

Floats survive the JSON round-trip exactly (shortest-repr serialization on
both ends), and ``repr()`` formatting below round-trips to the identical
IEEE-754 double when DuckDB parses the literal.

Fixture-content dependency: ``multimodal_*`` and ``kmeans_train`` derive
from the driver-generated sf0.01 tables, which have been content-stable
across rounds (``ann_recall`` has pinned fixture-derived constants since
round 3). If the test-data generator ever changes seeds, re-run
``python scratch/gen_fixed_oracles.py`` — it re-captures and re-checks
bit-stability in one step. ``fit_curve_harmonic`` uses the in-query
synthetic cube and is fixture-independent.
"""

from __future__ import annotations

import json
import math
import os
from functools import lru_cache

_DIR = os.path.dirname(os.path.abspath(__file__))


def _lit(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ in ("DOUBLE", "FLOAT"):
        f = float(v)
        if math.isnan(f):
            return f"CAST('nan' AS {typ})"
        if math.isinf(f):
            return f"CAST('{'-' if f < 0 else ''}inf' AS {typ})"
        # String cast, not a bare numeric literal: DuckDB parses long
        # decimal literals through DECIMAL before casting to DOUBLE,
        # which can land 1 ulp off strtod (observed on 16-digit dyadic
        # values from ivf_pq_ann_trained); CAST('<repr>' AS DOUBLE) is
        # correctly rounded and round-trips repr() exactly.
        return f"CAST('{repr(f)}' AS {typ})"
    if typ in ("BIGINT", "INTEGER", "INT", "SMALLINT"):
        return str(int(v))
    if typ == "BOOLEAN":
        return "true" if v else "false"
    # VARCHAR
    return "'" + str(v).replace("'", "''") + "'"


@lru_cache(maxsize=None)
def values_oracle_sql(name: str) -> str:
    """Build ``SELECT ... FROM (VALUES ...)`` oracle SQL from a fixture file.

    Missing fixture → a sentinel query that can never hash-match (so a
    forgotten generation step shows up as a loud FAIL, not a silent skip).
    """
    path = os.path.join(_DIR, f"{name}.json")
    if not os.path.exists(path):
        return f"SELECT 'missing fixture {name}' AS error"
    with open(path) as fh:
        fx = json.load(fh)
    cols = fx["columns"]
    names = ", ".join(c["name"] for c in cols)
    select = ", ".join(
        f"CAST({c['name']} AS {c['type']}) AS {c['name']}" for c in cols
    )
    rows = ", ".join(
        "(" + ", ".join(_lit(v, c["type"]) for v, c in zip(row, cols)) + ")"
        for row in fx["rows"]
    )
    return f"SELECT {select} FROM (VALUES {rows}) t({names})"
