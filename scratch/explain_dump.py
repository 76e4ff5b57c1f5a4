"""Dump .explain('formatted') for a set of registered queries to
plans/$PLANS_DIR/<query>_<tag>.txt (default r16). Usage:

    python scratch/explain_dump.py <tag> [query ...]

With no query names, dumps every bench query. Plan capture is pure
driver work (no jobs run), so it is safe to run alongside nothing else.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from bench import BENCH_QUERIES
    from openeo_odc_driver_spark.registry import QUERIES
    from openeo_odc_driver_spark.session import get_spark

    if not names:
        names = list(BENCH_QUERIES)
    spark = get_spark("explain-dump", cpus="8")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("PLANS_DIR", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"[explain] {name}: {len(plan)} chars -> {path}",
              file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
