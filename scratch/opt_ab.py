"""Round-15 optimization A/B harness: interleaved same-session legs
(the only wall comparison this box supports — see verify skill), old vs
new implementation of each optimized path, System.gc between runs,
best-of-N, noop sink. Also asserts once per pair that both legs return
IDENTICAL rows (sorted collect), so the perf claim and the
no-result-change claim ride the same script.

Usage: python scratch/opt_ab.py <pair> [rounds]
Pairs are registered in PAIRS below.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def _pagerank(join_impl, materialize):
    def build(spark):
        from openeo_odc_driver_spark.pipeline.graph import (
            copurchase_edges,
            pagerank_integer,
        )
        from openeo_odc_driver_spark.registry_pipeline import load_table
        from pyspark.sql import functions as F

        li = load_table(spark, SF_DIR, "lineitem")
        ranks = pagerank_integer(
            copurchase_edges(li), iterations=3, join_impl=join_impl,
            materialize=materialize,
        )
        return (
            ranks.select(F.col("pk").alias("part_key"),
                         F.col("r").alias("score"))
            .orderBy(F.desc("score"), F.asc("part_key"))
            .limit(20)
        )

    return build


def _ivf_pq_trained(impl):
    def build(spark):
        from openeo_odc_driver_spark import registry_pipeline as rp
        from openeo_odc_driver_spark.pipeline import similarity as psim

        e = rp._embs(spark, SF_DIR)
        return psim.ivf_pq_ann(
            e, e.where("vec_id < 8"), k=5, nprobe=rp._IVFPQ_NPROBE,
            centroids=psim.centroids_from_kmeans(
                psim.kmeans_train(e, k=16, iters=3, materialize=impl[0])
            ),
            argmin_impl=impl[1],
        )

    return build


def _semdedup(materialize):
    def build(spark):
        from openeo_odc_driver_spark import registry_pipeline as rp
        from openeo_odc_driver_spark.pipeline import similarity as psim

        return psim.semantic_dedup_clusters(
            rp._embs(spark, SF_DIR), n_centroids=rp._SEM_NC,
            threshold=rp._SEM_TAU, materialize=materialize,
        )

    return build


def _bloom(materialize):
    def build(spark):
        from openeo_odc_driver_spark import registry_pipeline as rp
        from openeo_odc_driver_spark.pipeline import dedup as pdedup
        from pyspark.sql import functions as F

        docs = rp._docs(spark, SF_DIR)
        return pdedup.bloom_decontaminate(
            docs.where(F.col("doc_id") % 10 != 0),
            docs.where(F.col("doc_id") % 10 == 0),
            n=rp._BLOOM_N, materialize=materialize,
        )

    return build


def _lpa(materialize):
    def build(spark):
        from openeo_odc_driver_spark.pipeline.graph import (
            copurchase_edges,
            label_propagation,
        )
        from openeo_odc_driver_spark.registry_pipeline import load_table
        from pyspark.sql import functions as F

        li = load_table(spark, SF_DIR, "lineitem")
        labels = label_propagation(
            copurchase_edges(li), iterations=3, materialize=materialize
        )
        return labels.groupBy("label").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members")
        )

    return build


def _reduce_sweep(variant: str):
    def build(spark):
        from openeo_odc_driver_spark.operators.reducers import (
            reduce_dimension,
        )
        from openeo_odc_driver_spark.registry import REDUCER_DUCK, VALUE
        from openeo_odc_driver_spark.sources.synthetic import synthetic_cube
        from pyspark.sql import functions as F

        cube = synthetic_cube(spark)
        if variant == "repart":
            # pre-cluster ONCE on the group keys: every reducer leg's
            # groupBy and every join is then exchange-free, and the one
            # repartition subtree is pure SQL so ReuseExchange fires
            cube = cube.with_df(cube.df.repartition("band", "y", "x"))
        elif variant == "checkpoint":
            cube = cube.with_df(cube.df.localCheckpoint(eager=True))
        out = None
        for red in REDUCER_DUCK:
            d = reduce_dimension(cube, "time", red).df
            d = d.withColumnRenamed(VALUE, red)
            out = d if out is None else out.join(d, ["band", "y", "x"])
        return out

    return build


def _kernel_sweep(py_floor: bool):
    def build(spark):
        from openeo_odc_driver_spark.core import tiled
        from openeo_odc_driver_spark.registry import QUERIES

        orig = tiled._py_stage_width
        if not py_floor:
            # old behavior: pandas stages use only the raster byte
            # sizing (None at this scale -> AQE coalesces the stage)
            tiled._py_stage_width = tiled._raster_exchange_width
        try:
            return QUERIES["tiled_apply_kernel_border_sweep"](spark, SF_DIR)
        finally:
            tiled._py_stage_width = orig

    return build


def _kernel_single(py_floor: bool):
    def build(spark):
        from openeo_odc_driver_spark.core import tiled
        from openeo_odc_driver_spark.registry import QUERIES

        orig = tiled._py_stage_width
        if not py_floor:
            tiled._py_stage_width = tiled._raster_exchange_width
        try:
            return QUERIES["tiled_apply_kernel"](spark, SF_DIR)
        finally:
            tiled._py_stage_width = orig

    return build


def _radar_tiled(py_floor: bool):
    def build(spark):
        from openeo_odc_driver_spark.core import tiled
        from openeo_odc_driver_spark.registry import QUERIES

        orig = tiled._py_stage_width
        if not py_floor:
            tiled._py_stage_width = tiled._raster_exchange_width
        try:
            return QUERIES["tiled_radar_mask"](spark, SF_DIR)
        finally:
            tiled._py_stage_width = orig

    return build


def _py_floor_q(qname, py_floor: bool):
    """Round-15 CONTINUATION legs: the pandas-stage floor extended to
    the pack / folds / median / canvas assemblies (old = raster byte
    sizing only, i.e. no repartition at this scale)."""
    def build(spark):
        from openeo_odc_driver_spark.core import tiled
        from openeo_odc_driver_spark.registry import QUERIES

        orig = tiled._py_stage_width
        if not py_floor:
            tiled._py_stage_width = tiled._raster_exchange_width
        try:
            return QUERIES[qname](spark, SF_DIR)
        finally:
            tiled._py_stage_width = orig

    return build


def _bigram(model_build):
    def build(spark):
        from openeo_odc_driver_spark import registry_pipeline as rp
        from openeo_odc_driver_spark.pipeline import text as ptext

        return ptext.bigram_logprob(
            rp._docs(spark, SF_DIR), model_build=model_build
        )

    return build


def _sweep_share(qname, enabled):
    def build(spark):
        from pyspark.sql import DataFrame

        from openeo_odc_driver_spark.core import tiled
        from openeo_odc_driver_spark.registry import QUERIES

        if enabled:
            return QUERIES[qname](spark, SF_DIR)
        # old leg: disable every fixture materialization (identity
        # checkpoint) so the sweep re-embeds its subtrees per leg
        orig_lc = DataFrame.localCheckpoint
        orig_mt = tiled.materialize_tiled
        DataFrame.localCheckpoint = lambda self, eager=True: self
        tiled.materialize_tiled = lambda tc: tc
        try:
            return QUERIES[qname](spark, SF_DIR)
        finally:
            DataFrame.localCheckpoint = orig_lc
            tiled.materialize_tiled = orig_mt

    return build


PAIRS = {
    "lpa": (_lpa("none"), _lpa("local")),
    "zonal_sweep_share": (
        _sweep_share("tiled_zonal_sweep", False),
        _sweep_share("tiled_zonal_sweep", True),
    ),
    "warp_sweep_share": (
        _sweep_share("resample_spatial_warp_sweep", False),
        _sweep_share("resample_spatial_warp_sweep", True),
    ),
    "warp_dirs_share": (
        _sweep_share("resample_spatial_warp_directions_sweep", False),
        _sweep_share("resample_spatial_warp_directions_sweep", True),
    ),
    "kernel_sweep_share": (
        _sweep_share("tiled_apply_kernel_border_sweep", False),
        _sweep_share("tiled_apply_kernel_border_sweep", True),
    ),
    "treduce_share": (
        _sweep_share("tiled_reduce_time_sweep", False),
        _sweep_share("tiled_reduce_time_sweep", True),
    ),
    "kernel_sweep": (_kernel_sweep(False), _kernel_sweep(True)),
    "kernel_single": (_kernel_single(False), _kernel_single(True)),
    "reduce_sweep_repart": (_reduce_sweep("plain"), _reduce_sweep("repart")),
    "semdedup": (_semdedup("none"), _semdedup("local")),
    "bloom": (_bloom("none"), _bloom("local")),
    "reduce_sweep_ckpt": (_reduce_sweep("plain"), _reduce_sweep("checkpoint")),
    "radar_tiled": (_radar_tiled(False), _radar_tiled(True)),
    "pagerank_broadcast": (_pagerank("broadcast", "none"),
                           _pagerank("broadcast", "local")),
    "pagerank_shuffle": (_pagerank("shuffle", "none"),
                         _pagerank("shuffle", "local")),
    "ivf_pq_trained": (_ivf_pq_trained(("none", "window")),
                       _ivf_pq_trained(("local", "agg"))),
    # --- round-15 continuation pairs ---
    "bigram_rollup": (_bigram("twopass"), _bigram("rollup")),
    "floor_rcs": (_py_floor_q("tiled_resample_cube_spatial", False),
                  _py_floor_q("tiled_resample_cube_spatial", True)),
    "floor_rcs_bilinear": (
        _py_floor_q("tiled_resample_cube_spatial_bilinear", False),
        _py_floor_q("tiled_resample_cube_spatial_bilinear", True)),
    "floor_treduce": (_py_floor_q("tiled_reduce_time_sweep", False),
                      _py_floor_q("tiled_reduce_time_sweep", True)),
    "floor_ndvi": (_py_floor_q("tiled_ndvi_median", False),
                   _py_floor_q("tiled_ndvi_median", True)),
    "floor_roundtrip": (_py_floor_q("tiled_roundtrip", False),
                        _py_floor_q("tiled_roundtrip", True)),
    "floor_zonal": (_py_floor_q("tiled_zonal_sweep", False),
                    _py_floor_q("tiled_zonal_sweep", True)),
    "floor_climnorm": (_py_floor_q("tiled_climatological_normal", False),
                       _py_floor_q("tiled_climatological_normal", True)),
    "floor_pipeline_e2e": (_py_floor_q("tiled_pipeline_e2e", False),
                           _py_floor_q("tiled_pipeline_e2e", True)),
}


def main() -> int:
    pair = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    old_fn, new_fn = PAIRS[pair]
    from openeo_odc_driver_spark.session import get_spark

    spark = get_spark("opt-ab", cpus="32")

    def run(fn) -> float:
        spark._jvm.System.gc()
        t0 = time.time()
        fn(spark).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # result parity once, before timing
    o = sorted(map(tuple, old_fn(spark).collect()))
    n = sorted(map(tuple, new_fn(spark).collect()))
    assert o == n, f"RESULT MISMATCH old={o[:5]} new={n[:5]}"

    walls = {"old": [], "new": []}
    for _ in range(rounds):
        walls["old"].append(run(old_fn))
        walls["new"].append(run(new_fn))
    out = {
        "pair": pair,
        "rows": len(o),
        "old_walls": walls["old"],
        "new_walls": walls["new"],
        "old_best": min(walls["old"]),
        "new_best": min(walls["new"]),
        "ratio_old_over_new": round(
            min(walls["old"]) / max(min(walls["new"]), 1e-9), 2
        ),
        "parity": "identical",
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
