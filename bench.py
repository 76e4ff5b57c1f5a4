"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). Timing is **best of 3 consecutive runs** per query (best of 5 when the
best is under 2 s — short stages are the noise-dominated ones) —
standard warm-bench practice: the first run on a shared local JVM pays
codegen compilation and GC noise that a long-lived cluster amortizes
(BENCH_r02 recorded 28.6s for a query whose warm time is 1.5s); later
runs may also reuse plan-level caches (e.g. the persisted MinHash
signature table), which is engine behavior, not measurement artifact.
All per-run times go to stderr so noise is visible; stdout stays the
single JSON line the driver parses. The warmup deliberately exercises
every expensive expression class the queries use — md5/conv hashing,
higher-order array folds, explode, window functions, pandas UDF workers
— so first-use JIT/codegen isn't billed to whichever query runs first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: flagship cube query, relational, dedup, similarity, text,
# streaming — the SF-scaled surfaces of the engine
BENCH_QUERIES = [
    "flagship_ndvi",
    "tpch_q1",
    "orders_per_nation",
    "orders_topk_per_customer",
    "events_hourly",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "quality_score",
    "brute_force_topk",
    "lsh_bucket_ann",
    "embedding_cosine_dup_pairs",
    "reduce_time_sweep",
    "apply_kernel",
    "streaming_tumbling_hourly",
    "tfidf_top_terms",
    "chunk_documents",
    "repetition_scores",
    "pack_sequences",
    "corpus_stats_sketch",
    # round 5
    "paragraph_dedup",
    "bloom_decontaminate",
    "semantic_dedup_clusters",
    "unigram_logprob",
    "tokenize_to_ids",
    "intra_doc_dedup",
    "ivf_pq_ann",
    "dsir_importance_weights",
    "bigram_logprob",
    "pack_token_ids",
    "exact_substring_dedup",
    # round 5c
    "domain_stats",
    "priority_sample",
    "temperature_sample_langs",
    "count_min_heavy_grams",
    "minhash_dedup_incremental",
    "quality_classifier_score",
    "gopher_quality_flags",
    "cdc_chunks",
    "pipeline_rule_model_mix_stats",
    "event_sessionize",
    "tpch_q5_local_supplier_volume",
    # round 6
    "ivf_pq_ann_trained",
    "multimodal_jpeg_decode",
    # round 7
    "semantic_dedup_vectorized_k160",
    "decontaminate_semantic",
    "pii_redact",
    "exact_dedup_normalized",
    "text_content_ann",
    "script_census",
    "corpus_delta",
    "select_token_budget",
    # round 7 (late)
    "shingle_containment_pairs",
    "split_leakage_report",
    "train_split_census",
    "event_session_type_pairs",
    "tpch_q18_large_orders",
    "copurchase_pagerank",
    # round 8
    "copurchase_pagerank_shuffle",
    "semantic_dedup_auto",
    "phash_recall_tiers",
    "tiled_roundtrip",
    "tiled_reduce_time_sweep",
    "tiled_apply_kernel",
    "tiled_ndvi_median",
    "tiled_pipeline_e2e",
    # round 9
    "tiled_zonal_sweep",
    "tiled_resample_spatial",
    "tiled_merge_resolver",
    # round 10
    "tiled_climatological_normal",
    # round 11
    "tiled_resample_cube_spatial",
    "tiled_resample_cube_temporal",
    "tiled_radar_mask",
    "tiled_zonal_mean_store",
    "tiled_resample_cube_spatial_bilinear",
    "tiled_apply_kernel_border_sweep",
    # round 12
    "tiled_filter_bbox_native",
    "tiled_resample_cube_spatial_upscale",
    "multimodal_webp_decode",
    # round 13
    "gtiff_store_roundtrip",
    "tiled_apply_kernel_wrap_partial",
    "process_graph_merge_resolver",
    # round 14
    "resample_spatial_warp_sweep",
    # round 15
    "tiled_store_overview",
    "resample_spatial_warp_directions_sweep",
]


def tiled_layout_compare(spark) -> dict:
    """SURVEY §1.4 evidence: the same NDVI-shaped raster (3 bands × 12
    months × 512×512 px) written as long-format parquet vs tiled-layout
    parquet (tile=256, pixels packed as array<double>), then the time-
    mean reduced from each. Reports on-disk bytes per layout (for a
    full-scene op, storage bytes ARE scan bytes) and the reduce wall —
    the per-pixel key overhead long format pays at 10^12 px is exactly
    the `long_bytes / tiled_bytes` ratio here."""
    import shutil
    import tempfile

    from openeo_odc_driver_spark.core.tiled import (
        TiledCube,
        reduce_time_mean_tiled,
        to_tiled,
    )
    from openeo_odc_driver_spark.sources.synthetic import (
        CubeSpec,
        synthetic_cube,
    )

    # same JMH hygiene as the per-query blocks: this runs AFTER ~75
    # query blocks, and a major GC landing inside it showed as a phantom
    # 8x tiled regression in the r11 local run (5.4 s in-bench vs 1.3 s
    # isolated)
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    spec = CubeSpec(n_times=12, ny=512, nx=512)
    cube = synthetic_cube(spark, spec)
    work = tempfile.mkdtemp(prefix="tiled_bench_")
    out: dict = {}
    try:
        long_path, tiled_path = f"{work}/long", f"{work}/tiled"
        cube.df.write.mode("overwrite").parquet(long_path)
        tc = to_tiled(cube, tile=256, n_y=512, n_x=512)
        tc.df.write.mode("overwrite").parquet(tiled_path)

        def du(path: str) -> int:
            return sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )

        def run_long():
            (
                spark.read.parquet(long_path)
                .where("band IN ('B04', 'B08')")
                .groupBy("band", "y", "x")
                .agg({"value": "avg"})
                .write.format("noop").mode("overwrite").save()
            )

        def run_tiled():
            rb = TiledCube(
                spark.read.parquet(tiled_path)
                .where("band IN ('B04', 'B08')"),
                cube.schema,
                256,
                512,
                512,
            )
            reduce_time_mean_tiled(rb).df.write.format("noop").mode(
                "overwrite"
            ).save()

        # best-of-3 with the first run stamped separately, same as the
        # per-query blocks: round 9 shipped a single run that billed
        # pandas-UDF worker cold start (~6 s) to the tiled layout and
        # mis-graded it as a regression
        def best_of(fn, runs: int = 3):
            times = []
            for _ in range(runs):
                t0 = time.time()
                fn()
                times.append(time.time() - t0)
            return min(times), times[0]

        long_sec, long_first = best_of(run_long)
        tiled_sec, tiled_first = best_of(run_tiled)
        out = {
            "pixels": spec.ny * spec.nx * spec.n_times * len(spec.bands),
            "long_bytes": du(long_path),
            "tiled_bytes": du(tiled_path),
            "bytes_ratio": round(du(long_path) / max(du(tiled_path), 1), 2),
            "runs": 3,
            "long_mean_sec": round(long_sec, 3),
            "tiled_mean_sec": round(tiled_sec, 3),
            "long_first_run_sec": round(long_first, 3),
            "tiled_first_run_sec": round(tiled_first, 3),
        }
        print(f"[bench] tiled_layout: {out}", file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    from openeo_odc_driver_spark.registry import QUERIES
    from openeo_odc_driver_spark.session import get_spark

    spark = get_spark("bench")
    # warm up the JVM, codegen, and the parquet reader path so one-time
    # class-loading isn't billed to whichever query runs first
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/region.parquet").limit(1).count()
    # first-use compilation of the expression classes the headline set
    # leans on: md5 + conv (dedup hashing), higher-order folds
    # (similarity dots), explode, windows, shuffles, timestamp math
    spark.range(2000).selectExpr(
        "id",
        "conv(substring(md5(CAST(id AS STRING)), 1, 7), 16, 10) AS h",
        "aggregate(zip_with(array(1.0d, 2.0d), array(3.0d, 4.0d),"
        " (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS dot",
        "array_sort(transform(sequence(1, 4), i -> CAST(id % i AS DOUBLE)))"
        " AS arr",
        "timestampadd(MONTH, CAST(id % 12 AS INT),"
        " TIMESTAMP '2021-01-01') AS t",
    ).selectExpr(
        "h", "dot", "explode(arr) AS v", "date_trunc('quarter', t) AS q"
    ).groupBy("q").agg({"v": "avg", "h": "max", "dot": "sum"}).collect()
    spark.sql(
        "SELECT id, row_number() OVER (PARTITION BY id % 7 ORDER BY id)"
        " FROM range(2000)"
    ).collect()

    sf = None
    for tok in SF_DIR.rstrip("/").split("/"):
        if tok.startswith("sf"):
            try:
                sf = float(tok[2:])
            except ValueError:
                pass

    # --- anchor calibration (round 13, VERDICT r12 item 2) ------------
    # This box drifts ±50% across batches and ±3x within long sessions
    # (PLANS.md), so raw cross-round walls cannot adjudicate perf. A
    # FIXED calibration query — pure JVM codegen + one shuffle, no
    # parquet, no Python workers, content-independent of the registry —
    # runs best-of-3 at the start, after every K query blocks, and at
    # the end. Its samples measure the box's effective throughput UNDER
    # THIS RUN's contention; `value / anchor_median` is the
    # drift-normalized headline, and the sample spread bounds how much
    # in-run weather any per-query delta must exceed before it means
    # anything. Anchor-normalized comparison starts r13→r14 (earlier
    # rounds carry no anchor).
    def _anchor_once() -> float:
        runs = []
        for _ in range(3):
            spark._jvm.System.gc()
            t0 = time.time()
            (
                spark.range(0, 20_000_000)
                .selectExpr(
                    "id % 97 AS k",
                    "CAST(id % 1021 AS DOUBLE) AS v",
                )
                .groupBy("k")
                .agg({"v": "sum"})
                .selectExpr("sum(`sum(v)`)")
                .write.format("noop").mode("overwrite").save()
            )
            runs.append(time.time() - t0)
        return round(min(runs), 3)

    ANCHOR_EVERY = 10
    anchor_samples: list[float] = [_anchor_once()]

    times: dict[str, float] = {}
    first_run: dict[str, float] = {}
    errors: dict[str, str] = {}
    for qi, name in enumerate(BENCH_QUERIES):
        if qi and qi % ANCHOR_EVERY == 0:
            anchor_samples.append(_anchor_once())
            print(
                f"[bench] anchor@{qi}: {anchor_samples[-1]:.3f}",
                file=sys.stderr,
            )
        fn = QUERIES[name]
        runs = []
        # a single broken query must not zero the whole bench (BENCH_r03
        # died wholesale on one streaming AnalysisException): isolate
        # per-query, report the error, keep the JSON line parsable
        try:
            # Cache-state hygiene (round-8 task #5): every query block
            # starts with an EMPTY Spark cache — a persisted handle
            # leaked by an earlier query (the dedup family persists
            # signature tables and releases them per call) must not
            # subsidize this one, so the per-query numbers are
            # self-contained and reproducible run-over-run. JVM/page
            # cache stays warm by design (`cache_state` in the payload
            # names the regime); the 6-10x cold-DISK swing belongs to
            # the fresh-session scale harness (scratch/scale_probe),
            # never to cross-query ordering inside one bench process.
            spark.catalog.clearCache()
            # JMH-style hygiene: collect BETWEEN query blocks so garbage
            # from earlier queries' runs isn't paid as a mid-measurement
            # major-GC pause (observed: a similarity query at 9-11 s in
            # bench sequence vs 1.5 s isolated, on an idle machine)
            spark._jvm.System.gc()
            # best-of-3, extended to best-of-5 for sub-2 s queries:
            # short single-task stages are where one GC pause or
            # scheduler hiccup flips the min by 2x (r6 bench showed
            # 2.2x swings on queries with zero source changes), and the
            # extra runs cost little exactly when they are needed
            while len(runs) < 3 or (len(runs) < 5 and min(runs) < 2.0):
                if runs:
                    # also collect BETWEEN runs within a block: a major
                    # GC landing mid-run showed as a 42 s outlier in a
                    # 7 s query's block (r8 back-to-back reproducibility
                    # runs) — the min survives, but the pause wastes a
                    # full run's wall and can eat every retry under load
                    spark._jvm.System.gc()
                t0 = time.time()  # single-run numbers on a shared local JVM
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
        except Exception as exc:  # noqa: BLE001 — report and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"[bench] {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        times[name] = round(min(runs), 3)
        # the first run of a block pays whatever state best-of hides
        # (codegen, cleared cache, page-cache misses) — recording it
        # makes the warm/cold gap per query visible instead of implicit
        first_run[name] = round(runs[0], 3)
        print(
            f"[bench] {name}: " + " ".join(f"{r:.3f}" for r in runs),
            file=sys.stderr,
        )

    anchor_samples.append(_anchor_once())
    tiled = tiled_layout_compare(spark)
    total = round(sum(times.values()), 3)
    a_sorted = sorted(anchor_samples)
    anchor_median = round(
        (a_sorted[len(a_sorted) // 2]
         if len(a_sorted) % 2
         else (a_sorted[len(a_sorted) // 2 - 1]
               + a_sorted[len(a_sorted) // 2]) / 2), 3
    )
    # FIELD ORDER IS LOAD-BEARING: the driver archives only the LAST ~2KB
    # of stdout as BENCH_r{N}.json's "tail", so fields serialize in
    # ascending order of diagnostic value. For three rounds the tail began
    # mid-`first_run` (the cold numbers) and cut off `loadavg_end` /
    # `cache_state` / the best-of-N `queries` dict — load-contaminated
    # driver runs read as phantom 2x regressions (r10: 18.9 s FIRST-RUN
    # shipped as if it were the query time; warm best-of-N was 4.4 s).
    # Now: first_run (truncatable) first; queries (the headline numbers)
    # next; tiled_layout + totals + load/cache diagnosis LAST so the kept
    # tail always carries them.
    payload = {
        "metric": "headline_queries_wall",
        "unit": "sec",
        "sf": sf,
        "n_queries": len(BENCH_QUERIES),
        # the first run of each block pays whatever best-of hides
        # (codegen, cleared cache, page-cache misses); diagnostic only,
        # first in the line so truncation eats it before anything else
        "first_run": first_run,
        "queries": times,
        # SURVEY §1.4 tiled layout: storage + wall comparison of the
        # long vs tiled parquet layouts on the NDVI-shaped cube
        "tiled_layout": tiled,
        "value": total,
        # n_ok makes a partial total visibly partial (a query that errors
        # is dropped from `value`, which would otherwise silently shrink
        # the cross-round comparison)
        "n_ok": len(times),
        # host contention is the dominant noise on single-task
        # fixture-scale stages (measured: repetition_scores 0.9s at load
        # 0.4 vs 2.0s at load 3.8, see PLANS.md) — stamp it for forensics
        "loadavg_end": round(os.getloadavg()[0], 2),
        # drift calibration (round 13): a FIXED pure-JVM query sampled
        # at the start, every 10 query blocks, and at the end. The box
        # drifts ±50% across batches (PLANS.md), so cross-round claims
        # quote value_per_anchor (total / anchor_median, dimensionless)
        # and any per-query delta smaller than anchor_spread is weather
        "anchor": {
            "samples_sec": anchor_samples,
            "median_sec": anchor_median,
            "spread": round(max(anchor_samples) / max(min(anchor_samples),
                                                      1e-9), 2),
            "every_k": ANCHOR_EVERY,
            "def": "range(20M) mod-key groupBy sum, best-of-3",
        },
        "value_per_anchor": round(total / max(anchor_median, 1e-9), 1),
        # measurement regime, stamped explicitly (round-8 task #5): the
        # headline numbers are warm-JVM best-of-N minima with the Spark
        # cache CLEARED before every query block — reproducible and
        # self-contained, but NOT cold-disk numbers (those live in the
        # fresh-session scale tables in PLANS.md)
        "cache_state": "warm-jvm best-of-n, per-query clearCache",
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
