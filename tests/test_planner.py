"""Process-graph planner: golden NDVI graph end-to-end + pushdown rule.

Acceptance (VERDICT r1 item 5): the planner must execute the reference's
own fixture graph `/root/reference/tests/process_graphs/
NDVI_Bolzano_median.json` (read in place, never copied).
"""

import os

import pytest
from pyspark.sql import functions as F

from openeo_odc_driver_spark.plans.graph import ProcessGraph

HERE = os.path.dirname(os.path.abspath(__file__))
REF_GRAPH = "/root/reference/tests/process_graphs/NDVI_Bolzano_median.json"


def test_own_ndvi_graph_end_to_end(spark, tmp_path):
    pg = ProcessGraph.from_file(
        f"{HERE}/process_graphs/ndvi_median.json", save_dir=str(tmp_path)
    )
    cube = pg.execute(spark)
    rows = cube.df.collect()
    assert len(rows) == 256  # one NDVI median per pixel
    vals = [r.value for r in rows if r.value is not None]
    assert vals and all(-1.0 <= v <= 1.0 for v in vals)
    # GTiff sink materialized (real .tif + metadata sidecar)
    assert (tmp_path / "save.tif").exists()


@pytest.mark.skipif(not os.path.exists(REF_GRAPH), reason="reference not mounted")
def test_reference_golden_graph_executes(spark, tmp_path):
    """The reference's own test fixture runs unmodified."""
    pg = ProcessGraph.from_file(REF_GRAPH, save_dir=str(tmp_path))
    cube = pg.execute(spark)
    assert cube.df.count() == 256
    assert set(cube.df.columns) == {"y", "x", "value"}


def test_resample_pushdown_rewrites_scan(spark, tmp_path):
    pg = ProcessGraph.from_file(
        f"{HERE}/process_graphs/resample_pushdown.json", save_dir=str(tmp_path)
    )
    # pre-pass marked the node and moved resolution into the load
    load_args = pg.nodes["load"]["arguments"]
    assert load_args["_target_resolution"] == 20.0
    assert pg.nodes["coarsen"].get("_noop") is True
    cube = pg.execute(spark)
    xs = sorted(r.x for r in cube.df.select("x").distinct().collect())
    assert xs[1] - xs[0] == 20.0  # coarse grid reached the scan
    # 16 source pixels at 10 m snap into 9 distinct 20 m cells per axis
    # (x=150 rounds up into the 9th cell at 160)
    assert cube.df.count() == 3 * 9 * 9


def test_apply_dimension_quantiles(spark):
    graph = {
        "process_graph": {
            "l": {"process_id": "load_collection", "arguments": {"id": "synthetic"}},
            "qs": {
                "process_id": "apply_dimension",
                "arguments": {
                    "data": {"from_node": "l"},
                    "dimension": "t",
                    "process": {
                        "process_graph": {
                            "z": {
                                "process_id": "quantiles",
                                "arguments": {
                                    "data": {"from_parameter": "data"},
                                    "probabilities": [0.25, 0.75],
                                },
                                "result": True,
                            }
                        }
                    },
                },
                "result": True,
            },
        }
    }
    cube = ProcessGraph(graph).execute(spark)
    assert "prob" in cube.df.columns
    probs = {r.prob for r in cube.df.select("prob").distinct().collect()}
    assert probs == {0.25, 0.75}


def test_zonal_stats_through_planner(spark):
    """aggregate_spatial with a GeoJSON FeatureCollection argument."""
    from openeo_odc_driver_spark.functions.geometry import FIXTURE_POLYGONS

    def close(ring):
        return [list(p) for p in ring] + [list(ring[0])]

    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "geometry": {
                "type": "Polygon", "coordinates": [close(FIXTURE_POLYGONS[0])]}},
            {"type": "Feature", "geometry": {
                "type": "Polygon", "coordinates": [close(FIXTURE_POLYGONS[1])]}},
        ],
    }
    graph = {
        "process_graph": {
            "l": {"process_id": "load_collection", "arguments": {"id": "synthetic"}},
            "z": {
                "process_id": "aggregate_spatial",
                "arguments": {
                    "data": {"from_node": "l"},
                    "geometries": fc,
                    "reducer": {"process_graph": {"m": {
                        "process_id": "mean",
                        "arguments": {"data": {"from_parameter": "data"}},
                        "result": True}}},
                },
                "result": True,
            },
        }
    }
    cube = ProcessGraph(graph).execute(spark)
    # planner default label is the reference's 'result' (:654-656)
    geoms = {r.result for r in cube.df.select("result").distinct().collect()}
    assert geoms == {0, 1}

    graph["process_graph"]["z"]["arguments"]["target_dimension"] = "zone"
    cube2 = ProcessGraph(graph).execute(spark)
    assert "zone" in cube2.df.columns and "result" not in cube2.df.columns


def test_load_result_node(spark, tmp_path):
    """save in one graph, load_result in the next (odc_backend job chain)."""
    jobs_root = tmp_path / "jobs"
    g1 = {
        "process_graph": {
            "l": {"process_id": "load_collection", "arguments": {"id": "synthetic"}},
            "s": {"process_id": "save_result",
                  "arguments": {"data": {"from_node": "l"}, "format": "PARQUET"},
                  "result": True},
        }
    }
    ProcessGraph(g1, save_dir=str(jobs_root / "job1")).execute(spark)
    g2 = {
        "process_graph": {
            "lr": {"process_id": "load_result",
                   "arguments": {"path": str(jobs_root / "job1" / "s")}},
            "r": {
                "process_id": "reduce_dimension",
                "arguments": {
                    "data": {"from_node": "lr"},
                    "dimension": "t",
                    "reducer": {"process_graph": {"m": {
                        "process_id": "max",
                        "arguments": {"data": {"from_parameter": "data"}},
                        "result": True}}},
                },
                "result": True,
            },
        }
    }
    cube = ProcessGraph(g2).execute(spark)
    assert cube.df.count() == 3 * 16 * 16


def test_planner_rejects_unknown_process(spark):
    with pytest.raises(NotImplementedError):
        ProcessGraph(
            {
                "process_graph": {
                    "z": {"process_id": "warp_drive", "arguments": {}, "result": True}
                }
            }
        ).execute(spark)


def test_resample_pushdown_only_when_adjacent(spark):
    """ADVICE r2: a resample_spatial with another operator between it and
    the load must NOT be folded into the scan (coarsening before e.g. a
    kernel changes results) — it executes as an explicit regrid instead.
    Also: constructing a ProcessGraph must not mutate the caller's dict."""
    import copy
    import json

    with open(f"{HERE}/process_graphs/resample_pushdown.json") as f:
        adjacent = json.load(f)

    # non-adjacent variant: load → reduce(median over t) → resample
    graph = {
        "process_graph": {
            "load": {
                "process_id": "load_collection",
                "arguments": {"id": "synthetic", "bands": ["B04"]},
            },
            "med": {
                "process_id": "reduce_dimension",
                "arguments": {
                    "data": {"from_node": "load"},
                    "dimension": "t",
                    "reducer": {
                        "process_graph": {
                            "m": {
                                "process_id": "median",
                                "arguments": {"data": {"from_parameter": "data"}},
                                "result": True,
                            }
                        }
                    },
                },
            },
            "coarsen": {
                "process_id": "resample_spatial",
                "arguments": {
                    "data": {"from_node": "med"},
                    "resolution": 20.0,
                    "method": "near",
                },
                "result": True,
            },
        }
    }
    snapshot = copy.deepcopy(graph)
    pg = ProcessGraph(graph)
    assert graph == snapshot, "planner mutated the caller's graph"
    assert "_noop" not in pg.nodes["coarsen"]
    assert "_target_resolution" not in pg.nodes["load"]["arguments"]
    out = pg.execute(spark)
    # 16x16 @10m grid coarsened to 20m AFTER the reduce: 8-ish cells/axis
    xs = {r.x for r in out.df.select("x").distinct().collect()}
    assert all(x % 20.0 == 0.0 for x in xs)

    # adjacent fixture still folds
    snapshot2 = copy.deepcopy(adjacent)
    pg2 = ProcessGraph(adjacent)
    assert adjacent == snapshot2
    assert pg2.nodes["coarsen"].get("_noop") is True
    assert pg2.nodes["load"]["arguments"]["_target_resolution"] == 20.0


def test_fit_curve_model_graph_compiles_to_harmonic_ast():
    """The openEO fit_curve `function` sub-graph (pi / array_element /
    arithmetic / trig nodes, reference openeo_odc_driver.py:227-281)
    compiles to the exact ModelExpr tree harmonic_model() builds."""
    from openeo_odc_driver_spark.operators.curve import harmonic_model
    from openeo_odc_driver_spark.plans.graph import _compile_model

    g = {
        "p": {"process_id": "pi", "arguments": {}},
        "two_pi": {"process_id": "multiply",
                   "arguments": {"x": {"from_node": "p"}, "y": 2}},
        # match harmonic_model's w = const(2*pi/365.25) exactly: the
        # graph divides the same doubles, hence the same IEEE result
        "w": {"process_id": "divide",
              "arguments": {"x": {"from_node": "two_pi"}, "y": 365.25}},
        "a0": {"process_id": "array_element",
               "arguments": {"data": {"from_parameter": "parameters"}, "index": 0}},
        "a1": {"process_id": "array_element",
               "arguments": {"data": {"from_parameter": "parameters"}, "index": 1}},
        "a2": {"process_id": "array_element",
               "arguments": {"data": {"from_parameter": "parameters"}, "index": 2}},
        "wt": {"process_id": "multiply",
               "arguments": {"x": {"from_node": "w"}, "y": {"from_parameter": "x"}}},
        "c": {"process_id": "cos", "arguments": {"x": {"from_node": "wt"}}},
        "s": {"process_id": "sin", "arguments": {"x": {"from_node": "wt"}}},
        "m1": {"process_id": "multiply",
               "arguments": {"x": {"from_node": "a1"}, "y": {"from_node": "c"}}},
        "m2": {"process_id": "multiply",
               "arguments": {"x": {"from_node": "a2"}, "y": {"from_node": "s"}}},
        "inner": {"process_id": "add",
                  "arguments": {"x": {"from_node": "m1"}, "y": {"from_node": "m2"}}},
        "res": {"process_id": "add",
                "arguments": {"x": {"from_node": "a0"}, "y": {"from_node": "inner"}},
                "result": True},
    }
    import numpy as np

    compiled = _compile_model(g)
    want = harmonic_model()
    t = np.linspace(0.0, 700.0, 13)
    p = np.array([1.5, -0.25, 0.75])
    assert np.array_equal(compiled(t, p), want(t, p))
    assert compiled.n_params == want.n_params == 3


def test_fit_curve_through_planner(spark):
    graph = {
        "process_graph": {
            "l": {"process_id": "load_collection", "arguments": {"id": "synthetic"}},
            "bands": {"process_id": "filter_bands",
                      "arguments": {"data": {"from_node": "l"}, "bands": ["B04"]}},
            "fit": {
                "process_id": "fit_curve",
                "arguments": {
                    "data": {"from_node": "bands"},
                    "parameters": [0, 0, 0],
                    "function": {"process_graph": {
                        "a0": {"process_id": "array_element",
                               "arguments": {"data": {"from_parameter": "parameters"},
                                              "index": 0}},
                        "a1": {"process_id": "array_element",
                               "arguments": {"data": {"from_parameter": "parameters"},
                                              "index": 1}},
                        "lin": {"process_id": "multiply",
                                "arguments": {"x": {"from_node": "a1"},
                                               "y": {"from_parameter": "x"}}},
                        "res": {"process_id": "add",
                                "arguments": {"x": {"from_node": "a0"},
                                               "y": {"from_node": "lin"}},
                                "result": True},
                    }},
                },
                "result": True,
            },
        }
    }
    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    cube = ProcessGraph(graph).execute(spark)
    rows = cube.df.collect()
    assert len(rows) == 256  # one param vector per pixel for the band
    assert all(len(r.params) == 2 for r in rows)


def test_aggregate_spatial_window_through_planner(spark):
    graph = {
        "process_graph": {
            "l": {"process_id": "load_collection", "arguments": {"id": "synthetic"}},
            "w": {
                "process_id": "aggregate_spatial_window",
                "arguments": {
                    "data": {"from_node": "l"},
                    "reducer": {"process_graph": {
                        "m": {"process_id": "mean",
                              "arguments": {"data": {"from_parameter": "data"}},
                              "result": True}}},
                    "size": [4, 4],
                    "boundary": "pad",
                },
                "result": True,
            },
        }
    }
    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    cube = ProcessGraph(graph).execute(spark)
    # 16x16 grid -> 4x4 windows: 3 bands x 24 times x 16 windows
    assert cube.df.count() == 3 * 24 * 16


def test_run_udf_code_string_through_planner(spark):
    graph = {
        "process_graph": {
            "l": {"process_id": "load_collection", "arguments": {"id": "synthetic"}},
            "u": {
                "process_id": "run_udf",
                "arguments": {
                    "data": {"from_node": "l"},
                    "udf": (
                        "def apply_datacube(df, context):\n"
                        "    df = df.copy()\n"
                        "    df['value'] = df['value'] * 2\n"
                        "    return df\n"
                    ),
                    "runtime": "Python",
                },
                "result": True,
            },
        }
    }
    from openeo_odc_driver_spark.plans.graph import ProcessGraph
    from openeo_odc_driver_spark.sources.synthetic import synthetic_cube

    got = ProcessGraph(graph).execute(spark)
    base = synthetic_cube(spark).df
    a = sorted((r.band, r.time, r.y, r.x, r.value) for r in got.df.collect())
    b = sorted(
        (r.band, r.time, r.y, r.x, None if r.value is None else r.value * 2)
        for r in base.collect()
    )
    assert a == b


def test_run_udf_rejects_r_runtime(spark):
    graph = {
        "process_graph": {
            "l": {"process_id": "load_collection", "arguments": {"id": "synthetic"}},
            "u": {"process_id": "run_udf",
                  "arguments": {"data": {"from_node": "l"},
                                 "udf": "x <- 1", "runtime": "R"},
                  "result": True},
        }
    }
    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    with pytest.raises(NotImplementedError, match="R is out of scope"):
        ProcessGraph(graph).execute(spark)


def test_drop_dimension_through_planner(spark):
    graph = {
        "process_graph": {
            "l": {"process_id": "load_collection", "arguments": {"id": "synthetic"}},
            "b": {"process_id": "filter_bands",
                  "arguments": {"data": {"from_node": "l"}, "bands": ["B04"]}},
            "d": {"process_id": "drop_dimension",
                  "arguments": {"data": {"from_node": "b"}, "name": "bands"},
                  "result": True},
        }
    }
    from openeo_odc_driver_spark.plans.graph import ProcessGraph

    cube = ProcessGraph(graph).execute(spark)
    assert "band" not in cube.df.columns


def _sorted_pdf(df):
    cols = sorted(df.columns)
    return (
        df.toPandas()[cols].sort_values(cols).reset_index(drop=True)
    )


@pytest.mark.parametrize(
    "graph", ["ndvi_median", "masked_seasonal", "resample_pushdown"]
)
def test_tiled_mode_matches_long_on_all_fixture_graphs(
    spark, tmp_path, graph
):
    """ProcessGraph(tiled=True) executes the SAME graph on the packed
    tile layout and must agree cell-for-cell with the long plan — the
    NDVI band expression, the mask chain, and the pushdown graph cover
    band-expression reducers, tiled mask/resample/apply, and the
    explicit-regrid demotion path."""
    import pandas as pd

    path = f"{HERE}/process_graphs/{graph}.json"
    long_df = ProcessGraph.from_file(
        path, save_dir=str(tmp_path / "long")
    ).execute(spark).df
    tiled_df = ProcessGraph.from_file(
        path, save_dir=str(tmp_path / "tiled"), tiled=True
    ).execute(spark).df
    pd.testing.assert_frame_equal(
        _sorted_pdf(long_df), _sorted_pdf(tiled_df), check_exact=True
    )


@pytest.mark.skipif(not os.path.exists(REF_GRAPH), reason="reference not mounted")
def test_reference_golden_graph_executes_tiled(spark, tmp_path):
    """The reference's own NDVI fixture runs unmodified in TILED mode
    and matches the long execution exactly."""
    import pandas as pd

    long_df = ProcessGraph.from_file(
        REF_GRAPH, save_dir=str(tmp_path / "l")
    ).execute(spark).df
    tiled_df = ProcessGraph.from_file(
        REF_GRAPH, save_dir=str(tmp_path / "t"), tiled=True
    ).execute(spark).df
    pd.testing.assert_frame_equal(
        _sorted_pdf(long_df), _sorted_pdf(tiled_df), check_exact=True
    )


def test_tiled_mode_demotes_gracefully_for_unsupported_process(spark):
    """A process without a tile path (apply_dimension/quantiles) demotes
    its tile-resident input through from_tiled and the graph still
    completes with identical output — degradation, never an error."""
    import pandas as pd

    graph = {
        "load": {
            "process_id": "load_collection",
            "arguments": {"id": "s2_l2a", "bands": ["B04"]},
        },
        "q": {
            "process_id": "apply_dimension",
            "arguments": {
                "data": {"from_node": "load"},
                "dimension": "t",
                "process": {
                    "process_graph": {
                        "qq": {
                            "process_id": "quantiles",
                            "arguments": {
                                "data": {"from_parameter": "data"},
                                "probabilities": [0.25, 0.75],
                            },
                            "result": True,
                        }
                    }
                },
            },
            "result": True,
        },
    }
    long_df = ProcessGraph(graph).execute(spark).df
    tiled_df = ProcessGraph(graph, tiled=True).execute(spark).df
    pd.testing.assert_frame_equal(
        _sorted_pdf(long_df), _sorted_pdf(tiled_df), check_exact=True
    )
