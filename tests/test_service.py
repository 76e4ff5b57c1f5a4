"""Service layer: POST /graph with md5 cache, STAC metadata, job cancel."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def client(spark, tmp_path_factory):
    from openeo_odc_driver_spark.service import create_app

    app = create_app(spark, work_dir=str(tmp_path_factory.mktemp("svc")))
    app.config["TESTING"] = True
    return app.test_client()


HERE = os.path.dirname(os.path.abspath(__file__))


def _graph():
    with open(f"{HERE}/process_graphs/ndvi_median.json") as f:
        return json.load(f)


def test_post_graph_executes_and_caches(client):
    r1 = client.post("/graph", json=_graph())
    assert r1.status_code == 200
    body1 = r1.get_json()
    assert body1["cached"] is False
    assert os.path.exists(body1["output"])

    # identical graph → md5 cache hit, no re-execution (odc_backend.py:62-85)
    r2 = client.post("/graph", json=_graph())
    body2 = r2.get_json()
    assert body2["cached"] is True
    assert body2["job_id"] != body1["job_id"]
    assert os.path.exists(body2["output"])


def test_post_bad_graph_returns_openeo_error(client):
    r = client.post("/graph", json={"process_graph": {
        "z": {"process_id": "warp_drive", "arguments": {}, "result": True}}})
    assert r.status_code == 400
    assert r.get_json()["code"] == "NotImplementedError"


def test_collections_stac_shape(client):
    r = client.get("/collections")
    cols = {c["id"]: c for c in r.get_json()["collections"]}
    assert "s2_l2a" in cols
    dims = cols["s2_l2a"]["cube:dimensions"]
    assert dims["bands"]["values"] == ["B04", "B08"]
    assert dims["x"]["step"] == 0.0078125

    r404 = client.get("/collections/nope")
    assert r404.status_code == 404


def test_processes_discovery(client):
    r = client.get("/processes")
    ids = {p["id"] for p in r.get_json()["processes"]}
    assert {"load_collection", "reduce_dimension", "median", "mod",
            "resample_spatial"} <= ids


def test_stop_unknown_job_404(client):
    r = client.delete("/stop_job", json={"id": "ghost"})
    assert r.status_code == 404


def test_registry_endpoint_reports_verification_status(client):
    r = client.get("/registry")
    assert r.status_code == 200
    body = r.get_json()
    assert body["n_total"] >= 150
    ids = {e["id"] for e in body["queries"]}
    assert {"tpch_q1", "fit_curve_harmonic", "paragraph_dedup"} <= ids
    # every query carries an oracle since round 5
    assert all(e["oracle"] for e in body["queries"])
    # the shipped CORRECTNESS_r04 report marks its green rows verified
    by_id = {e["id"]: e["status"] for e in body["queries"]}
    assert by_id["tpch_q1"] == "verified"
