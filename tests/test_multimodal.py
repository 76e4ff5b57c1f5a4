"""Multimodal plumbing: real stdlib-WAV and stdlib-PNG encode/decode
round-trips, the non-PNG codec boundary, and the fixed-expected-value
oracle machinery."""

import io
import wave

import numpy as np
import pytest

from openeo_odc_driver_spark.fixtures import values_oracle_sql
from openeo_odc_driver_spark.pipeline.multimodal import (
    attach_fake_images,
    attach_wav_audio,
    decode_audio,
    decode_image,
    synth_wav_bytes,
)


def test_synth_wav_is_real_riff():
    b = synth_wav_bytes(7, sample_rate=8000, n_samples=2048)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    with wave.open(io.BytesIO(b), "rb") as w:
        assert w.getframerate() == 8000
        assert w.getnframes() == 2048
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2


def test_wav_roundtrip_features_match_local(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in decode_audio(attach_wav_audio(docs), fake=False).collect()
    }
    assert len(got) == 8
    # reference features computed locally from the same bytes
    b = synth_wav_bytes(3, 8000, 2048)
    with wave.open(io.BytesIO(b), "rb") as w:
        x = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    xf = x.astype("float64") / 32768.0
    r = got[3]
    assert r["duration_s"] == 2048 / 8000
    assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(xf**2))), abs=0)
    assert r["peak"] == pytest.approx(float(np.abs(xf).max()), abs=0)


def test_synth_png_is_real_png():
    from openeo_odc_driver_spark.pipeline.multimodal import synth_png_bytes
    from openeo_odc_driver_spark.sinks.png import decode_png

    b = synth_png_bytes(7, width=16, height=12)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    arr = decode_png(b)
    assert arr.shape == (3, 12, 16)


def test_png_roundtrip_pixel_stats_match_local(spark):
    from openeo_odc_driver_spark.pipeline.multimodal import (
        attach_png_images,
        synth_png_bytes,
    )
    from openeo_odc_driver_spark.sinks.png import decode_png

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in decode_image(attach_png_images(docs), fake=False).collect()
    }
    assert len(got) == 6
    # reference stats computed locally from the same bytes
    arr = decode_png(synth_png_bytes(3)).astype("float64")  # (3, h, w)
    r = got[3]
    assert (r["width"], r["height"]) == (32, 32)
    assert r["mean_r"] == pytest.approx(float(arr[0].mean()), abs=0)
    assert r["mean_b"] == pytest.approx(float(arr[2].mean()), abs=0)


def test_image_decode_real_path_rejects_non_png(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(Exception, match="(?i)png"):
        decode_image(attach_fake_images(docs), fake=False).collect()


def test_missing_fixture_is_loud_not_silent():
    sql = values_oracle_sql("no_such_fixture_xyz")
    assert "missing fixture" in sql  # sentinel FAILs the gate, never skips


def test_fixture_oracle_roundtrips_floats():
    import duckdb

    sql = values_oracle_sql("multimodal_audio_decode")
    pdf = duckdb.sql(sql).df()
    assert list(pdf.columns) == [
        "doc_id", "duration_s", "rms", "peak", "zero_crossing_rate"
    ]
    assert len(pdf) == 128
    assert pdf["doc_id"].dtype.kind == "i"
    assert pdf["rms"].dtype.kind == "f"
