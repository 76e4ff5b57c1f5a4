"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The IMAGE decode step is STUBBED (no PIL/cv2 in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which case
a deterministic fake decoder (seeded by content hash) produces arrays with
the right shapes — so the Spark-side plumbing (schema, batch shape,
partition sizing, UDF signatures) is real and tested end-to-end.
The AUDIO decode step is REAL: `decode_audio(fake=False)` parses RIFF/WAV
(PCM16) with the stdlib `wave` module, and `attach_wav_audio` synthesizes
genuine WAV payloads with the stdlib encoder.

Scale notes: binary payloads dominate row size, so `maxRecordsPerBatch`
must cap Arrow batches by *bytes* not rows — `frame_sample`/`resize` set a
conservative batch cap via repartitioning on size buckets upstream; blobs
never pass through a shuffle after decode (features are extracted in the
same stage as the scan).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

IMAGE_META_SCHEMA = "width int, height int, channels int, format string"


def attach_fake_images(docs: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Fixture adapter: derive a deterministic binary 'image' column from
    document text (content-addressed fake payload) + typed metadata."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("image"),
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(3).alias("channels"),
            F.lit("fake-rgb").alias("format"),
        ).alias("image_meta"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    seed = int.from_bytes(payload[:8], "big", signed=False) % (2**32)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_image(df: DataFrame, fake: bool = True) -> DataFrame:
    """binary → decoded pixel stats via mapInPandas (Arrow batches).

    Real decoders (PIL/cv2) are not in the image — `fake=False` raises,
    marking exactly where the real library call goes.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/cv2 (not in this container); "
            "use fake=True for the deterministic test decoder"
        )

    out_schema = (
        "doc_id long, width int, height int, mean_r double, mean_g double, "
        "mean_b double, brightness double"
    )

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w = int(r["image_meta"]["width"])
                h = int(r["image_meta"]["height"])
                arr = _fake_decode(bytes(r["image"]), w, h)
                means = arr.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (r["doc_id"], w, h, float(means[0]), float(means[1]),
                     float(means[2]), float(means.mean()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mean_r", "mean_g",
                         "mean_b", "brightness"],
            )

    return df.mapInPandas(decode_batch, out_schema)


AUDIO_META_SCHEMA = "sample_rate int, n_samples int, channels int, format string"


def attach_fake_audio(docs: DataFrame, sample_rate: int = 16000,
                      n_samples: int = 4096) -> DataFrame:
    """Fixture adapter: deterministic binary 'audio' column + typed
    metadata (same content-addressed scheme as the image path)."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("audio"),
        F.struct(
            F.lit(sample_rate).alias("sample_rate"),
            F.lit(n_samples).alias("n_samples"),
            F.lit(1).alias("channels"),
            F.lit("fake-pcm").alias("format"),
        ).alias("audio_meta"),
    )


def synth_wav_bytes(seed: int, sample_rate: int = 8000,
                    n_samples: int = 2048) -> bytes:
    """Deterministic mono PCM16 RIFF/WAV: a seed-pitched sine plus seeded
    noise, encoded with the stdlib ``wave`` module — *real* WAV bytes any
    audio tool can open, content-addressed so fixtures are reproducible."""
    import io
    import wave as _wave

    rng = np.random.default_rng(seed % (2 ** 32))
    freq = 110.0 * (1 + seed % 32)  # 110 Hz .. 3.6 kHz
    t = np.arange(n_samples, dtype="float64") / sample_rate
    x = 0.5 * np.sin(2 * np.pi * freq * t) + rng.normal(0.0, 0.1, n_samples)
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def attach_wav_audio(docs: DataFrame, sample_rate: int = 8000,
                     n_samples: int = 2048) -> DataFrame:
    """Fixture adapter: a **real** RIFF/WAV binary column (stdlib encoder,
    seeded by doc_id) + typed metadata. Arrow-batched pandas UDF — the
    payload never leaves the executor that synthesized it."""
    @F.pandas_udf("binary")
    def make_wav(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_wav_bytes(int(i), sample_rate, n_samples))

    return docs.select(
        "doc_id",
        make_wav("doc_id").alias("audio"),
        F.struct(
            F.lit(sample_rate).alias("sample_rate"),
            F.lit(n_samples).alias("n_samples"),
            F.lit(1).alias("channels"),
            F.lit("wav/pcm_s16le").alias("format"),
        ).alias("audio_meta"),
    )


def decode_audio(df: DataFrame, fake: bool = True) -> DataFrame:
    """binary → waveform features via mapInPandas (Arrow batches): RMS,
    peak, zero-crossing rate, duration.

    ``fake=False`` is a **real decoder**: stdlib ``wave`` + numpy parse
    RIFF/WAV (PCM16) payloads — no third-party codec needed. ``fake=True``
    keeps the hash-seeded synthetic path (the image-style stub) for
    payloads that aren't WAV."""
    out_schema = (
        "doc_id long, duration_s double, rms double, peak double, "
        "zero_crossing_rate double"
    )

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as _wave

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if fake:
                    sr = int(r["audio_meta"]["sample_rate"])
                    n = int(r["audio_meta"]["n_samples"])
                    seed = int.from_bytes(bytes(r["audio"])[:8], "big") % (2 ** 32)
                    wave_f = np.random.default_rng(seed).normal(0.0, 0.25, size=n)
                else:
                    with _wave.open(io.BytesIO(bytes(r["audio"])), "rb") as w:
                        sr = w.getframerate()
                        n = w.getnframes()
                        raw = w.readframes(n)
                    wave_f = (
                        np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
                    )
                zc = float(np.mean(np.abs(np.diff(np.signbit(wave_f)))))
                rows.append(
                    (r["doc_id"], n / sr, float(np.sqrt(np.mean(wave_f ** 2))),
                     float(np.abs(wave_f).max()), zc)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "duration_s", "rms", "peak",
                         "zero_crossing_rate"],
            )

    return df.mapInPandas(decode_batch, out_schema)


def frame_sample(df: DataFrame, every_n: int = 10, n_frames: int = 100) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.
    The decode itself is the same stub boundary as decode_image."""
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1), F.lit(every_n))
    return df.select("doc_id", F.explode(idx).alias("frame_idx"))
