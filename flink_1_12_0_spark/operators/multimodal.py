"""Multimodal columns: images / audio / video as opaque binary + typed metadata.

North-star extension (BASELINE.json): a 100 TB training-data pipeline
carries media as ``binary`` payload columns with a metadata struct, and
runs decode / feature-extract / resize / frame-sample as Arrow-batched
pandas functions over ``mapInPandas``.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so the
actual byte → pixels step is STUBBED: ``real=False`` (default) runs a
deterministic fake decoder (hash-derived dimensions/levels — stable across
engines, so results stay oracle-checkable); ``real=True`` raises
NotImplementedError where the library call would go.  Everything around
the stub — schema, batch iteration, partitioning, output shape — is real
Spark plumbing and is what this module tests.

Scale notes: payloads stay distributed end-to-end (no collect); decode is
per-partition streaming over Arrow batches, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × max payload size;
feature vectors come out as ``array<float>`` ready for the similarity
operators (llm_similarity) — decode → embed → ANN is one pipeline.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct carried next to every payload
MEDIA_META_DDL = "mime string, width int, height int, duration_s double"


def make_media_table(documents: DataFrame) -> DataFrame:
    """Deterministic synthetic media table from ``documents``: payload =
    UTF-8 bytes of the text (stands in for encoded media), metadata typed
    by doc_id.  Columns: media_id, payload (binary), meta (struct)."""
    mime = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            mime.alias("mime"),
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            (F.col("n_chars") / 100.0).alias("duration_s"),
        ).alias("meta"),
    )


def _fake_level(payload: bytes) -> int:
    """Deterministic stand-in for decoded content statistics: 60-bit md5
    prefix mod 256 — the same cross-engine hash primitive the text tier
    uses, so oracles can recompute it in SQL."""
    return int(hashlib.md5(payload).hexdigest()[:15], 16) % 256


def decode_media(df: DataFrame, real: bool = False) -> DataFrame:
    """Decode payloads → per-item content stats (image mean level / audio
    RMS / video luma are all modeled as ``mean_level``).

    Output: input columns (minus payload) + n_bytes + mean_level.
    """
    meta_keep = [c for c in df.columns if c != "payload"]
    schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c != "payload")
    schema += ", n_bytes bigint, mean_level int"

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if real:
                raise NotImplementedError(
                    "real media decode needs PIL/ffmpeg/librosa — not in container"
                )
            out = pdf[meta_keep].copy()
            out["n_bytes"] = pdf["payload"].map(len)
            out["mean_level"] = pdf["payload"].map(_fake_level)
            yield out

    return df.mapInPandas(run, schema)


def extract_features(df: DataFrame, dim: int = 16, real: bool = False) -> DataFrame:
    """Payload → fixed-dim float feature vector (``array<float>``), the
    embed step of a decode → embed → ANN pipeline.  Fake path derives each
    component from ``md5(payload + b":" + str(i))`` — byte-equal to the
    text-level ``md5(text || ':' || i)`` an SQL oracle can recompute —
    real path would call the vision/audio encoder here."""
    keep = [c for c in df.columns if c != "payload"]
    schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c != "payload")
    schema += ", features array<float>"

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if real:
                raise NotImplementedError("real feature extraction needs a model runtime")
            out = pdf[keep].copy()
            out["features"] = pdf["payload"].map(
                lambda b: [
                    (int(hashlib.md5(b + b":" + str(i).encode()).hexdigest()[:8], 16) % 1000)
                    / 1000.0
                    for i in range(dim)
                ]
            )
            yield out

    return df.mapInPandas(run, schema)


def resize_images(df: DataFrame, max_w: int, max_h: int, real: bool = False) -> DataFrame:
    """Resize plumbing: recompute metadata (aspect-preserving clamp) and
    pass the payload through (real path would transcode bytes)."""
    if real:
        raise NotImplementedError("real resize needs PIL — not in container")
    scale = F.least(
        F.lit(1.0),
        F.lit(max_w) / F.col("meta.width"),
        F.lit(max_h) / F.col("meta.height"),
    )
    new_meta = F.struct(
        F.col("meta.mime").alias("mime"),
        F.floor(F.col("meta.width") * scale).cast("int").alias("width"),
        F.floor(F.col("meta.height") * scale).cast("int").alias("height"),
        F.col("meta.duration_s").alias("duration_s"),
    )
    return df.withColumn("meta", new_meta)


def sample_frames(df: DataFrame, fps: float = 1.0) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame at
    ``fps`` (frame_idx, frame_ts_s) — ``sequence`` + ``explode``, JVM-side;
    the per-frame payload decode would plug into :func:`decode_media`."""
    vids = df.where(F.col("meta.mime").startswith("video/"))
    n_frames = F.greatest(
        F.lit(1), F.floor(F.col("meta.duration_s") * F.lit(fps)).cast("int")
    )
    return (
        vids.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ts_s", F.col("frame_idx") / F.lit(fps))
    )


def detect_scene_cuts(
    df: DataFrame, fps: float = 1.0, threshold: int = 128, real: bool = False
) -> DataFrame:
    """Scene-cut detection over sampled video frames: a cut where the
    frame-to-frame luma delta exceeds ``threshold`` — the shot-boundary
    step of a video curation pipeline (frame differencing; real mode
    would decode frames via ffmpeg — NOT in this container → raises).

    The fake per-frame luma derives from ``md5(payload || ':' ||
    frame_idx) % 256`` — ENTIRELY JVM-side expressions (md5/conv), no
    Python anywhere; the lag window partitions by media_id (high
    cardinality, frames-per-video bounded by duration x fps), so the
    whole detector is one hash shuffle at any scale."""
    if real:
        raise NotImplementedError("real scene detection needs ffmpeg frame decode")
    from pyspark.sql.window import Window

    frames = sample_frames(df, fps=fps)
    luma = (
        F.conv(
            F.substring(
                F.md5(F.concat(
                    F.col("payload"),
                    F.encode(F.concat(F.lit(":"), F.col("frame_idx").cast("string")),
                             "utf-8"),
                )), 1, 8,
            ),
            16, 10,
        ).cast("bigint") % 256
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    with_luma = frames.withColumn("luma", luma)
    return with_luma.withColumn(
        "is_cut",
        (F.abs(F.col("luma") - F.lag("luma").over(w)) > threshold)
        & F.lag("luma").over(w).isNotNull(),
    )


def audio_energy_windows(
    df: DataFrame, window_s: float = 2.0, real: bool = False
) -> DataFrame:
    """Audio framing: split each audio payload into fixed event-time
    windows and compute a per-window energy level — librosa RMS over the
    decoded waveform in real mode (NOT in this container → raises), the
    md5-derived deterministic fake otherwise, so oracles recompute it.

    Input needs ``media_id``, ``payload`` (binary) and ``meta.duration_s``;
    output one row per (media_id, win_id) with the window's energy.  Rows
    explode per-partition inside mapInPandas — no shuffle until the
    caller aggregates.
    """
    import math

    out_schema = "media_id bigint, win_id int, energy int"
    src = df.select("media_id", "payload", F.col("meta.duration_s").alias("dur"))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["dur"]):
                if real:
                    raise NotImplementedError("librosa RMS needs the audio stack")
                n = max(1, math.ceil(float(dur) / window_s))
                data = bytes(payload)
                for w in range(n):
                    h = hashlib.md5(data + b"#" + str(w).encode()).hexdigest()
                    rows.append((int(mid), w, int(h[:15], 16) % 256))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "win_id", "energy"])

    return src.mapInPandas(run, out_schema)
