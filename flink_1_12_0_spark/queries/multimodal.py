"""Multimodal pipeline queries: binary payload decode stats and video
frame sampling, oracle-checked via the shared md5 hash primitive; feature
extraction registered as the (genuinely non-SQL) model-stub path."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_12_0_spark.operators.multimodal import (
    decode_media,
    extract_features,
    make_media_table,
    sample_frames,
)
from flink_1_12_0_spark.registry import query
from flink_1_12_0_spark.tables import load_tables


@query(
    "mm_decode_stats",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           count(*) AS cnt,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           round(avg(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 256), 4) AS avg_level
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
)
def mm_decode_stats(spark, sf_dir):
    """media table → Arrow-batched decode (stubbed) → stats per mime.
    The fake decoder's outputs are hash-derived, so the oracle recomputes
    them in SQL — the full mapInPandas plumbing is value-checked."""
    t = load_tables(spark, sf_dir)
    media = make_media_table(t["documents"])
    decoded = decode_media(media)
    return (
        decoded.groupBy(F.col("meta.mime").alias("mime"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("mean_level"), 4).alias("avg_level"),
        )
        .orderBy("mime")
    )


@query(
    "mm_frame_sample",
    oracle="""
    SELECT count(DISTINCT doc_id) AS n_videos,
           CAST(sum(greatest(1, CAST(floor(n_chars / 100.0 * 0.5) AS BIGINT)))
                AS BIGINT) AS total_frames
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Video rows exploded to sampled frames at 0.5 fps (sequence+explode,
    JVM-side)."""
    t = load_tables(spark, sf_dir)
    frames = sample_frames(make_media_table(t["documents"]), fps=0.5)
    return frames.agg(
        F.countDistinct("media_id").alias("n_videos"),
        F.count("*").alias("total_frames"),
    )


@query(
    "mm_feature_pipeline",
    oracle="""
    SELECT doc_id AS media_id,
           16 AS dim,
           round(list_sum(list_transform(range(0, 16),
                 i -> (CAST('0x' || substr(md5(text || ':' || CAST(i AS VARCHAR)), 1, 8)
                            AS BIGINT) % 1000) / 1000.0)), 4) AS f_sum
    FROM documents ORDER BY media_id
    """,
)
def mm_feature_pipeline(spark, sf_dir):
    """decode → embed pipeline: payloads to 16-dim feature vectors, then a
    per-item aggregate proving vector shape and distribution.  The embed
    step is a model stub (NotImplementedError on real=True) whose fake
    output is md5-derived, so the oracle recomputes it in SQL — the full
    mapInPandas plumbing is value-checked."""
    t = load_tables(spark, sf_dir)
    feats = extract_features(make_media_table(t["documents"]), dim=16)
    return feats.select(
        "media_id",
        F.size("features").alias("dim"),
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 4).alias("f_sum"),
    ).orderBy("media_id")


@query(
    "mm_audio_energy",
    oracle="""
    WITH a AS (
        SELECT doc_id, text,
               greatest(1, CAST(ceil(n_chars/100.0/2.0) AS BIGINT)) AS nw
        FROM documents WHERE doc_id % 3 = 1),
    w AS (
        SELECT doc_id, text, CAST(unnest(range(0, nw)) AS INT) AS win_id
        FROM a)
    SELECT doc_id AS media_id, count(*) AS n_windows,
           round(avg(CAST('0x' || substr(md5(text || '#' || CAST(win_id AS VARCHAR)), 1, 15)
                          AS BIGINT) % 256), 4) AS avg_energy,
           CAST(max(CAST('0x' || substr(md5(text || '#' || CAST(win_id AS VARCHAR)), 1, 15)
                         AS BIGINT) % 256) AS BIGINT) AS max_energy
    FROM w GROUP BY 1 ORDER BY 1
    """,
)
def mm_audio_energy(spark, sf_dir):
    """Audio rows framed into 2s energy windows (librosa stubbed with the
    md5 fake) then aggregated per clip — the decode→frame→aggregate audio
    pipeline with all plumbing (binary payloads, metadata struct, Arrow
    batching) real."""
    from flink_1_12_0_spark.operators.multimodal import audio_energy_windows

    t = load_tables(spark, sf_dir)
    media = make_media_table(t["documents"]).where(
        F.col("meta.mime") == "audio/wav"
    )
    wins = audio_energy_windows(media, window_s=2.0)
    return (
        wins.groupBy("media_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.round(F.avg("energy"), 4).alias("avg_energy"),
            F.max("energy").cast("bigint").alias("max_energy"),
        )
        .orderBy("media_id")
    )


@query(
    "mm_content_dedup",
    oracle="""
    WITH h AS (SELECT doc_id AS media_id, md5(substr(text, 1, 32)) AS checksum
               FROM documents),
    g AS (SELECT checksum, count(*) AS n_copies, min(media_id) AS keeper
          FROM h GROUP BY 1)
    SELECT h.media_id, g.keeper, g.n_copies
    FROM h JOIN g ON h.checksum = g.checksum
    WHERE h.media_id <> g.keeper
    ORDER BY h.media_id
    """,
)
def mm_content_dedup(spark, sf_dir):
    """Multimodal dedup on opaque payload bytes: checksum the LEADING
    32-byte block of the binary column (md5, computed JVM-side — the
    first block of a content-defined-chunking dedup pass; a whole-payload
    checksum finds zero collisions in this fixture and proved nothing),
    keep the lowest id per checksum, emit the duplicates with their
    keeper.  One hash shuffle on the checksum at any scale — the binary
    payload itself never shuffles (only the 32-char digest does), which
    is the point at 100 TB of media.  The fixture payload is ASCII text
    bytes, so the oracle's substr(text) IS the byte slice."""
    t = load_tables(spark, sf_dir)
    media = make_media_table(t["documents"])
    h = media.select(
        "media_id", F.md5(F.substring("payload", 1, 32)).alias("checksum")
    )
    g = h.groupBy("checksum").agg(
        F.count("*").alias("n_copies"), F.min("media_id").alias("keeper")
    )
    return (
        h.join(g, "checksum")
        .where(F.col("media_id") != F.col("keeper"))
        .select("media_id", "keeper", "n_copies")
        .orderBy("media_id")
    )


@query(
    "stream_mm_content_dedup",
    oracle="""
    WITH h AS (SELECT doc_id AS media_id, md5(substr(text, 1, 32)) AS checksum
               FROM documents),
    firsts AS (SELECT checksum, min(media_id) AS keeper FROM h GROUP BY 1)
    SELECT h.media_id, h.media_id <> f.keeper AS is_dup
    FROM h JOIN firsts f ON h.checksum = f.checksum
    ORDER BY h.media_id
    """,
)
def stream_mm_content_dedup(spark, sf_dir):
    """Streaming media dedup at INGEST: payloads arrive as a stream,
    each has its leading 32-byte block checksummed JVM-side (only the
    32-char digest reaches the stateful stage — the media bytes never
    shuffle; the block checksum, not the whole-payload one, so the
    fixture actually produces dup flags) and is flagged the moment an
    earlier media item claimed the digest.  Same sharded first-seen
    state core as the text/embedding streaming dedups;
    batching-invariant semantics (earlier = smaller media_id)."""
    from flink_1_12_0_spark.operators.multimodal import make_media_table
    from flink_1_12_0_spark.streaming.core import _stream_dir, run_to_memory
    from flink_1_12_0_spark.streaming.stateful import streaming_first_seen_flag

    load_tables(spark, sf_dir)
    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    sdf = spark.readStream.schema(schema).parquet(_stream_dir(path))
    h = make_media_table(sdf).select(
        "media_id", F.md5(F.substring("payload", 1, 32)).alias("checksum")
    )
    flagged = streaming_first_seen_flag(h, ["checksum"], "media_id")
    out = run_to_memory(flagged, output_mode="update")
    return (
        out.select(F.col("media_id"), F.col("dup").alias("is_dup"))
        .orderBy("media_id")
    )


@query(
    "mm_scene_cuts",
    oracle="""
    WITH vids AS (
        SELECT doc_id, text,
               greatest(1, CAST(floor(n_chars / 100.0 * 0.5) AS BIGINT)) AS nf
        FROM documents WHERE doc_id % 3 = 2),
    frames AS (
        SELECT doc_id, text, CAST(i AS BIGINT) AS frame_idx
        FROM vids, unnest(range(0, nf)) AS t(i)),
    lum AS (
        SELECT doc_id, frame_idx,
               CAST('0x' || substr(md5(text || ':' || CAST(frame_idx AS VARCHAR)),
                                   1, 8) AS BIGINT) % 256 AS luma
        FROM frames),
    lagged AS (
        SELECT doc_id, luma,
               lag(luma) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pl
        FROM lum)
    SELECT doc_id AS media_id,
           count(*) AS n_frames,
           CAST(sum(CASE WHEN pl IS NOT NULL AND abs(luma - pl) > 128
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts
    FROM lagged GROUP BY doc_id
    ORDER BY media_id
    """,
)
def mm_scene_cuts(spark, sf_dir):
    """Shot-boundary detection: frames sampled at 0.5 fps, per-frame fake
    luma (md5-derived, JVM conv/md5 expressions — zero Python), cut where
    the frame-to-frame delta exceeds 128; per-video frame and cut counts.
    The oracle recomputes the identical luma stream from the text payload
    in SQL."""
    from flink_1_12_0_spark.operators.multimodal import detect_scene_cuts, make_media_table

    t = load_tables(spark, sf_dir)
    cuts = detect_scene_cuts(make_media_table(t["documents"]), fps=0.5)
    return (
        cuts.groupBy(F.col("media_id"))
        .agg(
            F.count("*").alias("n_frames"),
            F.sum(F.when(F.col("is_cut"), 1).otherwise(0)).cast("bigint").alias("n_cuts"),
        )
        .orderBy("media_id")
    )


@query(
    "mm_resize_metadata",
    oracle="""
    WITH img AS (
        SELECT doc_id,
               n_chars % 640 + 16 AS w,
               n_chars % 480 + 16 AS h
        FROM documents WHERE doc_id % 3 = 0),
    scaled AS (
        SELECT doc_id,
               least(1.0, 128.0 / w, 96.0 / h) AS s, w, h
        FROM img)
    SELECT count(*) AS n_images,
           CAST(sum(CAST(floor(w * s) AS BIGINT)) AS BIGINT) AS total_w,
           CAST(sum(CAST(floor(h * s) AS BIGINT)) AS BIGINT) AS total_h
    FROM scaled
    """,
)
def mm_resize_metadata(spark, sf_dir):
    """Image resize plumbing (aspect-preserving clamp to 128x96): the
    recomputed width/height metadata aggregates must match the oracle's
    clamp arithmetic — proves the transform path without a codec."""
    from flink_1_12_0_spark.operators.multimodal import make_media_table, resize_images

    t = load_tables(spark, sf_dir)
    media = make_media_table(t["documents"]).where(
        F.col("meta.mime") == "image/png"
    )
    resized = resize_images(media, max_w=128, max_h=96)
    return resized.agg(
        F.count("*").alias("n_images"),
        F.sum("meta.width").cast("bigint").alias("total_w"),
        F.sum("meta.height").cast("bigint").alias("total_h"),
    )
