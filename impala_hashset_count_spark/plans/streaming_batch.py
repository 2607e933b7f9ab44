"""Batch-equivalent forms of the streaming operators + the multimodal
metadata query. ``F.window``/sessionization semantics are identical in
batch and streaming (same WindowExec/session logic); the streaming tests
(tests/test_streaming.py) assert the actual readStream pipelines equal
these plans, and these plans carry the DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_binary_payload,
    extract_audio_features,
    extract_image_metadata,
    frame_sample_hashes,
    resize_images,
)
from ..sources.tables import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "streaming_tumbling_batch",
    oracle="""
        SELECT STRFTIME(TIME_BUCKET(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S')
                   AS window_start,
               event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS distinct_users
        FROM events
        GROUP BY 1, 2
    """,
    headline=True,
)
def streaming_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6h event-time windows, exact distinct users — the batch
    twin of streaming.stream_tumbling_counts (epoch-aligned windows in
    both engines; UTC session TZ keeps strings identical)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("distinct_users"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "distinct_users",
        )
    )


@register(
    "streaming_sliding_batch",
    oracle="""
        WITH placed AS (
            SELECT TIME_BUCKET(INTERVAL '3 hours', ts) AS b, event_id FROM events
            UNION ALL
            SELECT TIME_BUCKET(INTERVAL '3 hours', ts) - INTERVAL '3 hours', event_id
            FROM events
        )
        SELECT STRFTIME(b, '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS n_events
        FROM placed
        GROUP BY 1
    """,
)
def streaming_sliding_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 6h/3h windows: every event belongs to exactly 2 windows
    (the oracle materializes both placements explicitly)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
        )
    )


@register(
    "streaming_sessionize_batch",
    oracle="""
        WITH g AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL '30 minutes'
                             OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
        SELECT user_id,
               CAST(SUM(is_new) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM g
        GROUP BY user_id
    """,
)
def streaming_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min islands) per user — the batch
    twin of both session_window streaming and the
    applyInPandasWithState custom operator."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | (F.col("ts").cast("double") - prev.cast("double") > 30 * 60),
        1,
    ).otherwise(0)
    return (
        ev.select("user_id", "ts", "event_id")
        .withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(
            F.sum("is_new").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "streaming_dedup_batch",
    oracle="""
        SELECT user_id, event_type, event_id AS first_event_id
        FROM (
            SELECT user_id, event_type, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    """,
)
def streaming_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type) — the deterministic batch twin of
    dropDuplicatesWithinWatermark."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_type", "event_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


@register(
    "streaming_interval_join_batch",
    oracle="""
        SELECT l.user_id AS user_id,
               l.event_id AS l_event,
               r.event_id AS r_event
        FROM events l JOIN events r
          ON l.user_id = r.user_id
         AND r.ts > l.ts
         AND r.ts <= l.ts + INTERVAL 10 MINUTE
    """,
)
def streaming_interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (same-user event
    pairs within 10 minutes): equi-key on user_id keeps it a hash join
    with a range residual — never a time-only cross join."""
    ev = _t(spark, sf_dir, "events")
    l = ev.select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("l_event"),
        F.col("ts").alias("l_ts"),
    )
    r = ev.select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_event"),
        F.col("ts").alias("r_ts"),
    )
    return l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select(F.col("l_user").alias("user_id"), "l_event", "r_event")


@register(
    "multimodal_image_meta",
    oracle="""
        SELECT doc_id,
               CAST(OCTET_LENGTH(ENCODE(text)) AS INTEGER) AS byte_len,
               CAST(64 + OCTET_LENGTH(ENCODE(text)) % 576 AS INTEGER) AS width,
               CAST(64 + (OCTET_LENGTH(ENCODE(text)) // 7) % 448 AS INTEGER) AS height,
               CAST(3 AS INTEGER) AS channels,
               CAST(1 + OCTET_LENGTH(ENCODE(text)) % 8 AS INTEGER) AS n_frames
        FROM documents
    """,
)
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: binary payload column ->
    mapInPandas (Arrow batches of bytes) -> typed metadata. The decode
    is the documented deterministic STUB (fake_decode); the oracle
    mirrors it over OCTET_LENGTH — proving the Spark-side batch shape
    produces exactly the declared schema and values."""
    d = _t(spark, sf_dir, "documents")
    payloads = attach_binary_payload(d, "doc_id", "text")
    return extract_image_metadata(payloads)


@register(
    "multimodal_audio_features",
    oracle="""
        SELECT doc_id,
               CAST(OCTET_LENGTH(ENCODE(text)) AS INTEGER) AS byte_len,
               CAST(8000 * (1 << (OCTET_LENGTH(ENCODE(text)) % 3)) AS INTEGER)
                   AS sample_rate,
               CAST(1 + OCTET_LENGTH(ENCODE(text)) % 2 AS INTEGER) AS n_channels,
               CAST(OCTET_LENGTH(ENCODE(text)) * 32 AS BIGINT) AS n_samples,
               (OCTET_LENGTH(ENCODE(text)) * 32.0)
                   / (8000 * (1 << (OCTET_LENGTH(ENCODE(text)) % 3))) AS duration_s
        FROM documents
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio branch of the multimodal plumbing: binary payload ->
    mapInPandas -> typed audio features (sample rate, channels, samples,
    duration). Decode is the deterministic STUB (fake_decode_audio);
    the oracle mirrors it over OCTET_LENGTH."""
    d = _t(spark, sf_dir, "documents")
    payloads = attach_binary_payload(d, "doc_id", "text")
    return extract_audio_features(payloads)


@register(
    "multimodal_resize_meta",
    oracle="""
        WITH m AS (
            SELECT doc_id,
                   64 + OCTET_LENGTH(ENCODE(text)) % 576 AS w,
                   64 + (OCTET_LENGTH(ENCODE(text)) // 7) % 448 AS h
            FROM documents
        )
        SELECT doc_id,
               CAST(w AS INTEGER) AS src_width,
               CAST(h AS INTEGER) AS src_height,
               CAST(GREATEST(1, FLOOR(w * LEAST(224.0 / w, 224.0 / h)))
                    AS INTEGER) AS out_width,
               CAST(GREATEST(1, FLOOR(h * LEAST(224.0 / w, 224.0 / h)))
                    AS INTEGER) AS out_height,
               CAST(GREATEST(1, FLOOR(w * LEAST(224.0 / w, 224.0 / h)))
                    * GREATEST(1, FLOOR(h * LEAST(224.0 / w, 224.0 / h)))
                    * 3 AS INTEGER) AS out_bytes
        FROM m
    """,
)
def multimodal_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize branch of the multimodal plumbing: mapInPandas aspect-fit
    into 224x224 (deterministic stub resample; real path is PIL-gated).
    The oracle mirrors the aspect-fit dimension math over OCTET_LENGTH;
    payload byte accounting (out_bytes == out_w*out_h*3 == len(payload))
    is asserted in tests/test_multimodal_ivf.py."""
    d = _t(spark, sf_dir, "documents")
    payloads = attach_binary_payload(d, "doc_id", "text")
    return resize_images(payloads, target=224).drop("payload")


@register(
    "multimodal_frame_hashes",
    oracle="""
        WITH a AS (
            SELECT doc_id, text, LENGTH(text) AS n
            FROM documents
            WHERE LENGTH(text) = OCTET_LENGTH(ENCODE(text))
        ),
        f AS (SELECT UNNEST([0, 1, 2, 3]) AS frame_id)
        SELECT a.doc_id, f.frame_id,
               MD5(SUBSTRING(a.text,
                             f.frame_id * (a.n // 4) + 1,
                             GREATEST(a.n // 4, 1))) AS frame_hash
        FROM a CROSS JOIN f
    """,
)
def multimodal_frame_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling: 4 byte-range slices per payload, each
    fingerprinted JVM-side (no Python in the loop). Restricted to
    ASCII payloads because the DuckDB oracle can only slice/hash
    VARCHAR — on ASCII, byte slices == char slices. Production uses the
    xxhash64 variant with no such restriction."""
    d = _t(spark, sf_dir, "documents").filter(
        F.length("text") == F.octet_length("text")
    )
    payloads = attach_binary_payload(d, "doc_id", "text")
    return frame_sample_hashes(payloads, n_frames=4, hash_fn="md5")
