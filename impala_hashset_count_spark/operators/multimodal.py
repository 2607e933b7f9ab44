"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Design for 100 TB of media:
- payloads live in a ``binary`` column (or object-store URIs resolved in
  the same batch function); metadata is typed columns so Catalyst can
  prune/push down WITHOUT touching bytes;
- all per-payload work happens in ``mapInPandas`` — one Python worker
  per partition, Arrow batches in/out, no per-row serialization;
- partition sizing is by BYTES not rows (``repartition`` after an
  estimated-size bucketing) so a few giant videos can't skew a task.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
PIL/soundfile exist, and the pipeline uses ``fake_decode`` — a
DETERMINISTIC function of the payload bytes with the same schema a real
decoder would produce. The Spark-side plumbing (schema, batching,
partitioning, UDF signatures) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the (fake or real) image decode step.
IMAGE_META_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, channels int, n_frames int"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Test-fixture payload: UTF-8 bytes of the text column standing in
    for real media bytes (the driver testdata has no binary column).
    Production replaces this with a parquet/binaryFile scan."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_image(payload: bytes):
    """Real decode — gated on PIL availability (not in this container)."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without PIL
        raise NotImplementedError(
            "image decode requires PIL; use fake_decode for plumbing tests"
        ) from exc
    return Image.open(io.BytesIO(payload))  # pragma: no cover


def decode_audio(payload: bytes):
    """Real audio decode — gated on soundfile availability (not in this
    container)."""
    try:
        import io

        import soundfile  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without soundfile
        raise NotImplementedError(
            "audio decode requires soundfile; use fake_decode_audio for plumbing tests"
        ) from exc
    return soundfile.read(io.BytesIO(payload))  # pragma: no cover


def fake_decode_audio(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an audio decoder: (sample_rate,
    n_channels, n_samples, duration_s) purely from the byte length, so
    the oracle mirrors it as SQL over OCTET_LENGTH. duration is a single
    IEEE division (no rounding) so Python and SQL produce the identical
    double."""
    n = len(payload)
    sample_rate = 8000 << (n % 3)  # 8k/16k/32k
    n_channels = 1 + n % 2
    n_samples = n * 32
    return (sample_rate, n_channels, n_samples, n_samples / sample_rate)


def fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a media decoder: (width, height,
    channels, n_frames) derived purely from the byte length, so the
    oracle can mirror it as SQL over OCTET_LENGTH."""
    n = len(payload)
    return (64 + n % 576, 64 + (n // 7) % 448, 3, 1 + n % 8)


def extract_image_metadata(df: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction over (doc_id, payload) —
    the canonical multimodal batch shape. Arrow delivers ``payload`` as
    Python ``bytes`` per row; work is vectorized per batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf["payload"].map(fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["payload"].map(len).astype("int32"),
                    "width": meta.map(lambda m: m[0]).astype("int32"),
                    "height": meta.map(lambda m: m[1]).astype("int32"),
                    "channels": meta.map(lambda m: m[2]).astype("int32"),
                    "n_frames": meta.map(lambda m: m[3]).astype("int32"),
                }
            )

    return df.mapInPandas(batches, schema=IMAGE_META_SCHEMA)


#: Output schema of the (fake or real) audio decode step.
AUDIO_META_SCHEMA = (
    "doc_id bigint, byte_len int, sample_rate int, n_channels int, "
    "n_samples bigint, duration_s double"
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas audio feature extraction over (doc_id, payload) —
    same Arrow batch shape as the image path, audio-typed output."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf["payload"].map(fake_decode_audio)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["payload"].map(len).astype("int32"),
                    "sample_rate": meta.map(lambda m: m[0]).astype("int32"),
                    "n_channels": meta.map(lambda m: m[1]).astype("int32"),
                    "n_samples": meta.map(lambda m: m[2]).astype("int64"),
                    "duration_s": meta.map(lambda m: m[3]).astype("float64"),
                }
            )

    return df.mapInPandas(batches, schema=AUDIO_META_SCHEMA)


#: Output schema of the resize step: typed metadata + resized payload.
RESIZE_SCHEMA = (
    "doc_id bigint, src_width int, src_height int, "
    "out_width int, out_height int, out_bytes int, payload binary"
)


def pil_available() -> bool:
    """Capability check for the real image decode/resize path."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def real_resize(payload: bytes, target: int = 224) -> tuple[int, int, int, int, bytes]:
    """REAL decode + aspect-fit resize via PIL (same output contract as
    ``fake_resize``: (src_w, src_h, out_w, out_h, rgb_bytes) with
    len(rgb_bytes) == out_w*out_h*3). Gated on PIL availability — this
    container has no codecs, so the registry query pins the stub tier
    and tests exercise this path only where PIL exists
    (tests/test_multimodal_ivf.py::test_real_image_resize_when_pil_available
    skips, not fakes, otherwise)."""
    img = decode_image(payload)
    w, h = img.size
    scale = min(target / w, target / h)
    ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
    out = img.convert("RGB").resize((ow, oh))
    return (w, h, ow, oh, out.tobytes())


def fake_resize(payload: bytes, target: int = 224) -> tuple[int, int, int, int, bytes]:
    """Deterministic stand-in for an image resize: aspect-fit the fake
    source dimensions into ``target`` x ``target`` and emit a payload of
    EXACTLY out_w*out_h*3 bytes (the source bytes tiled/truncated).
    All math is plain IEEE double + truncation, so the oracle mirrors
    the dimensions as SQL over OCTET_LENGTH."""
    w, h, _c, _f = fake_decode(payload)
    scale = min(target / w, target / h)
    ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
    need = ow * oh * 3
    src = payload or b"\x00"
    data = (src * (need // len(src) + 1))[:need]
    return (w, h, ow, oh, data)


def resize_images(df: DataFrame, target: int = 224, decode: str = "stub") -> DataFrame:
    """mapInPandas resize over (doc_id, payload): aspect-fit each image
    into ``target`` square, emitting typed dimension metadata plus the
    resized payload.

    ``decode='stub'`` (default) is the documented deterministic
    stand-in (``fake_resize``) — the oracle tier, and the only tier the
    registry query uses so DuckDB can mirror the math.
    ``decode='real'`` runs ``decode_image`` + PIL ``Image.resize``
    (``real_resize``) and raises ``NotImplementedError`` where PIL is
    absent. Either way the Spark-side batch shape, schema, and byte
    accounting are identical and real."""
    if decode not in ("stub", "real"):
        raise ValueError(f"decode must be 'stub' or 'real', got {decode!r}")
    if decode == "real" and not pil_available():
        raise NotImplementedError(
            "decode='real' requires PIL; use the default stub tier for "
            "plumbing/oracle runs"
        )
    resize_fn = real_resize if decode == "real" else fake_resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = pdf["payload"].map(lambda p: resize_fn(bytes(p), target))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_width": res.map(lambda r: r[0]).astype("int32"),
                    "src_height": res.map(lambda r: r[1]).astype("int32"),
                    "out_width": res.map(lambda r: r[2]).astype("int32"),
                    "out_height": res.map(lambda r: r[3]).astype("int32"),
                    "out_bytes": res.map(lambda r: len(r[4])).astype("int32"),
                    "payload": res.map(lambda r: r[4]),
                }
            )

    return df.mapInPandas(batches, schema=RESIZE_SCHEMA)


def frame_sample_hashes(
    df: DataFrame, n_frames: int = 4, hash_fn: str = "xxhash64"
) -> DataFrame:
    """'Video' frame sampling shape: split each payload into n_frames
    byte slices and fingerprint each — yields one (doc_id, frame_id,
    frame_hash) row per sampled frame. Pure column ops (no Python):
    the slicing happens JVM-side on the binary column.

    ``hash_fn='xxhash64'`` is the production fingerprint;
    ``hash_fn='md5'`` exists because DuckDB has no xxhash64 — the
    oracle-checkable variant."""
    def fp(sliced):
        return F.xxhash64(sliced) if hash_fn == "xxhash64" else F.md5(sliced)

    slices = [
        F.struct(
            F.lit(i).alias("frame_id"),
            fp(
                F.expr(
                    f"substring(payload, cast({i} * (length(payload) div {n_frames}) + 1 as int), cast(greatest(length(payload) div {n_frames}, 1) as int))"
                )
            ).alias("frame_hash"),
        )
        for i in range(n_frames)
    ]
    return df.select(
        "doc_id", F.explode(F.array(*slices)).alias("fr")
    ).select("doc_id", "fr.frame_id", "fr.frame_hash")


def size_balanced(df: DataFrame, payload_col: str, target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition so each task carries ~target_bytes of payload —
    byte-weighted balancing (row-count balancing starves on skewed media
    sizes). ONE pre-pass computes total bytes and row count together
    (a single narrow aggregate job), then a round-robin repartition
    spreads rows over ceil(total/target) tasks. Used by the
    multimodal_image_pipeline registry query ahead of the decode/resize
    mapInPandas stages."""
    stats = df.select(
        F.sum(F.length(payload_col)).alias("total_bytes"),
        F.count("*").alias("n_rows"),
    ).first()
    total = int(stats["total_bytes"] or 0)
    floor = df.sparkSession.sparkContext.defaultParallelism
    n_parts = max(1, min(total // target_bytes + 1, 10_000), min(floor, int(stats["n_rows"] or 1)))
    return df.repartition(n_parts)
