"""Hadoop FileSystem manifest/metadata IO — the object-store route.

The shard-export manifest (`sources/ingest.py`) and the footer file
index (`operators/fileindex.py`) need three small driver-side IO
primitives: list a directory, read a handful of KB (a JSON manifest,
a parquet FOOTER), write a small file. Their original implementations
used ``os``/``open`` — correct on local paths, a hard wall on
``s3a://``/``hdfs://``/``abfs://`` paths, which is where a 100 TB
corpus actually lives.

This module routes those primitives through the SESSION'S OWN
HADOOP FILESYSTEM (``spark._jvm.org.apache.hadoop.fs.FileSystem``):
whatever scheme the cluster's Hadoop configuration can resolve —
local, HDFS, any object-store connector on the classpath — works
identically, with zero new Python dependencies. The JVM is already
there; py4j moves the (small, bounded) byte payloads in single bulk
transfers (``IOUtils.toByteArray`` returns ``bytes`` directly).

Driver-side ONLY, metadata-sized ONLY: these helpers exist for
manifests and footers (KB each, counts bounded by shard/file counts
that themselves pass through the driver as a read plan). Bulk DATA
movement stays where it belongs — Spark's own readers/writers for
the distributed path, and ``pyarrow.fs.FileSystem.from_uri`` inside
executor tasks (see ``operators/fileindex._arrow_open``) where a
Python task must open a file itself.

No reference counterpart: the reference engine (Impala UDA,
hashset-count.cc) delegates all storage IO to its host; this module
is host-engine plumbing on the Spark side of that same boundary.
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass

from pyspark.sql import SparkSession


def is_uri(path: str) -> bool:
    """True when ``path`` carries an explicit filesystem scheme
    (``file://``, ``s3a://``, ``hdfs://`` ...) and should take the
    Hadoop route; scheme-less paths keep the local-``os`` fast path."""
    return "://" in path


def _fs_path(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop
    configuration — the connector registry the whole cluster shares."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return jpath.getFileSystem(conf), jpath


@dataclass(frozen=True)
class FsEntry:
    """One listed file: full URI path + the (size, mtime_ns) version
    identity ``update_file_index`` keys rewrite detection on."""

    path: str
    size: int
    mtime_ns: int


def list_files(
    spark: SparkSession,
    path: str,
    suffix: str | None = None,
    recursive: bool = True,
) -> list[FsEntry]:
    """Files under ``path`` (sorted by path) with size and mtime —
    the Hadoop twin of ``os.walk``+``os.stat``. ``suffix`` filters by
    file-name ending (e.g. ``".parquet"``). Hadoop reports mtime in
    ms; callers get ns for parity with ``st_mtime_ns``."""
    fs, jpath = _fs_path(spark, path)
    out = []
    it = fs.listFiles(jpath, recursive)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if suffix is not None and not p.endswith(suffix):
            continue
        out.append(
            FsEntry(
                path=p,
                size=st.getLen(),
                mtime_ns=st.getModificationTime() * 1_000_000,
            )
        )
    out.sort(key=lambda e: e.path)
    return out


def exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = _fs_path(spark, path)
    return bool(fs.exists(jpath))


def read_bytes(spark: SparkSession, path: str) -> bytes:
    """Whole-file read through the Hadoop stream — ONE py4j bulk
    transfer (``IOUtils.toByteArray`` -> ``bytes``). For manifests and
    other metadata-sized files; data files go through Spark."""
    fs, jpath = _fs_path(spark, path)
    stream = fs.open(jpath)
    try:
        return bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()


def write_bytes(
    spark: SparkSession, path: str, data: bytes, overwrite: bool = True
) -> None:
    """Small-file write through ``FileSystem.create`` (py4j converts
    ``bytes`` to ``byte[]`` in one transfer). Atomicity is the
    underlying store's own (HDFS rename-on-close semantics differ
    from S3 PUT); manifest writers that need atomic replace should
    write-then-rename on stores that support it."""
    fs, jpath = _fs_path(spark, path)
    out = fs.create(jpath, overwrite)
    try:
        out.write(data)
    finally:
        out.close()


def read_parquet_metadata(spark: SparkSession, path: str):
    """Parquet FOOTER metadata over any Hadoop scheme WITHOUT reading
    the data pages: two positioned reads (8-byte trailer -> footer
    length, then the footer itself), then pyarrow parses the footer
    from memory. All seek offsets in a parquet footer are
    END-relative, so a ``PAR1 || footer || len || PAR1`` byte string
    is a valid standalone file for ``pq.read_metadata``.

    Returns ``pyarrow.parquet.FileMetaData`` — same object
    ``pq.ParquetFile(local_path).metadata`` yields, so footer-stats
    consumers are route-agnostic."""
    import pyarrow.parquet as pq

    fs, jpath = _fs_path(spark, path)
    size = fs.getFileStatus(jpath).getLen()
    if size < 12:
        raise ValueError(f"{path}: too small to be a parquet file ({size} B)")
    iou = spark._jvm.org.apache.commons.io.IOUtils
    stream = fs.open(jpath)
    try:
        stream.seek(size - 8)
        trailer = bytes(iou.toByteArray(stream, 8))
        if trailer[4:] != b"PAR1":
            raise ValueError(f"{path}: missing parquet magic trailer")
        flen = struct.unpack("<I", trailer[:4])[0]
        if flen + 8 > size:
            raise ValueError(f"{path}: footer length {flen} exceeds file size")
        stream.seek(size - 8 - flen)
        footer = bytes(iou.toByteArray(stream, flen + 8))
    finally:
        stream.close()
    return pq.read_metadata(io.BytesIO(b"PAR1" + footer))
