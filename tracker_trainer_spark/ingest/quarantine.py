"""S5: invalid-KSUID file quarantine.

Reference semantics (reference: src/ingest/partition.py:357-372): when a
timeline parquet file contains any row whose ``decision_id`` is not a
valid KSUID, the WHOLE file is relocated to ``unrecoverable/`` —
preserving its key — and the scan proceeds without it. A read-side skip
(``ignoreCorruptFiles``) hides *physically* corrupt files but leaves
logically-invalid rows in the table with no audit trail; quarantine is
the audit trail.

Spark-first shape:
- detection is ONE column-pruned scan of ``decision_id`` +
  ``input_file_name()`` with the validity predicate evaluated JVM-side;
  only the distinct invalid file names are collected (bounded by the
  number of bad files, not rows);
- the move preserves the file's timeline-relative path under
  ``<timeline>/_unrecoverable/`` — the underscore prefix makes Spark's
  file listing skip the quarantined files, so every later scan of the
  timeline is clean WITHOUT a filter, while the bytes stay adjacent for
  audit/repair;
- renames go through the Hadoop FileSystem API, so the same code moves
  ``file://`` paths locally and ``s3a://``/``hdfs://`` objects on a real
  cluster.
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..ksuid import is_valid_ksuid_col
from ..errors import is_absent_table_error

UNRECOVERABLE_DIR = "_unrecoverable"


def timeline_exists(spark: SparkSession, timeline_path: str) -> bool:
    """Cheap existence probe through the Hadoop FS API (any scheme) —
    lets maintenance entry points no-op on a fresh deployment WITHOUT
    side effects (acquiring the lock would mkdir the timeline)."""
    HPath = spark._jvm.org.apache.hadoop.fs.Path
    p = HPath(timeline_path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def find_invalid_files(spark: SparkSession, timeline_path: str,
                       now_ts: float | None = None) -> list[str]:
    """File URIs in the timeline containing ≥1 invalid decision_id.

    One narrow scan: decision_id + file name, predicate JVM-side,
    distinct-file collect bounded by the number of offending files.
    """
    try:
        df = spark.read.parquet(timeline_path)
    except Exception as e:  # fresh deployment / already-empty timeline
        if is_absent_table_error(e):
            return []
        raise
    df = (
        df.select("decision_id", F.input_file_name().alias("_file"))
        .where(~is_valid_ksuid_col("decision_id", now_ts))
        .select("_file")
        .distinct()
    )
    return sorted(r["_file"] for r in df.collect())


def quarantine_invalid_files(spark: SparkSession, timeline_path: str,
                             now_ts: float | None = None) -> list[str]:
    """Relocate every file holding an invalid decision_id to
    ``<timeline>/_unrecoverable/<relative-path>``; returns the moved
    URIs. Idempotent: a second pass finds a clean timeline and moves
    nothing.

    Holds the timeline writer lock for the scan+move window: groom's
    dynamic partition overwrite deletes files it compacted — renaming a
    file groom is concurrently replacing would fail the move AND let
    the invalid rows escape into the freshly-merged partition with no
    audit trail. All timeline mutators serialize on the same lock."""
    from .lock import timeline_lock

    if not timeline_exists(spark, timeline_path):
        return []  # fresh deployment: no lock dir, no FS mutation
    with timeline_lock(timeline_path):
        return _quarantine_locked(spark, timeline_path, now_ts)


def _quarantine_locked(spark: SparkSession, timeline_path: str,
                       now_ts: float | None = None) -> list[str]:
    bad = find_invalid_files(spark, timeline_path, now_ts)
    return _relocate_files(spark, timeline_path, bad)


def _relocate_files(spark: SparkSession, timeline_path: str,
                    bad: list[str]) -> list[str]:
    """Move the given file URIs under ``_unrecoverable/`` (detection
    already done — lets a caller that found the invalid files in a
    shared scan reuse the exact relocation semantics)."""
    if not bad:
        return []

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path

    root = HPath(timeline_path)
    fs = root.getFileSystem(hconf)
    root_uri = fs.makeQualified(root).toString().rstrip("/")
    dest_root = HPath(f"{root_uri}/{UNRECOVERABLE_DIR}")

    moved = []
    for uri in bad:
        src = fs.makeQualified(HPath(uri))
        rel = src.toString()
        if rel.startswith(root_uri + "/"):
            rel = rel[len(root_uri) + 1:]
        else:  # fall back to the bare file name (never expected)
            rel = urlparse(rel).path.rsplit("/", 1)[-1]
        dst = HPath(dest_root, rel)
        fs.mkdirs(dst.getParent())
        if not fs.rename(src, dst):
            raise IOError(f"failed to quarantine {src} -> {dst}")
        moved.append(uri)  # as scanned (Hadoop normalizes file:/// ↔ file:/)
    return moved
