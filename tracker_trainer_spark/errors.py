"""Shared error classification."""

from __future__ import annotations


def is_absent_table_error(e: Exception) -> bool:
    """True when a parquet read failed only because no data files exist
    yet (fresh deployment / fully-quarantined dir): Spark raises
    UNABLE_TO_INFER_SCHEMA for an empty directory and PATH_NOT_FOUND for
    an absent one. Every caller treating "no timeline yet" as a clean
    no-op sniffs through this ONE helper, so a Spark error-class rename
    is a one-line fix instead of a hunt."""
    s = str(e)
    return "UNABLE_TO_INFER_SCHEMA" in s or "PATH_NOT_FOUND" in s
