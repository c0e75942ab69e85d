"""Mechanical certification-eviction guard (VERDICT r6 item 1).

The driver's CORRECTNESS_r{N}.json row is the hard correctness signal
for a registry query, but it attests to the query AS IT EXISTED in
round N.  The repo's eviction rule — "changed since certification →
leave `_DRIVER_CERTIFIED` so the driver re-checks it" — was applied by
hand until round 6, when one rewrite (`revenue_rollup_nation_year`)
slipped through with a stale round-2 cert.  This module makes the rule
mechanical:

- `cert_fingerprint(name)` hashes the query's Spark implementation
  source (``inspect.getsource`` of the registry callable) together with
  its oracle SQL.
- `scripts/gen_cert_hashes.py` records fingerprints for every name in
  `_DRIVER_CERTIFIED` into ``tests/data/certified_hashes.json`` — run it
  ONLY when folding a fresh driver round's greens into the certified
  set.
- `tests/test_cert_hash_guard.py` fails whenever a certified query's
  fingerprint differs from the recorded one, i.e. whenever somebody
  edits a certified query's body (or its oracle) without evicting it.

Scope note (matches the r4 shared-code adjudication): the fingerprint
covers the query FUNCTION BODY and its oracle string, not transitively
imported helpers.  Helper changes that alter certified behavior are
covered by the hash-strict local oracle gate (tests/test_queries_oracle
.py) and by round-based staleness rotation; the guard targets the
failure mode that actually occurred — a direct rewrite of a certified
query's own body.
"""

from __future__ import annotations

import hashlib
import inspect
import textwrap


def cert_fingerprint(query_fn, oracle_sql: str | None) -> str:
    """sha256 over the dedented function source + oracle SQL (empty for
    rows-only queries)."""
    src = textwrap.dedent(inspect.getsource(query_fn))
    blob = src + "\n--oracle--\n" + (oracle_sql or "")
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()


def current_fingerprints() -> dict[str, str]:
    """Fingerprints of every currently driver-certified registry query."""
    from tracker_trainer_spark import queries as q

    return {
        name: cert_fingerprint(q.QUERIES[name], q.ORACLES.get(name))
        for name in sorted(q._DRIVER_CERTIFIED)  # noqa: SLF001
        if name in q.QUERIES
    }
