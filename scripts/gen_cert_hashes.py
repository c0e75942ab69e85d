"""Record certification fingerprints for `_DRIVER_CERTIFIED` queries.

Run ONLY as part of folding a driver round's green CORRECTNESS rows
into `_DRIVER_CERTIFIED` (see tracker_trainer_spark/certify.py).  The
recorded file is the baseline `tests/test_cert_hash_guard.py` enforces:
editing a certified query's body afterwards fails the guard until the
query is evicted (or legitimately re-certified and re-recorded here).

Usage: python scripts/gen_cert_hashes.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tracker_trainer_spark.certify import current_fingerprints  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tests" / "data" / \
    "certified_hashes.json"


def main() -> None:
    fps = current_fingerprints()
    OUT.write_text(json.dumps(fps, indent=1, sort_keys=True) + "\n")
    print(f"recorded {len(fps)} fingerprints -> {OUT}")


if __name__ == "__main__":
    main()
