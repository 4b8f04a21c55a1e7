"""Driver-window evasion tripwire (VERDICT r9 #9).

The driver's correctness gate re-verifies only the FIRST
``DRIVER_WINDOW`` catalog entries each round; entries beyond it are
covered by ``PREVIOUSLY_DRIVER_VERIFIED`` — a hand-maintained claim
that their implementation has not changed since their last driver-green
row. This script turns that discipline into an assert: it hashes every
catalog query's function source (and its oracle SQL) against the
committed manifest ``scripts/query_hashes.json`` (a snapshot taken when
the previous round's window was cut) and FAILS if any changed-or-new
query sits beyond the window.

Usage::

    python scripts/check_window.py            # assert (CI mode)
    python scripts/check_window.py --update   # re-snapshot the manifest

``--update`` is part of cutting a round: run it AFTER arranging the
window so next round's check compares against this round's verified
state. Limitations, honestly stated: the hash covers the query
function's own source and its oracle string, not helpers it calls — a
behavior change hidden entirely inside a shared operator would pass
this tripwire (and be caught by ``scripts/ci.sh``'s FULL oracle sweep,
which remains the authoritative gate; this check exists so a changed
query can't silently ride a stale driver-green claim between sweeps).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "query_hashes.json")


def current_hashes() -> dict[str, str]:
    import dataflow_flex_pyarrow_to_gds_spark.queries as C

    out = {}
    for name, spec in C._specs().items():
        src = inspect.getsource(spec.fn) + "\n---oracle---\n" + (
            spec.oracle or ""
        )
        out[name] = hashlib.sha256(src.encode()).hexdigest()
    return out


def main() -> int:
    import dataflow_flex_pyarrow_to_gds_spark.queries as C

    cur = current_hashes()
    if "--update" in sys.argv:
        with open(MANIFEST, "w") as f:
            json.dump(cur, f, indent=1, sort_keys=True)
        print(f"wrote {len(cur)} hashes to {MANIFEST}")
        return 0
    if not os.path.exists(MANIFEST):
        print(
            "FAIL  no manifest — run scripts/check_window.py --update "
            "when cutting the round"
        )
        return 1
    with open(MANIFEST) as f:
        prev = json.load(f)
    window = set(list(C.queries())[: C.DRIVER_WINDOW])
    bad = [
        name
        for name, h in cur.items()
        if prev.get(name) != h and name not in window
    ]
    for name in bad:
        why = "NEW" if name not in prev else "CHANGED"
        print(
            f"FAIL  {name}: {why} since the last manifest but beyond the "
            f"driver window — move it into the first {C.DRIVER_WINDOW} "
            "catalog entries (its PREVIOUSLY_DRIVER_VERIFIED claim is "
            "stale)"
        )
    if bad:
        return 1
    changed_in_window = sum(
        1 for name, h in cur.items() if prev.get(name) != h
    )
    print(
        f"OK  {len(cur)} queries; {changed_in_window} changed/new, all "
        "inside the driver window"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
