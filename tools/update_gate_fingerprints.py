"""Refresh the committed gate-fingerprint ledger (GATE_FINGERPRINTS.json).

Each declared query gate has a checkable semantic fingerprint
(`harness.gate_fingerprint`: sha256 of the rendered DuckDB oracle SQL +
the Spark query function source). This tool diffs every gate's current
fingerprint against the stored ledger:

- bootstrap (no ledger file): every gate is recorded at round 0 — the
  present state is taken as the already-graded state, so nothing is
  spuriously promoted into the next driver window;
- drifted or new gate: recorded at `max CORRECTNESS round + 1` (the round
  currently being built), which `harness.grading_order` treats as
  ungraded — the gate heads the next driver window;
- deleted gate: entry pruned.

tests/test_grading_order.py fails whenever a gate's live fingerprint
differs from the ledger, so forgetting to run this tool breaks the test
suite instead of silently demoting a changed gate out of the window
(round-4 review finding on the manual `_GATE_CHANGED_IN_ROUND` dict,
which is now frozen history + emergency override only).

Usage: python tools/update_gate_fingerprints.py [--rekey]

``--rekey``: recompute every fingerprint under the CURRENT hash scheme
while PRESERVING each gate's stored round — the migration mode for a
change to the fingerprint inputs themselves (e.g. round 6 widened the
hash to include private-helper sources). A hash-scheme change is not a
semantic change, so it must not flood the next driver window; the
rekey is only honest immediately after a full oracle re-verification.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from assemblagedb_spark import harness  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(ROOT, "GATE_FINGERPRINTS.json")


def current_build_round() -> int:
    """The round being built = latest graded round + 1."""
    latest = 0
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            latest = max(latest, int(m.group(1)))
    return latest + 1


def main() -> int:
    rekey = "--rekey" in sys.argv[1:]
    bootstrap = not os.path.exists(LEDGER)
    stored: dict[str, dict] = {}
    if not bootstrap:
        with open(LEDGER) as fh:
            stored = json.load(fh)
    rnd = 0 if bootstrap else current_build_round()

    out: dict[str, dict] = {}
    changed, added, pruned = [], [], sorted(set(stored) - set(harness.SPARK_QUERIES))
    for name in harness.SPARK_QUERIES:
        fp = harness.gate_fingerprint(name)
        prev = stored.get(name)
        if prev is None:
            out[name] = {"fp": fp, "round": rnd}
            added.append(name)
        elif prev["fp"] != fp:
            if rekey:
                # hash-scheme migration: new key, SAME graded round —
                # the gate's semantics did not change
                out[name] = {"fp": fp, "round": prev["round"]}
            else:
                out[name] = {"fp": fp, "round": rnd}
            changed.append(name)
        else:
            out[name] = prev

    with open(LEDGER, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(
        f"{'bootstrapped' if bootstrap else 'updated'} {LEDGER}: "
        f"{len(out)} gates, round={rnd}"
    )
    for label, names in (("added", added), ("changed", changed), ("pruned", pruned)):
        if names:
            print(f"  {label} ({len(names)}): {', '.join(names)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
