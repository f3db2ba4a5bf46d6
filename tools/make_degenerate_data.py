"""Generate DEGENERATE variants of a testdata scale-factor directory:
the same ten parquet tables with identical schemas but zero rows
(``empty``) or exactly one row each (``one``, the first row — which also
breaks referential integrity between tables, on purpose).

Why: at 100 TB a pipeline constantly meets empty tables, empty
partitions, and slices that violate cross-table invariants (a filter
that drained a table, a day with no events, a shard with one document).
Every declared gate must behave like its ANSI oracle on these inputs —
not crash in a seed collect, a numpy stack, or a driver-side min/max.
The round-5 sweep over these dirs found 14 real failures (13 empty-input
crashes/divergences + 1 oracle referential-integrity artifact), all
fixed and pinned by tests/test_degenerate_inputs.py.

Usage:
    python tools/make_degenerate_data.py [src_sf_dir] [out_root]
    # defaults: /root/testdata/sf0.001 -> /tmp/sfempty + /tmp/sfone
then sweep with the standard gate checker:
    python tools/check_oracles.py /tmp/sfempty
    python tools/check_oracles.py /tmp/sfone
"""

from __future__ import annotations

import os
import sys


def write_degenerate(src: str, out_root: str) -> tuple[str, str]:
    """Write <out_root>/sfempty and <out_root>/sfone from ``src``;
    returns the two directory paths."""
    import pyarrow.parquet as pq

    dirs = []
    for name, n in (("sfempty", 0), ("sfone", 1)):
        dst = os.path.join(out_root, name)
        os.makedirs(dst, exist_ok=True)
        for f in sorted(os.listdir(src)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(src, f))
            out = t.schema.empty_table() if n == 0 else t.slice(0, 1)
            pq.write_table(out, os.path.join(dst, f))
        dirs.append(dst)
    return dirs[0], dirs[1]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    empty, one = write_degenerate(src, out_root)
    print(f"wrote {empty} and {one} from {src}")


if __name__ == "__main__":
    main()
