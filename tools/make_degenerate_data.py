"""Generate DEGENERATE variants of a testdata scale-factor directory:

- ``sfempty``: the same ten parquet tables, identical schemas, zero rows;
- ``sfone``: exactly one row per table (the first — which also breaks
  referential integrity between tables, on purpose);
- ``sfnulls``: full sf0.001 rows with deterministic ~14-20% NULLs in the
  CONTENT columns (documents.text/lang, events.event_type/value/props);
  keys, timestamps and embeddings stay intact;
- ``sfvecnulls``: full rows with ~11% NULL embedding vectors (keys and
  every other table intact) — NULL vectors must be excluded from
  training, indexing, assignment and search, not crash a seed collect
  or a numpy stack;
- ``sfunicode``: documents.text injected with multilingual and
  SUPPLEMENTARY-PLANE characters (Greek/Cyrillic/CJK/emoji/musical
  symbols) at deterministic positions — text operators must be UTF-8
  BYTE-exact (the reference's gram unit), not codepoint-approximate,
  and nothing may overflow on astral codepoints.

Why: at 100 TB a pipeline constantly meets empty tables, empty
partitions, NULL content, and slices that violate cross-table
invariants (a filter that drained a table, a day with no events, a
scrape with missing bodies). Every declared gate must behave like its
ANSI oracle on these inputs — not crash in a seed collect, a numpy
stack, or a driver-side min/max, and not silently coalesce missing
content into empty content. The round-5 sweeps over these dirs found
14 (empty/one-row) + 19 (NULL-content) + 14 (NULL-embedding) + 22
(Unicode byte-exactness) real failures, all fixed and pinned by
tests/test_degenerate_inputs.py.

Usage:
    python tools/make_degenerate_data.py [src_sf_dir] [out_root]
    # defaults: /root/testdata/sf0.001 -> /tmp/sf{empty,one,nulls,vecnulls,unicode}
then sweep with the standard gate checker:
    python tools/check_oracles.py /tmp/sfempty
    python tools/check_oracles.py /tmp/sfone
    python tools/check_oracles.py /tmp/sfnulls
    python tools/check_oracles.py /tmp/sfvecnulls
    python tools/check_oracles.py /tmp/sfunicode
"""

from __future__ import annotations

import os
import sys

# deterministic NULL injection for the content columns (key/ts columns
# untouched; moduli chosen so the NULL sets of different columns overlap
# only partially)
_NULL_PLANS = {
    "documents": (
        "SELECT doc_id,"
        " CASE WHEN doc_id % 5 = 3 THEN NULL ELSE text END AS text,"
        " CASE WHEN doc_id % 7 = 2 THEN NULL ELSE lang END AS lang,"
        " source, n_chars FROM t"
    ),
    "events": (
        "SELECT event_id, ts, user_id,"
        " CASE WHEN event_id % 5 = 3 THEN NULL ELSE event_type END AS event_type,"
        " CASE WHEN event_id % 7 = 2 THEN NULL ELSE value END AS value,"
        " CASE WHEN event_id % 11 = 5 THEN NULL ELSE props END AS props FROM t"
    ),
}

_VECNULL_PLANS = {
    "embeddings": (
        "SELECT vec_id,"
        " CASE WHEN vec_id % 9 = 4 THEN NULL ELSE embedding END AS embedding,"
        " label FROM t"
    ),
}

_UNICODE_PLANS = {
    "documents": (
        "SELECT doc_id, CASE"
        " WHEN doc_id % 4 = 1 THEN 'Ünïçødé πρόλογος 漢字テスト ' || text"
        " WHEN doc_id % 4 = 3 THEN text || ' эпилог 🎉𝄞😀'"
        " WHEN doc_id % 8 = 6 THEN"
        "   substr(text, 1, 40) || ' 🤖中文 ' || substr(text, 41)"
        " ELSE text END AS text, lang, source, n_chars FROM t"
    ),
}


def write_degenerate(src: str, out_root: str) -> tuple[str, ...]:
    """Write <out_root>/sf{empty,one,nulls,vecnulls,unicode} from ``src``;
    returns the five directory paths."""
    import duckdb
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

    con = duckdb.connect()
    for name, plans in (
        ("sfnulls", _NULL_PLANS),
        ("sfvecnulls", _VECNULL_PLANS),
        ("sfunicode", _UNICODE_PLANS),
    ):
        dst = os.path.join(out_root, name)
        os.makedirs(dst, exist_ok=True)
        for f in sorted(os.listdir(src)):
            if not f.endswith(".parquet"):
                continue
            sel = plans.get(f[:-8], "SELECT * FROM t")
            con.execute(
                "CREATE OR REPLACE VIEW t AS SELECT * FROM "
                f"read_parquet('{os.path.join(src, f)}')"
            )
            con.execute(
                f"COPY ({sel}) TO '{os.path.join(dst, f)}' (FORMAT PARQUET)"
            )
        dirs.append(dst)
    con.close()
    return tuple(dirs)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    out = write_degenerate(src, out_root)
    print(f"wrote {', '.join(out)} from {src}")


if __name__ == "__main__":
    main()
