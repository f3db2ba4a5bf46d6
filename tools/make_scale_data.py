"""Generate a LARGER scale-factor directory by extending the testdata
distributions (VERDICT r6 #5: the sf0.01→0.1 alphas are overhead-dominated;
the decade-up curves need an sf1-class point).

NOT a copy of the driver's generator (unknown) and NOT a naive
replication of sf0.1 — replicating text 10x would plant 10-way exact
duplicate groups and blow up the LSH candidate density the dedup curves
measure. Instead each table is re-sampled from the SOURCE directory's
measured distributions, the same way the driver's own sf dirs relate to
each other (sf0.01 is not a prefix of sf0.1; texts are fresh draws from
the same 31-word vocabulary):

- documents: fresh word sequences from the source vocabulary, word count
  uniform over the source range, source-matched lang/source marginals;
- embeddings: per-label centroids ESTIMATED from the source corpus +
  isotropic residual at the source's measured std, unit-normalized
  (same weak-cluster geometry: centroid norm ~0.07 vs residual 0.125·√64);
- events: uniform arrival over the same 30-day window (µs timestamps —
  sources/tpch.py::load_events handles both physical encodings),
  uniform users at 10x the user count, exponential value (source:
  mean≈std≈50, min 0), uniform 5 event types, {"k": n} props;
- customer/orders/lineitem: TPC-H-ish keys at 10x the counts, lines per
  order uniform 1..7 with line numbers drawn WITH replacement (the
  source has ~24% duplicate (l_orderkey, l_linenumber) pairs — the
  documented gotcha — and with-replacement draws reproduce that rate);
  l_partkey/l_suppkey keep the SOURCE ranges so the copied dims stay
  referentially intact;
- region/nation/part/supplier: copied (dimension tables scale
  sub-linearly; nothing in the decade-up key set scans them).

Deterministic: numpy PCG64 seed 42. Writes parquet via pyarrow.

Usage:
    python tools/make_scale_data.py [src_sf_dir] [out_dir] [mult]
    # defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _read(src: str, name: str) -> pa.Table:
    return pq.read_table(f"{src}/{name}.parquet")


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{out}/{name}.parquet")
    print(f"  {name}: {table.num_rows:,} rows")


def gen_documents(src: str, out: str, mult: int, rng) -> None:
    t = _read(src, "documents")
    texts = [s for s in t.column("text").to_pylist() if s]
    vocab = sorted({w for s in texts for w in s.split(" ")})
    wc = np.array([len(s.split(" ")) for s in texts])
    langs, lcounts = np.unique(
        [x for x in t.column("lang").to_pylist() if x is not None],
        return_counts=True,
    )
    sources = sorted(
        {x for x in t.column("source").to_pylist() if x is not None}
    )
    n = t.num_rows * mult
    counts = rng.integers(wc.min(), wc.max() + 1, n)
    words = rng.integers(0, len(vocab), int(counts.sum()))
    offs = np.concatenate(([0], np.cumsum(counts)))
    va = np.array(vocab)
    docs = [
        " ".join(va[words[offs[i] : offs[i + 1]]]) for i in range(n)
    ]
    lang = rng.choice(langs, n, p=lcounts / lcounts.sum())
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(docs, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(
                [sources[i] for i in rng.integers(0, len(sources), n)],
                pa.string(),
            ),
            "n_chars": pa.array(
                np.array([len(d) for d in docs]), pa.int64()
            ),
        }
    )
    _write(out, "documents", table)


def gen_documents_open(out: str, n: int, rng, dup_frac: float = 0.10):
    """documents.parquet with an OPEN Zipfian vocabulary (r7 verdict #3).

    The driver's testdata documents draw every word from the SAME closed
    31-word vocabulary, so pairwise gram-overlap mass never thins as N
    grows — LSH candidates densify ~90x per 10x rows and every
    dedup-family decade-up alpha measures the corpus generator, not the
    operator. This generator is the open-vocabulary control: the type
    pool scales WITH the corpus (V = n types — 50k at the sf1-class
    size, per the verdict's ask) and word frequencies are Zipfian
    (s = 1.1), the standard natural-text shape, so random documents
    share only stop-word-like head types and candidate density thins
    with N. A constant ``dup_frac`` of documents are near-copies of an
    earlier document (~10% of words resampled) so the verify stage has
    real work at every size: true near-dup PAIR count grows linearly
    with N — the operator-shape regime a real pipeline runs in.

    Same schema and word-count distribution as the driver corpus
    (uniform 10..100 words), so per-document gram work is comparable and
    only the vocabulary shape differs between the two corpus families.
    """
    V = n
    ranks = np.arange(1, V + 1, dtype=np.float64)
    p = ranks ** -1.1
    p /= p.sum()
    counts = rng.integers(10, 101, n)
    # vocabulary: RANDOM lowercase strings (3..9 chars, source-like
    # lengths). Structured type names (zero-padded ids) would be wrong
    # here: numerically adjacent ids share almost all their byte 4-grams,
    # which re-creates the closed corpus's dense gram space through the
    # back door. Random strings make gram overlap track word overlap.
    # Rare same-string collisions between two type ids just merge those
    # types — harmless at these sizes.
    lens = rng.integers(3, 10, V)
    chars = rng.integers(97, 123, (V, 9), dtype=np.uint8)
    va = np.array(
        [chars[i, : lens[i]].tobytes().decode("ascii") for i in range(V)]
    )
    docs: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < dup_frac:
            src_words = docs[int(rng.integers(0, i))].split(" ")
            # dtype=object: a fixed-width U<n> array would silently CLIP
            # replacement words to the source doc's longest word length,
            # planting truncated out-of-pool types (round-8 review find)
            w = np.array(src_words, dtype=object)
            n_mut = max(1, int(0.10 * len(w)))
            idx = rng.choice(len(w), n_mut, replace=False)
            w[idx] = va[rng.choice(V, n_mut, p=p)]
            docs.append(" ".join(w))
        else:
            docs.append(
                " ".join(va[rng.choice(V, int(counts[i]), p=p)])
            )
    langs = np.where(rng.random(n) < 0.8, "en", "de")
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(docs, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(
                [f"open{i % 5}" for i in range(n)], pa.string()
            ),
            "n_chars": pa.array(
                np.array([len(d) for d in docs]), pa.int64()
            ),
        }
    )
    _write(out, "documents", table)
    return va


def gen_embeddings(src: str, out: str, mult: int, rng) -> None:
    t = _read(src, "embeddings")
    E = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.array(t.column("label").to_pylist())
    uniq = np.unique(labels)
    cents = np.stack([E[labels == l].mean(axis=0) for l in uniq])
    resid_std = float(
        np.mean([E[labels == l].std() for l in uniq])
    )
    n = t.num_rows * mult
    lab = rng.integers(0, len(uniq), n)
    X = cents[lab] + rng.normal(0.0, resid_std, (n, E.shape[1]))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                list(X.astype(np.float32)), pa.list_(pa.float32())
            ),
            "label": pa.array(uniq[lab].astype(np.int32), pa.int32()),
        }
    )
    _write(out, "embeddings", table)


def gen_events(src: str, out: str, mult: int, rng) -> None:
    t = _read(src, "events")
    n = t.num_rows * mult
    users = (
        int(np.max(t.column("user_id").to_pylist())) + 1
    ) * mult
    types = sorted(set(t.column("event_type").to_pylist()))
    lo = np.min(t.column("ts").to_pylist())
    hi = np.max(t.column("ts").to_pylist())
    span_us = int((hi - lo).total_seconds() * 1_000_000)
    ts = np.sort(rng.integers(0, span_us, n))
    base = np.datetime64(lo, "us")
    value = np.round(rng.exponential(50.0, n), 2)
    ks = rng.integers(0, 100, n)
    table = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(base + ts.astype("timedelta64[us]")),
            "user_id": pa.array(rng.integers(0, users, n), pa.int64()),
            "event_type": pa.array(
                [types[i] for i in rng.integers(0, len(types), n)],
                pa.string(),
            ),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in ks], pa.string()
            ),
        }
    )
    _write(out, "events", table)


def gen_tpch(src: str, out: str, mult: int, rng) -> None:
    cust_src = _read(src, "customer")
    n_cust = cust_src.num_rows * mult
    segs = sorted(set(cust_src.column("c_mktsegment").to_pylist()))
    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_name": pa.array(
                [f"Customer#{i:09d}" for i in range(n_cust)], pa.string()
            ),
            "c_nationkey": pa.array(
                rng.integers(0, 25, n_cust).astype(np.int32), pa.int32()
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-1000, 10000, n_cust), 2), pa.float64()
            ),
            "c_mktsegment": pa.array(
                [segs[i] for i in rng.integers(0, len(segs), n_cust)],
                pa.string(),
            ),
        }
    )
    _write(out, "customer", customer)

    ord_src = _read(src, "orders")
    n_ord = ord_src.num_rows * mult
    statuses = sorted(set(ord_src.column("o_orderstatus").to_pylist()))
    prios = sorted(set(ord_src.column("o_orderpriority").to_pylist()))
    d0 = np.datetime64("1995-01-01", "us")
    d1 = np.datetime64("2001-08-02", "us")
    span = int((d1 - d0).astype("timedelta64[us]").astype(np.int64))
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
            "o_custkey": pa.array(
                rng.integers(0, n_cust, n_ord), pa.int64()
            ),
            "o_orderstatus": pa.array(
                [statuses[i] for i in rng.integers(0, len(statuses), n_ord)],
                pa.string(),
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 500000, n_ord), 2), pa.float64()
            ),
            "o_orderdate": pa.array(
                d0
                + rng.integers(0, span, n_ord).astype("timedelta64[us]")
            ),
            "o_orderpriority": pa.array(
                [prios[i] for i in rng.integers(0, len(prios), n_ord)],
                pa.string(),
            ),
        }
    )
    _write(out, "orders", orders)

    li_src = _read(src, "lineitem")
    # lines per order uniform 1..7 (source mean 4.08); line numbers drawn
    # WITH replacement to reproduce the ~24% duplicate-pair gotcha
    lines_per = rng.integers(1, 8, n_ord)
    n_li = int(lines_per.sum())
    l_orderkey = np.repeat(np.arange(n_ord), lines_per)
    max_part = int(np.max(li_src.column("l_partkey").to_pylist())) + 1
    max_supp = int(np.max(li_src.column("l_suppkey").to_pylist())) + 1
    s0 = np.datetime64("1995-01-02", "us")
    s1 = np.datetime64("2001-11-05", "us")
    sspan = int((s1 - s0).astype("timedelta64[us]").astype(np.int64))
    flags = sorted(set(li_src.column("l_returnflag").to_pylist()))
    stats = sorted(set(li_src.column("l_linestatus").to_pylist()))
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(l_orderkey, pa.int64()),
            "l_partkey": pa.array(
                rng.integers(0, max_part, n_li), pa.int64()
            ),
            "l_suppkey": pa.array(
                rng.integers(0, max_supp, n_li), pa.int64()
            ),
            "l_linenumber": pa.array(
                rng.integers(1, 8, n_li).astype(np.int32), pa.int32()
            ),
            "l_quantity": pa.array(
                rng.integers(1, 51, n_li).astype(np.float64), pa.float64()
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 105000, n_li), 2), pa.float64()
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, n_li) / 100.0, 2), pa.float64()
            ),
            "l_tax": pa.array(
                np.round(rng.integers(0, 9, n_li) / 100.0, 2), pa.float64()
            ),
            "l_returnflag": pa.array(
                [flags[i] for i in rng.integers(0, len(flags), n_li)],
                pa.string(),
            ),
            "l_linestatus": pa.array(
                [stats[i] for i in rng.integers(0, len(stats), n_li)],
                pa.string(),
            ),
            "l_shipdate": pa.array(
                s0
                + rng.integers(0, sspan, n_li).astype("timedelta64[us]")
            ),
        }
    )
    _write(out, "lineitem", lineitem)


def main_open_vocab() -> None:
    """Write the three open-vocabulary documents-only dirs mirroring the
    closed family's doc counts (sf0.01=500, sf0.1=5,000, sf1-class=50,000).
    Only documents.parquet is written — every dedup/overlaps-family gate
    reads only that table. Usage:
        python tools/make_scale_data.py --open-vocab [out_root]
        # default out_root: /tmp  ->  /tmp/open_sf0.01 etc."""
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    rng = np.random.default_rng(42)
    for tag, n in (("open_sf0.01", 500), ("open_sf0.1", 5_000), ("open_sf1", 50_000)):
        out = os.path.join(out_root, tag)
        os.makedirs(out, exist_ok=True)
        print(f"generating {out} (n={n:,}, V={n:,} Zipf types)")
        gen_documents_open(out, n, rng)
    print("done")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    print(f"generating {out} = {src} x {mult}")
    gen_documents(src, out, mult, rng)
    gen_embeddings(src, out, mult, rng)
    gen_events(src, out, mult, rng)
    gen_tpch(src, out, mult, rng)
    for dim in ("region", "nation", "part", "supplier"):
        shutil.copyfile(f"{src}/{dim}.parquet", f"{out}/{dim}.parquet")
        print(f"  {dim}: copied")
    print("done")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--open-vocab":
        main_open_vocab()
    else:
        main()
