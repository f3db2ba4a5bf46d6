"""Pins for the scale-measurement data generators (tools/make_scale_data).

The decade-up and open-vocabulary curves in SCALING.md are only as honest
as these generators: a replicated corpus would plant duplicate groups, a
closed vocabulary densifies LSH candidates quadratically, and a corpus
with NO near-duplicates would make the verify stage vacuously fast. These
tests pin the statistical properties each curve's interpretation relies
on, without Spark (pure numpy/pyarrow).
"""

from __future__ import annotations

import numpy as np

from tools.make_scale_data import gen_documents_open


def _gen(tmp_path, n, seed=7, dup_frac=0.10):
    import pyarrow.parquet as pq

    out = str(tmp_path / f"open_{n}")
    import os

    os.makedirs(out, exist_ok=True)
    gen_documents_open(out, n, np.random.default_rng(seed), dup_frac=dup_frac)
    return pq.read_table(f"{out}/documents.parquet")


def test_open_vocab_scales_with_corpus(tmp_path):
    # the type pool must scale with the corpus (the Heaps-law control the
    # closed 31-word testdata vocabulary lacks): realized distinct types
    # grow with n and sit near the pool size V = n
    small = _gen(tmp_path, 300)
    big = _gen(tmp_path, 3000)

    def n_types(t):
        return len({w for s in t.column("text").to_pylist() for w in s.split(" ")})

    ts, tb = n_types(small), n_types(big)
    assert ts > 31 and tb > 31  # genuinely open, not the testdata vocab
    assert tb > 4 * ts  # pool grows ~linearly with the corpus


def test_open_vocab_is_zipfian_headed(tmp_path):
    # word frequencies must be skewed (Zipf s=1.1), not uniform: the top
    # type should carry far more mass than the uniform share
    t = _gen(tmp_path, 1000)
    from collections import Counter

    c = Counter(w for s in t.column("text").to_pylist() for w in s.split(" "))
    total = sum(c.values())
    top = c.most_common(1)[0][1]
    assert top / total > 20 / len(c)  # >20x the uniform share


def test_open_vocab_plants_real_near_dups(tmp_path):
    # a constant fraction of documents are ~90%-identical mutations of an
    # earlier doc — the verify stage's real work; with dup_frac=0 there
    # must be none (the mutation path is the only near-dup source)
    # threshold 0.7: 90%-identity mutations land ~0.8-1.0 set-jaccard;
    # random Zipf-headed pairs top out below 0.7 at this n/V (measured:
    # 0 pairs at 0.7 with dup_frac=0, 41 with dup_frac=0.10)
    def max_jaccard_pairs(t, thresh=0.7):
        docs = [set(s.split(" ")) for s in t.column("text").to_pylist()]
        n = 0
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                inter = len(docs[i] & docs[j])
                if inter and inter / len(docs[i] | docs[j]) >= thresh:
                    n += 1
        return n

    with_dups = _gen(tmp_path, 250, dup_frac=0.10)
    without = _gen(tmp_path, 250, dup_frac=0.0)
    assert max_jaccard_pairs(with_dups) >= 10
    assert max_jaccard_pairs(without) == 0


def test_open_vocab_mutations_stay_in_pool(tmp_path):
    # round-8 review find: a fixed-width numpy array clipped replacement
    # words to the source doc's longest word, planting truncated
    # out-of-pool types in every mutated document. Every word in the
    # corpus must be a pool word, even under heavy mutation.
    import os

    import pyarrow.parquet as pq

    from tools.make_scale_data import gen_documents_open

    out = str(tmp_path / "pool")
    os.makedirs(out, exist_ok=True)
    pool = gen_documents_open(
        out, 300, np.random.default_rng(5), dup_frac=0.5
    )
    t = pq.read_table(f"{out}/documents.parquet")
    words = {w for s in t.column("text").to_pylist() for w in s.split(" ")}
    assert words <= set(pool)


def test_open_vocab_deterministic(tmp_path):
    a = _gen(tmp_path, 200, seed=11)
    b = _gen(tmp_path, 200, seed=11)
    assert a.column("text").to_pylist() == b.column("text").to_pylist()
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()


def test_dedup_family_flags_on_open_corpus(tmp_path):
    # round-8 verdict #4: dedup/overlaps-family scaling flags come from the
    # open-vocabulary control corpus once measured (sidecar), so generator
    # density can't keep re-raising corpus-shape flags; non-family keys and
    # unmeasured family keys still flag closed; an open-DNF entry (null) is
    # adjudicated, not flagged
    import json

    from tools.scale_curve import _flag_alpha, _load_open_alphas, _open_sidecar_path

    out_md = str(tmp_path / "SCALING.md")
    with open(_open_sidecar_path(out_md), "w") as fh:
        json.dump({"open_alpha": {"dedup_lsh_verify": 0.51, "overlaps": None}}, fh)
    open_alphas = _load_open_alphas(out_md)
    assert _flag_alpha("dedup_lsh_verify", 1.40, open_alphas) == (0.51, "open")
    assert _flag_alpha("overlaps", 1.33, open_alphas) == (None, "open-DNF")
    # family key without a sidecar entry → closed fallback
    assert _flag_alpha("dedup_clusters", 0.30, open_alphas) == (0.30, "closed")
    # non-family key always flags closed even if a sidecar row existed
    assert _flag_alpha("ann_pq_adc", 1.50, open_alphas) == (1.50, "closed")
    # absent sidecar → everything closed
    assert _load_open_alphas(str(tmp_path / "nowhere" / "S.md")) == {}

    # the committed repo sidecar itself must cover the measured family
    import os

    repo_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    repo_alphas = _load_open_alphas(repo_md)
    assert "dedup_lsh_verify" in repo_alphas and "overlaps" in repo_alphas
