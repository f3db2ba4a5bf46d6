"""Raw-corpus ingestion: JSONL/CSV with quarantine, text-dir ids."""

from __future__ import annotations

from assemblagedb_spark.sources.ingest import (
    read_csv_docs,
    read_jsonl,
    read_text_dir,
    split_corrupt,
)


def test_jsonl_quarantines_torn_lines(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en", "source": "s", "n_chars": 5}\n'
        '{"doc_id": 2, "text": "world"\n'  # torn mid-record
        '{"doc_id": 3, "text": "ok", "lang": "de", "source": "s", "n_chars": 2}\n'
    )
    clean, bad = split_corrupt(read_jsonl(spark, str(p)))
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 3}
    assert rows[1]["text"] == "hello" and rows[3]["lang"] == "de"
    quarantined = [r[0] for r in bad.collect()]
    assert len(quarantined) == 1 and quarantined[0].startswith('{"doc_id": 2')


def test_csv_quarantine_and_types(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,alpha,en,s1,5\n"
        "2,beta,de,s2,not_a_number\n"  # type error -> quarantined
        "3,gamma,fr,s3,5\n"
    )
    clean, bad = split_corrupt(read_csv_docs(spark, str(p)))
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 3]
    assert bad.count() == 1


def test_text_dir_ids_are_content_addressed(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("first line\nsecond line\n")
    (d / "b.txt").write_text("other file\n")
    docs = read_text_dir(spark, str(d))
    rows = docs.collect()
    assert len(rows) == 3
    assert {r["source"] for r in rows} == {"a.txt", "b.txt"}
    assert all(r["n_chars"] == len(r["text"]) for r in rows)
    # reproducible ids: second read gives identical id set
    again = read_text_dir(spark, str(d))
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in again.collect()}


def test_text_dir_duplicate_lines_get_unique_ids(spark, tmp_path):
    d = tmp_path / "dups"
    d.mkdir()
    (d / "a.txt").write_text("same\nsame\nother\nsame\n")
    docs = read_text_dir(spark, str(d))
    rows = docs.collect()
    assert len(rows) == 4
    # doc_id is unique per ROW: identical lines carry occurrence indexes,
    # so downstream per-doc joins never silently merge them
    assert len({r["doc_id"] for r in rows}) == 4
    # and the id SET is deterministic across re-reads
    again = read_text_dir(spark, str(d))
    assert ({r["doc_id"] for r in rows}
            == {r["doc_id"] for r in again.collect()})
