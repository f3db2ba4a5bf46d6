"""The driver grades the first 50 exported queries per round; the export
order must be a pure function of the committed grading ledger — never
hand-picked (round-3 review finding). These tests pin the invariants that
make steering impossible: completeness, never-graded-first, and
changed-gate promotion."""

from __future__ import annotations

import json

from assemblagedb_spark import harness


def test_order_is_a_permutation_of_the_registry():
    order = harness.grading_order()
    assert sorted(order) == sorted(harness.SPARK_QUERIES)
    assert len(order) == len(set(order))


def test_registry_keeps_declaration_order_unmutated():
    # the runtime registry order must equal the literal key order of the
    # `SPARK_QUERIES = {...}` source block — i.e. no module-level wrapper
    # reordered the dict after declaration (the round-3 defect this
    # policy replaced). Parsed from the AST, not regex, so formatting
    # changes can't fool it.
    import ast
    import inspect

    src = inspect.getsource(harness)
    tree = ast.parse(src)
    declared = None
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id == "SPARK_QUERIES"
                for t in node.targets
            )
            and isinstance(node.value, ast.Dict)
        ):
            declared = [
                k.value
                for k in node.value.keys
                if isinstance(k, ast.Constant)
            ]
    assert declared, "SPARK_QUERIES dict-literal assignment not found"
    assert list(harness.SPARK_QUERIES) == declared
    assert set(harness.ORACLES) <= set(harness.SPARK_QUERIES)


def test_never_graded_queries_lead(tmp_path, monkeypatch):
    monkeypatch.setattr(harness, "_GATE_CHANGED_IN_ROUND", {})
    names = list(harness.SPARK_QUERIES)
    graded = names[: len(names) // 2]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: {"rows_match": True} for n in graded})
    )
    order = harness.grading_order(str(tmp_path))
    ungraded = [n for n in names if n not in set(graded)]
    assert order[: len(ungraded)] == ungraded  # declaration order, first
    assert order[len(ungraded):] == graded


def test_changed_gate_sorts_as_ungraded(tmp_path, monkeypatch):
    names = list(harness.SPARK_QUERIES)
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: {"rows_match": True} for n in names})
    )
    victim = names[-1]
    monkeypatch.setattr(harness, "_GATE_CHANGED_IN_ROUND", {victim: 2})
    order = harness.grading_order(str(tmp_path))
    assert order[0] == victim
    # ...and once re-graded in a later round, it goes back in the queue
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({victim: {"rows_match": True}})
    )
    order2 = harness.grading_order(str(tmp_path))
    assert order2[-1] == victim


def test_least_recently_graded_first(tmp_path, monkeypatch):
    monkeypatch.setattr(harness, "_GATE_CHANGED_IN_ROUND", {})
    names = list(harness.SPARK_QUERIES)
    half = len(names) // 2
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: {} for n in names[:half]})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({n: {} for n in names[half:]})
    )
    order = harness.grading_order(str(tmp_path))
    assert order[:half] == names[:half]
    assert order[half:] == names[half:]


def test_gate_fingerprints_are_current():
    """Every gate's live fingerprint must equal the committed ledger
    (GATE_FINGERPRINTS.json): a gate edit without running
    tools/update_gate_fingerprints.py fails HERE instead of silently
    demoting the changed gate out of the next driver window (round-4
    review finding — the manual change dict rested on discipline)."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "GATE_FINGERPRINTS.json")) as fh:
        stored = json.load(fh)
    assert set(stored) == set(harness.SPARK_QUERIES), (
        "ledger out of sync with registry — run "
        "tools/update_gate_fingerprints.py"
    )
    stale = [
        n for n in harness.SPARK_QUERIES
        if stored[n]["fp"] != harness.gate_fingerprint(n)
    ]
    assert not stale, (
        f"gate fingerprints drifted for {stale} — run "
        "tools/update_gate_fingerprints.py so the change heads the next "
        "driver window"
    )


def test_fingerprint_drift_promotes_gate(tmp_path, monkeypatch):
    """A ledger round newer than a gate's last grade sorts it as
    ungraded — the mechanical replacement for the manual change dict."""
    monkeypatch.setattr(harness, "_GATE_CHANGED_IN_ROUND", {})
    names = list(harness.SPARK_QUERIES)
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: {"rows_match": True} for n in names})
    )
    victim = names[-1]
    ledger = {n: {"fp": "x", "round": 0} for n in names}
    ledger[victim] = {"fp": "y", "round": 2}
    (tmp_path / "GATE_FINGERPRINTS.json").write_text(json.dumps(ledger))
    order = harness.grading_order(str(tmp_path))
    assert order[0] == victim
    # once re-graded at or after the change round, back in the age queue
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({victim: {"rows_match": True}})
    )
    assert harness.grading_order(str(tmp_path))[-1] == victim


def test_export_applies_grading_order():
    import __spark_entry__ as entry

    assert list(entry.queries()) == harness.grading_order()
    exported = list(entry.oracle_sql())
    expected = [n for n in harness.grading_order() if n in harness.ORACLES]
    assert exported == expected
