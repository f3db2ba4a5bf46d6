"""View linearization parity (assemblage_view/tests/sections.rs, tile.rs —
fixture F8)."""

from __future__ import annotations

from assemblagedb_spark.db import AssemblageDb
from assemblagedb_spark.model import CHAIN, PAGE, Child, Node
from assemblagedb_spark.views.linearize import sections, spans, subsections, tile


def test_single_text_section():
    # sections.rs: single text -> 1 section (id=None), 1 subsection
    db = AssemblageDb()
    t = db.add(Node.text_node("hello"))
    secs = sections(db, t, True)
    assert len(secs) == 1
    assert secs[0]["id"] is None
    assert not secs[0]["has_multiple_parents"]
    subs = secs[0]["subsections"]
    assert len(subs) == 1
    assert subs[0]["block"]["spans"] == [{"type": "text", "styles": [], "text": "hello"}]


def test_chain_merges_into_one_subsection():
    db = AssemblageDb()
    chain = db.add(Node.list(CHAIN, [Node.text_node("foo"), Node.text_node("bar")]))
    subs = subsections(db, chain, True)
    assert len(subs) == 1
    assert [s["text"] for s in subs[0]["block"]["spans"]] == ["foo", "bar"]


def test_page_yields_one_subsection_per_block():
    db = AssemblageDb()
    page = db.add(Node.list(PAGE, [Node.text_node("a"), Node.text_node("b")]))
    subs = subsections(db, page, True)
    assert len(subs) == 2
    assert [s["block"]["spans"][0]["text"] for s in subs] == ["a", "b"]


def test_shared_child_becomes_own_section():
    # sections.rs: a child with >1 parents -> id=Some, has_multiple_parents
    db = AssemblageDb()
    a = db.add(Node.text_node("a"))
    page1 = db.add(Node.list(PAGE, [Child.lazy(a), Node.text_node("b")]))
    db.add(Node.list(PAGE, [Child.lazy(a), Node.text_node("x")]))
    secs = sections(db, page1, True)
    assert len(secs) == 2
    assert secs[0]["id"] == a
    assert secs[0]["has_multiple_parents"]
    assert secs[1]["id"] is None


def test_styles_push_down_to_subsections():
    db = AssemblageDb()
    styled = db.add(Node.styled("block", {"quote"}, Node.list(PAGE, [Node.text_node("q")])))
    page = db.add(Node.list(PAGE, [Child.lazy(styled)]))
    subs = subsections(db, page, True)
    assert len(subs) == 1
    assert subs[0]["block"]["styles"] == ["quote"]


def test_span_link_for_nested_page():
    # a page inside a chain renders as a link span with lineage
    db = AssemblageDb()
    inner = db.add(Node.list(PAGE, [Node.text_node("inner")]))
    chain = db.add(Node.list(CHAIN, [Node.text_node("see: "), Child.lazy(inner)]))
    db.add(Node.list(PAGE, [Child.lazy(chain)]))
    sp = spans(db, chain, True)
    assert sp[0] == {"type": "text", "styles": [], "text": "see: "}
    assert sp[1]["type"] == "link"
    assert sp[1]["link"]["descendant"]["id"] == inner
    assert sp[1]["link"]["descendant"]["block"]["spans"][0]["text"] == "inner"


def test_tile_with_forks():
    # tile.rs tile_with_forks: page1=[A,B,C], page2=[A,B,X] -> the after
    # branch of B links to page2 (the sibling X lifted to its top-most
    # same-block ancestor), sections 0 and 2 have no branches
    db = AssemblageDb()
    a = db.add(Node.text_node("A"))
    b = db.add(Node.text_node("B"))
    c = db.add(Node.text_node("C"))
    page1 = db.add(Node.list(PAGE, [Child.lazy(a), Child.lazy(b), Child.lazy(c)]))
    x = db.add(Node.text_node("X"))
    page2 = db.add(Node.list(PAGE, [Child.lazy(a), Child.lazy(b), Child.lazy(x)]))

    t = tile(db, page1)
    assert t["id"] == page1
    assert t["preview"]["spans"][0]["text"] == "A"
    secs = t["sections"]
    assert len(secs) == 3
    sub_b = secs[1]["subsections"][0]
    assert sub_b["before"] == []
    after_ids = [br["link"]["descendant"]["id"] for br in sub_b["after"]]
    assert after_ids == [page2]
    assert db.parents(sub_b["id"]) == {(page1, 1), (page2, 1)}
    for i in (0, 2):
        sub = secs[i]["subsections"][0]
        assert sub["after"] == [] and sub["before"] == []


def test_tile_no_branch_when_sibling_in_view():
    db = AssemblageDb()
    a = db.add(Node.text_node("A"))
    b = db.add(Node.text_node("B"))
    page1 = db.add(Node.list(PAGE, [Child.lazy(a), Child.lazy(b)]))
    t = tile(db, page1)
    for sec in t["sections"]:
        for sub in sec["subsections"]:
            assert sub["before"] == [] and sub["after"] == []


def test_tile_parent_link_branches():
    # a node linked from a chain gets a parent link-branch
    db = AssemblageDb()
    target = db.add(Node.list(PAGE, [Node.text_node("target content")]))
    db.add(Node.list(PAGE, [Node.list(CHAIN, [Child.lazy(target)])]))
    t = tile(db, target)
    assert len(t["branches"]) == 1
    assert t["branches"][0]["link"]["descendant"]["id"] == target
