"""Top-level user API: refresh / sync / broadcast.

Reference: ``assemblage_view/src/bindings.rs:214-405`` — the entry points a
frontend calls:

- ``refresh(id)``: render a tile; ``broadcast:<id>`` prefixed ids subscribe
  and fetch the broadcast first, then tile its namespaced root.
- ``sync(id, sections)``: persist edited sections — Existing sections are
  reused by id, Linked sections become chain-links, Edited sections parse
  their markup lines into node trees; the whole page is swapped (or added
  if id is None), affected broadcasts re-published, and the new tile
  returned.
- ``broadcast(id)``: publish a node as a broadcast and return its tile.
"""

from __future__ import annotations

from assemblagedb_spark.db import ROOT_ID, AssemblageDb
from assemblagedb_spark.model import CHAIN, PAGE, Child, Node
from assemblagedb_spark.sources.episodes import BroadcastHub, namespaced_id
from assemblagedb_spark.views.linearize import tile
from assemblagedb_spark.views.markup import markup_to_node

BROADCAST_PREFIX = "broadcast:"


def existing(id: str) -> dict:
    return {"type": "existing", "id": id}


def linked(id: str) -> dict:
    return {"type": "linked", "id": id}


def edited(*markup_lines: str) -> dict:
    return {"type": "edited", "blocks": list(markup_lines)}


def refresh(db: AssemblageDb, id: str, hub: BroadcastHub | None = None) -> dict:
    """Tile lookup; broadcast-prefixed ids subscribe+fetch first
    (bindings.rs:214-237)."""
    if id.startswith(BROADCAST_PREFIX):
        if hub is None:
            raise ValueError("refresh of a broadcast id needs a BroadcastHub")
        broadcast_id = id[len(BROADCAST_PREFIX) :]
        subs = getattr(db, "_subscriptions", {})
        if broadcast_id not in subs:
            hub.subscribe(db, broadcast_id)
        else:
            hub.fetch(db, broadcast_id)
        ns = db._subscriptions[broadcast_id]["namespace"]
        return tile(db, namespaced_id(ROOT_ID, ns))
    return tile(db, id)


def sync(
    db: AssemblageDb,
    id: str | None,
    sections: list[dict],
    hub: BroadcastHub | None = None,
) -> dict:
    """Persist edited sections and return the re-rendered tile
    (bindings.rs:313-359)."""
    children: list[Child] = []
    for section in sections:
        kind = section["type"]
        if kind == "existing":
            children.append(Child.lazy(section["id"]))
        elif kind == "linked":
            children.append(Child.eager(Node.list(CHAIN, [Child.lazy(section["id"])])))
        elif kind == "edited":
            blocks = [markup_to_node(markup) for markup in section["blocks"]]
            children.append(Child.eager(Node.list(PAGE, blocks)))
        else:
            raise ValueError(f"unknown synced section type {kind!r}")
    replacement = Node.list(PAGE, children)
    if id is None:
        id = db.add(replacement)
    else:
        db.swap(id, replacement)
    result = tile(db, id)
    if hub is not None:
        hub.update_broadcasts(db, db.descendants(id) | {id})
    return result


def broadcast(db: AssemblageDb, id: str, hub: BroadcastHub, broadcast_id: str) -> dict:
    """Publish + tile (bindings.rs:392-405)."""
    hub.publish(db, broadcast_id, id)
    return tile(db, id)
