"""View linearization: the graph rendered as blocks/spans with branch links.

Reference: ``assemblage_view/src/lib.rs:310-616`` and ``model.rs``. The view
model is Space → Tile → Section → Subsection → Block → Span; a tile is the
full render of one node: its sections (split at shared children), sibling
branches per subsection (deduped against ids in view, lifted to the top-most
same-block ancestor), parent link-branches, and a preview.

Per SURVEY §3.3 the Spark design collects the link-bounded subtree (tiles
are small by construction — links bound them) and runs the deterministic
linearization driver-side; sibling/ancestor enrichment reuses the DB's
traversal operators.

Structures are plain dicts (JSON-shaped, like the reference's serde model):
  Span        {"type": "text"|"link", "styles": [...], "text"|"link": ...}
  Block       {"type": "text"|"cyclic", "styles": [...], "spans": [...]}
  Subsection  {"id", "block", "before": [Branch], "after": [Branch]}
  Section     {"id": str|None, "subsections", "has_multiple_parents"}
  Branch      {"link": Lineage, "timestamp": int}
  Lineage     {"descendant": PreviewLink, "ancestor": PreviewLink|None,
               "descent": [(id, idx), ...]}
  PreviewLink {"id", "block"}
  Tile        {"id", "preview", "broadcasts", "sections", "branches"}
"""

from __future__ import annotations

from assemblagedb_spark.db import AssemblageDb
from assemblagedb_spark.model import CHAIN, PAGE, Node


def _span_text(text: str, styles=()) -> dict:
    return {"type": "text", "styles": sorted(styles), "text": text}


def _span_link(lineage: dict, styles=()) -> dict:
    return {"type": "link", "styles": sorted(styles), "link": lineage}


def _block_text(spans: list[dict], styles=()) -> dict:
    return {"type": "text", "styles": sorted(styles), "spans": spans}


def _styled_span(span: dict, styles: set[str]) -> dict:
    out = dict(span)
    out["styles"] = sorted(set(span["styles"]) | styles)
    return out


def _styled_block(block: dict, block_styles: set[str], span_styles: set[str]) -> dict:
    if block["type"] == "cyclic":
        return block
    return {
        "type": "text",
        "styles": sorted(set(block["styles"]) | block_styles),
        "spans": [_styled_span(s, span_styles) for s in block["spans"]],
    }


def _styled_subsection(sub: dict, block_styles: set[str], span_styles: set[str]) -> dict:
    out = dict(sub)
    out["block"] = _styled_block(sub["block"], block_styles, span_styles)
    return out


def _shallow_lineage(id: str) -> list[dict]:
    return [
        _span_link(
            {
                "descendant": {"id": id, "block": _block_text([_span_text("...")])},
                "ancestor": None,
                "descent": [],
            }
        )
    ]


def spans(db: AssemblageDb, id: str, follow_links: bool) -> list[dict]:
    """Node → flat span list (lib.rs:310-334)."""
    node = db.get(id)
    if node is None:
        raise KeyError(id)
    if node.is_text():
        return [_span_text(node.text)]
    if node.is_list(CHAIN):
        out = []
        for c in node.children:
            out.extend(spans(db, c.id, follow_links))
        return out
    if node.is_list(PAGE) or node.is_styled("block"):
        return [_span_link(lineage(db, id))] if follow_links else _shallow_lineage(id)
    # span-styled
    child_spans = spans(db, node.children[0].id, follow_links)
    return [_styled_span(s, set(node.styles)) for s in child_spans]


def subsections(db: AssemblageDb, id: str, follow_links: bool) -> list[dict]:
    """Node → one subsection per block (lib.rs:336-379)."""
    node = db.get(id)
    if node is None:
        raise KeyError(id)
    if node.is_text():
        return [{"id": id, "block": _block_text(spans(db, id, follow_links)), "before": [], "after": []}]
    if node.is_list(CHAIN):
        child_spans = []
        for c in node.children:
            child_spans.extend(spans(db, c.id, follow_links))
        return [{"id": id, "block": _block_text(child_spans), "before": [], "after": []}]
    if node.is_list(PAGE):
        out = []
        for c in node.children:
            out.extend(subsections(db, c.id, follow_links))
        return out
    block_styles = set(node.styles) if node.style_kind == "block" else set()
    span_styles = set(node.styles) if node.style_kind == "span" else set()
    subs = subsections(db, node.children[0].id, follow_links)
    return [_styled_subsection(s, block_styles, span_styles) for s in subs]


def sections(db: AssemblageDb, id: str, split_spans: bool) -> list[dict]:
    """Group subsections into sections; a child with >1 parents becomes its
    own (uneditable) section (lib.rs:381-458)."""
    node = db.get(id)
    if node is None:
        raise KeyError(id)
    if node.is_text():
        return [
            {
                "id": None,
                "subsections": subsections(db, id, True),
                "has_multiple_parents": db.has_shared_descendants_until_links(id),
            }
        ]
    if not split_spans and node.is_list(CHAIN):
        shared = db.has_shared_descendants_until_links(id)
        return [
            {
                "id": id if shared else None,
                "subsections": subsections(db, id, True),
                "has_multiple_parents": shared,
            }
        ]
    if node.is_list():
        out = []
        for c in node.children:
            if len(db.parents(c.id)) > 1:
                out.append(
                    {
                        "id": c.id,
                        "subsections": subsections(db, c.id, True),
                        "has_multiple_parents": True,
                    }
                )
            else:
                out.extend(sections(db, c.id, False))
        return out
    # styled
    cid = node.children[0].id
    block_styles = set(node.styles) if node.style_kind == "block" else set()
    span_styles = set(node.styles) if node.style_kind == "span" else set()
    subs = [
        _styled_subsection(s, block_styles, span_styles) for s in subsections(db, cid, True)
    ]
    if len(db.parents(cid)) > 1:
        return [{"id": cid, "subsections": subs, "has_multiple_parents": True}]
    out = []
    for section in sections(db, cid, split_spans):
        out.append(
            {
                **section,
                "subsections": [
                    _styled_subsection(s, block_styles, span_styles)
                    for s in section["subsections"]
                ],
            }
        )
    return out


def preview_link(db: AssemblageDb, id: str) -> dict:
    """First non-empty block as a PreviewLink (lib.rs:591-599)."""
    p = db.preview(id)
    if p[0] == "block":
        block = subsections(db, p[1], False)[0]["block"]
    elif p[0] == "empty":
        block = _block_text([_span_text("")])
    else:
        block = {"type": "cyclic"}
    return {"id": id, "block": block}


def lineage(db: AssemblageDb, id: str) -> dict:
    """Descendant preview + ancestor preview + descent path (lib.rs:602-616)."""
    descendant = preview_link(db, id)
    descent = db.ancestor_path_until_link(id)
    ancestor = preview_link(db, descent[0][0]) if descent else None
    return {"descendant": descendant, "ancestor": ancestor, "descent": descent}


def _latest_ts(db: AssemblageDb, id: str) -> int:
    versions = db.versions(id)
    return versions[-1].ts if versions else 0


def _branch_sort_key(b: dict):
    return (b["timestamp"], b["link"]["descendant"]["id"])


def tile(db: AssemblageDb, id: str, broadcasts=()) -> dict:
    """Full page render (lib.rs:472-588): sections + sibling branches
    (lifted, deduped against ids in view) + parent link-branches + preview."""
    secs = sections(db, id, True)
    ids_in_view = db.descendants_until_links(id)

    for section in secs:
        for sub in section["subsections"]:
            for key, sibling_ids in (("before", db.before(sub["id"])), ("after", db.after(sub["id"]))):
                sibling_blocks = set()
                for sid in sibling_ids:
                    snode = db.get(sid)
                    visited = set()
                    # lift to the top-most ancestor still displayed as the
                    # same block (lib.rs:489-524)
                    while True:
                        parents = db.parents(sid)
                        if len(parents) != 1 or sid in visited or db.is_block(snode):
                            break
                        pid = next(iter(parents))[0]
                        pnode = db.get(pid)
                        if db.is_link(snode, pnode) or (db.is_block(snode) and db.is_block(pnode)):
                            break
                        visited.add(sid)
                        sid, snode = pid, pnode
                    if sid not in ids_in_view:
                        sibling_blocks.add(sid)
                branches = [
                    {"link": lineage(db, sid), "timestamp": _latest_ts(db, sid)}
                    for sid in sibling_blocks
                ]
                sub[key] = sorted(branches, key=_branch_sort_key)

    node = db.get(id)
    branches = []
    for pid, _idx in db.parents(id):
        pnode = db.get(pid)
        if db.is_link(node, pnode):
            descent = db.ancestor_path_until_link(pid)
            branches.append(
                {
                    "link": {
                        "descendant": preview_link(db, id),
                        "ancestor": preview_link(db, descent[0][0]) if descent else None,
                        "descent": descent,
                    },
                    "timestamp": _latest_ts(db, id),
                }
            )
    branches.sort(key=_branch_sort_key)

    return {
        "id": id,
        "preview": preview_link(db, id)["block"],
        "broadcasts": list(broadcasts),
        "sections": secs,
        "branches": branches,
    }
