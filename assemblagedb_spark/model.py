"""The document/graph node model.

Reference: ``assemblage_db/src/data.rs`` — ``Node`` is the fundamental sum
type: Text(Line) | List(Layout, children) | Styled(Styles, child); children
are Lazy (id) or Eager (inline node); a Line never contains a newline
(multi-line text auto-splits into a Page of lines, data.rs:214-225).

Nodes are plain driver-side values; they normalize into the ``nodes`` /
``edges`` tables (schema.py) on insert, exactly as the reference flattens
eager children on ``add`` (core.rs:313-362).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Union

CHAIN = "chain"
PAGE = "page"

SPAN_STYLES = {"bold", "italic", "struck", "code"}  # data.rs:423-432
BLOCK_STYLES = {"heading", "list", "quote", "aside"}  # data.rs:436-447


@dataclass
class Node:
    kind: str  # 'text' | 'list' | 'styled'
    text: str | None = None
    layout: str | None = None  # chain | page (kind='list')
    style_kind: str | None = None  # block | span (kind='styled')
    styles: frozenset[str] = field(default_factory=frozenset)
    children: list["Child"] = field(default_factory=list)

    # -- constructors (data.rs:188-225) ------------------------------------
    @staticmethod
    def line(text: str) -> "Node":
        if "\n" in text:
            raise ValueError("a Line must not contain newlines")
        return Node(kind="text", text=text)

    @staticmethod
    def text_node(text: str) -> "Node":
        """Node::text — a multi-line string splits into a Page of lines
        (data.rs:214-225)."""
        lines = text.split("\n")
        if len(lines) == 1:
            return Node.line(text)
        return Node.list(PAGE, [Node.line(ln) for ln in lines])

    @staticmethod
    def list(layout: str, children: list[Union["Node", str, "Child"]]) -> "Node":
        assert layout in (CHAIN, PAGE)
        return Node(kind="list", layout=layout, children=[Child.of(c) for c in children])

    @staticmethod
    def styled(style_kind: str, styles: set[str], child: Union["Node", str, "Child"]) -> "Node":
        assert style_kind in ("block", "span")
        allowed = BLOCK_STYLES if style_kind == "block" else SPAN_STYLES
        assert set(styles) <= allowed, f"invalid styles {styles}"
        return Node(
            kind="styled",
            style_kind=style_kind,
            styles=frozenset(styles),
            children=[Child.of(child)],
        )

    def is_text(self) -> bool:
        return self.kind == "text"

    def is_list(self, layout: str | None = None) -> bool:
        return self.kind == "list" and (layout is None or self.layout == layout)

    def is_styled(self, style_kind: str | None = None) -> bool:
        return self.kind == "styled" and (style_kind is None or self.style_kind == style_kind)


@dataclass
class Child:
    """Lazy(id) reference or Eager(node) inline value (data.rs:451-458)."""

    id: str | None = None
    node: Node | None = None

    @staticmethod
    def lazy(id: str) -> "Child":
        return Child(id=id)

    @staticmethod
    def eager(node: Node) -> "Child":
        return Child(node=node)

    @staticmethod
    def of(value: Union["Child", Node, str]) -> "Child":
        if isinstance(value, Child):
            return value
        if isinstance(value, Node):
            return Child.eager(value)
        if isinstance(value, str):
            return Child.lazy(value)
        raise TypeError(f"cannot make a Child from {value!r}")

    @property
    def is_lazy(self) -> bool:
        return self.id is not None
