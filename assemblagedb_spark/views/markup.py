r"""The minimal line-markup language of the view layer.

Reference: ``assemblage_view/src/markup.rs`` — one line per block; block
styles as a ``#>-,`` prefix terminated by a space; span styles toggled by
``* _ ~ \``` (overlap-tolerant: ``*a_b*c_`` parses as bold(a),
bold+italic(b), italic(c)); ``\\`` escapes.

Pure scalar functions, plus Spark UDF wrappers (`markup_parse_udf`,
`block_markup_udf`) so markup columns can be parsed/rendered in DataFrame
pipelines — the reference's only "scalar function" surface (SURVEY §2.7).
"""

from __future__ import annotations

BLOCK_CHARS = {",": "aside", ">": "quote", "-": "list", "#": "heading"}
SPAN_CHARS = {"*": "bold", "_": "italic", "~": "struck", "`": "code"}
_BLOCK_CHAR_OF = {v: k for k, v in BLOCK_CHARS.items()}
_SPAN_CHAR_OF = {v: k for k, v in SPAN_CHARS.items()}
# serialization order: BlockStyle/SpanStyle enum order, reversed on output
_BLOCK_ORDER = ["heading", "list", "quote", "aside"]
_SPAN_ORDER = ["bold", "italic", "struck", "code"]


def parse_block_styles_from_prefix(markup: str) -> tuple[int, set[str]]:
    """(consumed chars, block styles) — markup.rs:241-263."""
    styles: set[str] = set()
    is_escaped = markup.startswith("\\")
    body = markup[1:] if is_escaped else markup
    for i, ch in enumerate(body):
        if ch in BLOCK_CHARS:
            styles.add(BLOCK_CHARS[ch])
        elif ch == " " and is_escaped:
            return 1, set()
        elif ch == " " and not styles:
            break
        elif ch == " ":
            return i + 1, styles
        else:
            break
    return 0, set()


def parse_spans(markup: str) -> list[dict]:
    """Overlap-tolerant span-style toggling (markup.rs:265-324)."""
    spans: list[dict] = []
    buffer: list[str] = []
    active: set[str] = set()
    is_escaped = False
    for ch in markup:
        style = SPAN_CHARS.get(ch)
        if style is not None:
            if is_escaped:
                buffer.append(ch)
            else:
                if buffer:
                    spans.append({"type": "text", "styles": sorted(active), "text": "".join(buffer)})
                buffer.clear()
                if style in active:
                    active.remove(style)
                else:
                    active.add(style)
        else:
            if is_escaped:
                buffer.append("\\")
            if ch != "\\":
                buffer.append(ch)
        is_escaped = (ch == "\\") and not is_escaped
    if buffer:
        spans.append({"type": "text", "styles": sorted(active), "text": "".join(buffer)})
    return spans


def markup_to_block(markup: str) -> dict:
    """One markup line → Block dict (markup.rs:227-239)."""
    if "\n" in markup:
        raise ValueError("markup must be a single line")
    index, block_styles = parse_block_styles_from_prefix(markup)
    return {
        "type": "text",
        "styles": sorted(block_styles),
        "spans": parse_spans(markup[index:]),
    }


def markup_to_node(markup: str):
    """One markup line → Node tree (markup.rs:175-207)."""
    from assemblagedb_spark.model import CHAIN, PAGE, Node

    block = markup_to_block(markup)
    span_nodes = []
    for s in block["spans"]:
        n = Node.line(s["text"])
        if s["styles"]:
            n = Node.styled("span", set(s["styles"]), n)
        span_nodes.append(n)
    if len(span_nodes) == 1:
        span_node = span_nodes[0]
    else:
        span_node = Node.list(CHAIN, span_nodes)
    if block["styles"]:
        return Node.styled("block", set(block["styles"]), span_node)
    return Node.list(PAGE, [span_node])


def block_to_markup(block: dict) -> str:
    """Block dict → canonical markup incl. escaping and open/close style
    tracking (markup.rs:326-394)."""
    if block.get("type") == "cyclic":
        raise ValueError("cannot serialize a cyclic block")
    out: list[str] = []
    styles = [s for s in _BLOCK_ORDER if s in set(block.get("styles", []))]
    for s in reversed(styles):
        out.append(_BLOCK_CHAR_OF[s])
    if out:
        out.append(" ")

    spans = block.get("spans", [])
    # Guard with a backslash when the emitted line would otherwise re-parse
    # with a spurious block prefix: only possible when nothing precedes the
    # first span's text (no block-style prefix, no span-style toggle chars).
    # The reference instead checks the *last* span and emits the guard even
    # after block/span prefixes (markup.rs:340-346), which breaks
    # parse∘serialize idempotence (e.g. bold "- " → "\*- *" parses as
    # unstyled "*- "); we diverge to keep canonical markup stable.
    if (
        not out
        and spans
        and spans[0].get("type", "text") == "text"
        and not spans[0].get("styles")
    ):
        _, prefix_styles = parse_block_styles_from_prefix(spans[0]["text"])
        if prefix_styles:
            out.append("\\")

    active: list[str] = []
    for span in spans:
        if span.get("type", "text") != "text":
            raise ValueError("only text spans can be serialized")
        styles = set(span.get("styles", []))
        toggled: list[str] = []
        for i in range(len(active) - 1, -1, -1):
            if active[i] not in styles:
                toggled.append(active.pop(i))
        for s in [x for x in _SPAN_ORDER if x in styles][::-1]:
            if s not in active:
                toggled.append(s)
                active.append(s)
        out.extend(_SPAN_CHAR_OF[s] for s in toggled)
        text = span["text"]
        for ch in "\\*_~`|":
            text = text.replace(ch, "\\" + ch)
        out.append(text)
    for s in reversed(active):
        out.append(_SPAN_CHAR_OF[s])
    return "".join(out)


# ---------------------------------------------------------------------------
# Spark UDF surface
# ---------------------------------------------------------------------------

_MARKUP_SCHEMA = (
    "struct<styles: array<string>, "
    "spans: array<struct<styles: array<string>, text: string>>>"
)


def markup_parse_udf():
    """UDF: markup line → struct(styles, spans) for DataFrame pipelines."""
    from pyspark.sql.functions import udf

    def parse(markup):
        if markup is None:
            return None
        b = markup_to_block(markup)
        return (b["styles"], [(s["styles"], s["text"]) for s in b["spans"]])

    return udf(parse, _MARKUP_SCHEMA)


def block_markup_udf():
    """UDF: struct(styles, spans) → canonical markup string."""
    from pyspark.sql.functions import udf

    def render(block):
        if block is None:
            return None
        # chained python UDFs hand structs over as plain tuples, standalone
        # columns as Rows — positional access covers both
        styles, spans = block[0], block[1]
        return block_to_markup(
            {
                "type": "text",
                "styles": list(styles or []),
                "spans": [
                    {"type": "text", "styles": list(s[0] or []), "text": s[1]}
                    for s in (spans or [])
                ],
            }
        )

    return udf(render, "string")
