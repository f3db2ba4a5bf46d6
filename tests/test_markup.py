"""Markup parity (assemblage_view/tests/markup.rs, fixture F9)."""

from __future__ import annotations

import pytest

from assemblagedb_spark.model import CHAIN, PAGE
from assemblagedb_spark.views.markup import (
    block_to_markup,
    markup_to_block,
    markup_to_node,
)


def block(styles, spans):
    return {
        "type": "text",
        "styles": sorted(styles),
        "spans": [{"type": "text", "styles": sorted(s), "text": t} for s, t in spans],
    }


def assert_roundtrip(markup, expected_block, complete=None):
    assert markup_to_block(markup) == expected_block
    assert block_to_markup(expected_block) == (complete if complete is not None else markup)


def test_parse_markup_to_node():
    # markup.rs tests: "just text" -> page[text]
    node = markup_to_node("just text")
    assert node.is_list(PAGE)
    assert node.children[0].node.text == "just text"

    node = markup_to_node("# A Heading")
    assert node.is_styled("block") and node.styles == {"heading"}
    assert node.children[0].node.text == "A Heading"

    node = markup_to_node("# A *Bold* Heading")
    assert node.is_styled("block") and node.styles == {"heading"}
    chain = node.children[0].node
    assert chain.is_list(CHAIN)
    parts = [c.node for c in chain.children]
    assert parts[0].text == "A "
    assert parts[1].is_styled("span") and parts[1].styles == {"bold"}
    assert parts[1].children[0].node.text == "Bold"
    assert parts[2].text == " Heading"


def test_block_without_markup():
    assert_roundtrip(
        "some block without special markup",
        block([], [([], "some block without special markup")]),
    )


def test_block_markup_prefix():
    assert_roundtrip("># A Heading & Quote", block(["heading", "quote"], [([], "A Heading & Quote")]))
    # duplicate prefix chars collapse
    assert markup_to_block("##>#>>#>> A Heading & Quote") == block(
        ["heading", "quote"], [([], "A Heading & Quote")]
    )
    assert_roundtrip(
        ",>-# All block styles",
        block(["aside", "heading", "list", "quote"], [([], "All block styles")]),
    )
    # no space after prefix -> no styles
    m = ",>-#no styles because the space after the prefix is missing"
    assert_roundtrip(m, block([], [([], m)]))


def test_span_markup():
    assert_roundtrip(
        "A *very bold* statement!",
        block([], [([], "A "), (["bold"], "very bold"), ([], " statement!")]),
    )
    assert_roundtrip(
        "~_*struck bold italic*_~ _*bold italic*_",
        block(
            [],
            [
                (["bold", "italic", "struck"], "struck bold italic"),
                ([], " "),
                (["bold", "italic"], "bold italic"),
            ],
        ),
    )
    assert_roundtrip(
        "*bold*_italic_~struck~`code`",
        block(
            [],
            [(["bold"], "bold"), (["italic"], "italic"), (["struck"], "struck"), (["code"], "code")],
        ),
    )


def test_nested_and_overlapping_markup():
    assert_roundtrip(
        "*bold and_italic ~text~_ markup*!",
        block(
            [],
            [
                (["bold"], "bold and"),
                (["bold", "italic"], "italic "),
                (["bold", "italic", "struck"], "text"),
                (["bold"], " markup"),
                ([], "!"),
            ],
        ),
    )
    assert_roundtrip(
        "bold *and _italic* and ~struck overlap_ here~",
        block(
            [],
            [
                ([], "bold "),
                (["bold"], "and "),
                (["bold", "italic"], "italic"),
                (["italic"], " and "),
                (["italic", "struck"], "struck overlap"),
                (["struck"], " here"),
            ],
        ),
    )


def test_incomplete_markup_completed_on_serialize():
    b = block([], [([], "italic starts "), (["italic"], "here but never ends...")])
    assert markup_to_block("italic starts _here but never ends...") == b
    assert block_to_markup(b) == "italic starts _here but never ends..._"


def test_escaped_span_markup():
    b = block([], [([], "_not \\italic, "), (["italic"], "italic _ until here")])
    assert markup_to_block("\\_not \\italic, _italic \\_ until here_") == b
    assert block_to_markup(b) == "\\_not \\\\italic, _italic \\_ until here_"


def test_escaped_block_markup():
    m = "\\#> neither a heading nor a quote"
    b = block([], [([], "#> neither a heading nor a quote")])
    assert_roundtrip(m, b)

    incomplete = "\\#>neither a heading nor a quote"
    b = block([], [([], incomplete)])
    assert markup_to_block(incomplete) == b
    assert block_to_markup(b) == "\\\\#>neither a heading nor a quote"


def test_empty_inline_markup():
    b = block([], [([], "a text that contains empty "), ([], " bold markup")])
    assert markup_to_block("a text that contains empty ** bold markup") == b
    assert block_to_markup(b) == "a text that contains empty  bold markup"

    b = block([], [([], "a text that contains empty markup")])
    assert markup_to_block("a text that contains empty markup_*") == b
    assert block_to_markup(b) == "a text that contains empty markup"


def test_newline_rejected():
    with pytest.raises(ValueError):
        markup_to_block("two\nlines")


def test_markup_udfs(spark):
    from assemblagedb_spark.views.markup import block_markup_udf, markup_parse_udf
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("# A *Bold* Heading",), ("plain",)], "markup string"
    )
    parsed = df.select("markup", markup_parse_udf()("markup").alias("block"))
    out = parsed.select("markup", block_markup_udf()("block").alias("rendered")).collect()
    got = {r["markup"]: r["rendered"] for r in out}
    assert got["# A *Bold* Heading"] == "# A *Bold* Heading"
    assert got["plain"] == "plain"
