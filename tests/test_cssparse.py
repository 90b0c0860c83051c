"""CSS parser unit tests derived from the reference parser's own test
expectations (/root/reference/src/css/parser.rs:1160-1460) plus the
application paths (style attrs, colour attrs, at-rule skipping)."""

from __future__ import annotations

from rust_html2text_spark.engine import cssparse
from rust_html2text_spark.engine.styles import (
    C_CLASS,
    C_COMB_CHILD,
    C_COMB_DESC,
    C_ELEMENT,
    C_HASH,
    C_NTH_CHILD,
    DISPLAY_NONE,
    S_BG_COLOUR,
    S_COLOUR,
    S_DISPLAY,
    S_WHITE_SPACE,
)
from rust_html2text_spark.engine.wrapped import WS_PRE_WRAP


def rules(css: str):
    styles, _pos = cssparse._parse_rules(css, 0)
    return [(s.kind, s.value, s.important) for s in styles]


def test_parse_color_hex():
    assert rules("color: #123; color: #abcdef") == [
        (S_COLOUR, (0x11, 0x22, 0x33), False),
        (S_COLOUR, (0xAB, 0xCD, 0xEF), False),
    ]


def test_parse_named_colour():
    assert rules("color: white") == [(S_COLOUR, (0xFF, 0xFF, 0xFF), False)]
    assert rules("color: orange") == [(S_COLOUR, (0xFF, 0xA5, 0x00), False)]
    assert rules("color: nonsensecolour") == []


def test_parse_rgb():
    assert rules("color: rgb(1, 2, 3)") == [(S_COLOUR, (1, 2, 3), False)]
    assert rules("color: rgb(300, 2, 3)") == []  # u8 overflow → unknown


def test_parse_important():
    assert rules("background-color: #332211 !important") == [
        (S_BG_COLOUR, (0x33, 0x22, 0x11), True)
    ]


def test_height_overflow_combo():
    # height:0 + overflow:hidden ⇒ synthesized display:none (css.rs:473-479)
    assert rules("height: 0; overflow: hidden") == [(S_DISPLAY, DISPLAY_NONE, False)]
    assert rules("max-height: 0px; overflow-y: hidden") == [
        (S_DISPLAY, DISPLAY_NONE, False)
    ]
    assert rules("height: 10px; overflow: hidden") == []


def test_white_space():
    assert rules("white-space: pre-wrap") == [(S_WHITE_SPACE, WS_PRE_WRAP, False)]


def test_background_last_layer():
    # `background:` takes the colour of the last comma-separated layer
    assert rules("background: url(x), #ff0000") == [
        (S_BG_COLOUR, (0xFF, 0, 0), False)
    ]


def test_stylesheet_at_rules_skipped():
    parsed, _pos = cssparse.parse_stylesheet(
        """
        @media paper {
        }
        @blah asldfkjasfda;
        p { color: red; }
        """
    )
    assert len(parsed) == 1
    selectors, styles = parsed[0]
    assert selectors[0].components[0].kind == C_ELEMENT
    assert styles[0].kind == S_COLOUR


def test_selector_shapes():
    sel, _pos = cssparse.parse_selector("div.cls > #id p:nth-child(2n+1)", 0)
    kinds = [c.kind for c in sel.components]
    # stored right-to-left: nth-child, p(element), descendant, #id, child, .cls, div
    assert kinds == [
        C_NTH_CHILD,
        C_ELEMENT,
        C_COMB_DESC,
        C_HASH,
        C_COMB_CHILD,
        C_CLASS,
        C_ELEMENT,
    ]
    nth = sel.components[0]
    assert (nth.a, nth.b) == (2, 1)


def test_pseudo_element():
    sel, _pos = cssparse.parse_selector("em::before", 0)
    assert sel.pseudo_element == "before"


def test_color_attribute_fallback():
    # legacy bare-hex (parser.rs:405-419)
    assert cssparse.parse_color_attribute("00aabb") == (0x00, 0xAA, 0xBB)
    assert cssparse.parse_color_attribute("#0f0") == (0, 0xFF, 0)
    assert cssparse.parse_color_attribute("red") == (0xFF, 0, 0)
    assert cssparse.parse_color_attribute("zzz") is None


def test_style_attribute():
    decls = cssparse.parse_style_attribute("color: red; display: none")
    assert [(d.kind, d.value) for d in decls] == [
        (S_COLOUR, (0xFF, 0, 0)),
        (S_DISPLAY, DISPLAY_NONE),
    ]


def test_out_of_range_hex_escape_becomes_replacement_char():
    """parser.rs:257: char::from_u32(val).unwrap_or(U+FFFD) — escapes above
    0x10FFFF or in the surrogate range must not crash, they map to U+FFFD."""
    from rust_html2text_spark.engine.cssparse import add_css

    for css in ("\\aaaaaa { color: red }", "\\d800 { color: red }"):
        rules = []
        add_css(rules, css, allow_extensions=True)
        assert len(rules) == 1
