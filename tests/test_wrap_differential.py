"""Differential test: the bulk ASCII fast path in WrappedBlock must be
byte-identical to the reference per-char algorithm (the `add_text` loop that
mirrors text_renderer.rs:708-814) over randomized inputs."""

from __future__ import annotations

import random

from rust_html2text_spark.engine.taggedline import TaggedLine, TaggedString
from rust_html2text_spark.engine.textutil import (
    always_takes_space,
    char_width,
    is_unicode_whitespace,
    is_wordbreak_point,
)
from rust_html2text_spark.engine.wrapped import WS_NORMAL, WS_PRE, WrappedBlock


def reference_add_text_normal(block: WrappedBlock, text: str, tag) -> None:
    """The original per-char Normal-mode algorithm (kept verbatim here as
    the differential oracle)."""
    ws_mode = WS_NORMAL
    for c in text:
        if is_wordbreak_point(c) and block.wordlen > 0:
            block.flush_word()
        if c == "\u200b":
            continue
        if not always_takes_space(c):
            if block.line.len > 0 and block.wslen == 0:
                block.spacetag = (tag, ws_mode)
                block.wslen = 1
        else:
            cwidth = char_width(c)
            if cwidth >= 0:
                block.wordlen += cwidth
                block.word.push_char(c, (tag, ws_mode))


def render_with(add_fn, pieces, width, pre_pieces=()):
    block = WrappedBlock(width, False, False, ("t",))
    for ws_mode, text, tag in pre_pieces:
        block.add_text(text, ws_mode, (tag,), (tag, "cont"))
    for text, tag in pieces:
        add_fn(block, text, (tag,))
    lines = block.into_lines()
    return [
        [(e.s, e.tag) for e in line.v if isinstance(e, TaggedString)]
        for line in lines
    ]


WORDS = [
    "a", "ab", "lorem", "ipsum", "consectetur", "x" * 15, "y" * 45,
    "punct,", "end.", "(paren)", "no\u200bbreak", "nb\xa0sp", "日本語",
    "mixé", "em—dash", "", "z" * 80,
]
SEPS = [" ", "  ", "\n", "\t", " \n ", " ", ""]


def test_differential_random():
    rng = random.Random(42)
    for trial in range(400):
        width = rng.choice([5, 8, 12, 20, 40, 80])
        n = rng.randint(1, 12)
        pieces = []
        for _ in range(n):
            text = "".join(
                rng.choice(WORDS) + rng.choice(SEPS) for _ in range(rng.randint(1, 6))
            )
            tag = rng.choice(["t", "u"])
            pieces.append((text, tag))
        fast = render_with(
            lambda b, t, tg: b.add_text(t, WS_NORMAL, tg, tg), pieces, width
        )
        slow = render_with(reference_add_text_normal, pieces, width)
        assert fast == slow, (width, pieces)


def test_differential_after_pre():
    """Normal-mode text arriving after preformatted text (stale pending
    whitespace / pre_wrapped state) must behave identically."""
    rng = random.Random(7)
    for trial in range(200):
        width = rng.choice([6, 12, 30])
        pre_text = rng.choice(
            ["keep   spaces ", "tail ", "x" * 20 + "   ", "a\nb  ", "   "]
        )
        pieces = [
            (
                "".join(
                    rng.choice(WORDS) + rng.choice(SEPS)
                    for _ in range(rng.randint(1, 4))
                ),
                "t",
            )
        ]
        pre = [(WS_PRE, pre_text, "p")]
        fast = render_with(
            lambda b, t, tg: b.add_text(t, WS_NORMAL, tg, tg),
            pieces,
            width,
            pre_pieces=pre,
        )
        slow = render_with(reference_add_text_normal, pieces, width, pre_pieces=pre)
        assert fast == slow, (width, pre_text, pieces)


def reference_add_text_pre(block: WrappedBlock, text: str, tag) -> None:
    """The original per-char Pre-mode algorithm with equal main/wrap tags
    (differential oracle for _add_text_pre_sametag)."""
    ws_mode = WS_PRE
    for c in text:
        if c == "\u200b":
            continue
        if not always_takes_space(c):
            if c == "\n":
                block.flush_word()
                block.force_flush_line()
                block.wslen = 0
                block.spacetag = None
                block.pre_wrapped = False
            elif c == "\t":
                block.flush_word()
                pos = block.line.len + block.wordlen + block.wslen
                at_least_one_space = False
                while pos % 8 != 0 or not at_least_one_space:
                    if pos >= block.width:
                        block.flush_line()
                        pos = 0
                    else:
                        block.line.push_char(" ", (tag, ws_mode))
                        pos += 1
                        at_least_one_space = True
            else:
                cwidth = char_width(c)
                if cwidth >= 0:
                    if block.word.is_empty() and is_unicode_whitespace(c):
                        block.wslen += cwidth
                        block.spacetag = (tag, ws_mode)
                    else:
                        block.word.push_char(c, (tag, ws_mode))
                        block.wordlen += cwidth
        else:
            cwidth = char_width(c)
            if cwidth >= 0:
                block.wordlen += cwidth
                if ws_mode == WS_PRE and (
                    block.line.len + block.wslen + block.wordlen > block.width
                ):
                    block.pre_wrapped = True
                block.word.push_char(c, (tag, ws_mode))


def test_differential_pre_sametag():
    from rust_html2text_spark.engine.errors import TooNarrow

    rng = random.Random(17)
    pre_words = WORDS + ["\t", "\n", "   ", "a\tb", "x\n y", "\xa0\xa0",
                         "好好", "💡", "", "\u200b", "é̶", "\r"]
    for trial in range(400):
        width = rng.choice([1, 2, 4, 8, 15, 40])
        pieces = [
            (
                "".join(rng.choice(pre_words) for _ in range(rng.randint(1, 8))),
                rng.choice("tu"),
            )
            for _ in range(rng.randint(1, 4))
        ]

        def outcome(fn):
            # both paths must agree on TooNarrow as well as on lines
            try:
                return ("ok", render_with(fn, pieces, width))
            except TooNarrow:
                return ("too_narrow",)

        fast = outcome(lambda b, t, tg: b.add_text(t, WS_PRE, tg, tg))
        slow = outcome(reference_add_text_pre)
        assert fast == slow, (width, pieces)
