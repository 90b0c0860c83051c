"""Deterministic syntax highlighters for the `--syntax` CLI flag.

The reference CLI registers syntect highlighters for "rs" and "html"
(/root/reference/html2text-cli/src/main.rs:94-127, 143-148); syntect is
not available here, so these are small deterministic keyword/regex
highlighters with the same *plumbing* contract: `highlighter(text) ->
[(start, end, fg_rgb, bg_rgb | None)]` with non-overlapping, sorted
character spans, consumed by the `x-syntax` css_ext machinery
(engine/lower.py:240-250).  Colours follow the reference theme's broad
strokes (keywords blue, strings green, comments grey).
"""

from __future__ import annotations

import re

_KW_BLUE = (0, 0, 255)
_STR_GREEN = (0, 128, 0)
_COMMENT_GREY = (128, 128, 128)

_RS_KEYWORDS = (
    "as async await break const continue crate dyn else enum extern fn for "
    "if impl in let loop match mod move mut pub ref return self static "
    "struct super trait type unsafe use where while"
).split()

_RS_TOKEN = re.compile(
    r"(?P<comment>//[^\n]*)"
    r'|(?P<string>"(?:[^"\\\n]|\\.)*")'
    r"|(?P<word>\b(?:" + "|".join(_RS_KEYWORDS) + r")\b)"
)

_HTML_TOKEN = re.compile(
    r"(?P<comment><!--.*?-->)"
    r"|(?P<string>\"[^\"\n]*\"|'[^'\n]*')"
    r"|(?P<word></?[A-Za-z][A-Za-z0-9-]*|/?>)",
    re.DOTALL,
)

_COLOURS = {"comment": _COMMENT_GREY, "string": _STR_GREEN, "word": _KW_BLUE}


def _highlight(pattern: re.Pattern, text: str):
    spans = []
    for m in pattern.finditer(text):
        kind = m.lastgroup
        if kind:
            spans.append((m.start(), m.end(), _COLOURS[kind], None))
    return spans


def highlight_rs(text: str):
    return _highlight(_RS_TOKEN, text)


def highlight_html(text: str):
    return _highlight(_HTML_TOKEN, text)


#: registry used by the CLI's --syntax flag (main.rs:143-148 registers
#: exactly these two languages)
DEFAULT_HIGHLIGHTERS = {"rs": highlight_rs, "html": highlight_html}
