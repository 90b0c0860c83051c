"""Character width & whitespace classification.

Semantics follow the reference engine's char classes
(/root/reference/src/lib.rs:63-103) and the `unicode-width` crate (0.2):
- `char_width(c)` returns the terminal cell width, or -1 for control
  characters (the Rust `Option::None` case).
- Rust `char::is_whitespace` is the Unicode White_Space property, which
  differs from Python's `str.isspace` (no U+001C..1F), so we pin our own set.
"""

from __future__ import annotations

from wcwidth import wcwidth

# Unicode White_Space property (what Rust char::is_whitespace uses).
_WHITESPACE = frozenset(
    "\t\n\x0b\x0c\r \x85\xa0"
    "\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008"
    "\u2009\u200a\u2028\u2029\u202f\u205f\u3000"
)


def is_unicode_whitespace(c: str) -> bool:
    return c in _WHITESPACE


def always_takes_space(c: str) -> bool:
    """True for non-whitespace and for non-breaking spaces (lib.rs:74-81)."""
    if c == "\xa0":
        return True
    return c not in _WHITESPACE


def is_wordbreak_point(c: str) -> bool:
    """True where a word may end (lib.rs:83-91): most whitespace (not NBSP)
    plus the zero-width space."""
    if c == "\xa0":
        return False
    if c == "\u200b":
        return True
    return c in _WHITESPACE


def trim_collapsible_ws(s: str) -> str:
    """Trim leading/trailing whitespace except hard spaces (lib.rs:94-103)."""
    start = 0
    end = len(s)
    while start < end and not always_takes_space(s[start]):
        start += 1
    while end > start and not always_takes_space(s[end - 1]):
        end -= 1
    return s[start:end]


_width_cache: dict[str, int] = {}


def char_width(c: str) -> int:
    """Cell width of a char; -1 where unicode-width returns None (controls).

    unicode-width 0.2 gives width 0 to zero-width/combining chars and the
    ZWSP, 2 to East-Asian wide/fullwidth, and None to control chars.
    wcwidth models the same tables with -1 for controls, with a couple of
    divergences we patch here.
    """
    try:
        return _width_cache[c]
    except KeyError:
        pass
    w = wcwidth(c)
    o = ord(c)
    if o == 0xA0:  # NBSP: width 1 in unicode-width
        w = 1
    elif o == 0xAD:  # soft hyphen: width 1 in unicode-width
        w = 1
    elif w < 0 and o >= 0x80 and not (0x80 <= o <= 0x9F):
        # wcwidth marks some non-control chars -1; unicode-width only
        # excludes actual control characters.
        w = 1
    _width_cache[c] = w
    return w


def str_width(s: str) -> int:
    """Display width of a string (unicode-width's UnicodeWidthStr::width:
    sum of char widths, None counted as 0)."""
    if s.isascii() and s.isprintable():
        return len(s)
    total = 0
    for c in s:
        w = char_width(c)
        if w > 0:
            total += w
    return total
