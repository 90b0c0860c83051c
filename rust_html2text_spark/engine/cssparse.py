"""CSS parsing subset.

Re-derives the reference's nom-based CSS parser
(/root/reference/src/css/parser.rs): tokenizer (parse_token, rs:302-371),
declarations + recognized properties (rs:421-522), colours incl. the
faulty bare-hex fallback (rs:394-419, 528-593), selectors (rs:830-1040),
rulesets/at-rule skipping (rs:1041-1150) and style attributes (rs:1152+).
"""

from __future__ import annotations

import re

from .errors import CssParseError
from .styles import (
    C_ATTR,
    C_CLASS,
    C_COMB_CHILD,
    C_COMB_DESC,
    C_ELEMENT,
    C_HASH,
    C_NTH_CHILD,
    C_STAR,
    DISPLAY_NONE,
    DISPLAY_RAW_DOM,
    Ruleset,
    S_BG_COLOUR,
    S_COLOUR,
    S_CONTENT,
    S_DISPLAY,
    S_SYNTAX,
    S_WHITE_SPACE,
    Selector,
    SelectorComponent,
    StyleDecl,
)
from .wrapped import WS_NORMAL, WS_PRE, WS_PRE_WRAP

# --- tokenizer ----------------------------------------------------------------

T_IDENT = "ident"
T_FUNCTION = "function"
T_HASH = "hash"
T_STRING = "string"
T_BADSTRING = "badstring"
T_NUMBER = "number"
T_PERCENT = "percent"
T_DIMENSION = "dimension"
T_AT = "at"
T_DELIM = "delim"
T_COLON = "colon"
T_SEMI = "semi"
T_COMMA = "comma"
T_OPEN_ROUND = "("
T_CLOSE_ROUND = ")"
T_OPEN_SQUARE = "["
T_CLOSE_SQUARE = "]"
T_OPEN_BRACE = "{"
T_CLOSE_BRACE = "}"
T_CDO = "cdo"
T_CDC = "cdc"

_WS_RE = re.compile(r"(?:\s+|/\*.*?\*/)+", re.S)
_NUM_RE = re.compile(r"[+-]?(?:[0-9]+\.[0-9]+|[0-9]*\.[0-9]+|[0-9]+)")


def _skip_ws(text: str, pos: int) -> int:
    m = _WS_RE.match(text, pos)
    return m.end() if m else pos


def _is_ident_start(c: str) -> bool:
    return c.isalpha() or c == "_" or ord(c) > 0x7F


def _is_nmchar(c: str) -> bool:
    return c.isalnum() or c in "_-" or ord(c) > 0x7F


def _parse_ident(text: str, pos: int):
    """parser.rs:274-288 (escapes handled minimally)."""
    pos = _skip_ws(text, pos)
    out = []
    if pos < len(text) and text[pos] == "-":
        out.append("-")
        pos += 1
    if pos >= len(text) or not (_is_ident_start(text[pos]) or text[pos] == "\\"):
        return None
    while pos < len(text):
        c = text[pos]
        if c == "\\" and pos + 1 < len(text):
            nxt = text[pos + 1]
            m = re.match(r"[0-9a-fA-F]{1,6}", text[pos + 1 :])
            if m:
                # out-of-range / surrogate code points become U+FFFD
                # (parser.rs:257 `char::from_u32(val).unwrap_or('\u{fffd}')`)
                val = int(m.group(0), 16)
                if val > 0x10FFFF or 0xD800 <= val <= 0xDFFF:
                    out.append("�")
                else:
                    out.append(chr(val))
                pos += 1 + m.end()
                if pos < len(text) and text[pos] in " \t\n":
                    pos += 1
            else:
                out.append(nxt)
                pos += 2
        elif _is_nmchar(c):
            out.append(c)
            pos += 1
        else:
            break
    if not out or out == ["-"]:
        return None
    return "".join(out), pos


def _parse_identstring(text: str, pos: int):
    pos = _skip_ws(text, pos)
    out = []
    while pos < len(text) and _is_nmchar(text[pos]):
        out.append(text[pos])
        pos += 1
    if not out:
        return None
    return "".join(out), pos


def _parse_string_token(text: str, pos: int):
    end_char = text[pos]
    pos += 1
    out = []
    while pos < len(text):
        c = text[pos]
        if c == end_char:
            return (T_STRING, "".join(out)), pos + 1
        if c == "\n":
            return (T_BADSTRING, "".join(out)), pos
        if c == "\\":
            if pos + 1 >= len(text):
                return (T_STRING, "".join(out)), pos + 1
            nxt = text[pos + 1]
            if nxt != "\n":
                out.append(nxt)
            pos += 2
            continue
        out.append(c)
        pos += 1
    return (T_STRING, "".join(out)), pos


def _parse_numeric(text: str, pos: int):
    m = _NUM_RE.match(text, pos)
    if not m:
        return None
    num = m.group(0)
    pos = m.end()
    if pos < len(text) and text[pos] == "%":
        return (T_PERCENT, num), pos + 1
    ident = _parse_ident(text, pos)
    if ident is not None and not text[pos:].startswith((" ", "\t", "\n")):
        # dimension only when the unit directly follows
        name, npos = ident
        return (T_DIMENSION, (num, name)), npos
    return (T_NUMBER, num), pos


def parse_token(text: str, pos: int):
    """Returns ((kind, value), new_pos) or None at end/fail."""
    pos = _skip_ws(text, pos)
    if pos >= len(text):
        return None
    c = text[pos]
    if c in "\"'":
        return _parse_string_token(text, pos)
    if c == "#":
        ident = _parse_identstring(text, pos + 1)
        if ident is not None:
            return (T_HASH, ident[0]), ident[1]
        return (T_DELIM, "#"), pos + 1
    if c == ";":
        return (T_SEMI, ";"), pos + 1
    if c == "(":
        return (T_OPEN_ROUND, c), pos + 1
    if c == ")":
        return (T_CLOSE_ROUND, c), pos + 1
    if c == "+":
        num = _parse_numeric(text, pos + 1)
        if num is not None:
            return num
        return (T_DELIM, "+"), pos + 1
    if c == ",":
        return (T_COMMA, ","), pos + 1
    if c == "-":
        num = _parse_numeric(text, pos)
        if num is not None:
            return num
        if text.startswith("-->", pos):
            return (T_CDC, "-->"), pos + 3
        ident = _parse_ident(text, pos)
        if ident is not None:
            return _ident_like(text, ident)
        return (T_DELIM, "-"), pos + 1
    if c == ".":
        num = _parse_numeric(text, pos)
        if num is not None:
            return num
        return (T_DELIM, "."), pos + 1
    if c == ":":
        return (T_COLON, ":"), pos + 1
    if c == "<":
        if text.startswith("<!--", pos):
            return (T_CDO, "<!--"), pos + 4
        return (T_DELIM, "<"), pos + 1
    if c == "@":
        ident = _parse_ident(text, pos + 1)
        if ident is not None:
            return (T_AT, ident[0]), ident[1]
        return (T_DELIM, "@"), pos + 1
    if c == "[":
        return (T_OPEN_SQUARE, c), pos + 1
    if c == "\\":
        ident = _parse_ident(text, pos)
        if ident is not None:
            return _ident_like(text, ident)
        return (T_DELIM, "\\"), pos + 1
    if c == "]":
        return (T_CLOSE_SQUARE, c), pos + 1
    if c == "{":
        return (T_OPEN_BRACE, c), pos + 1
    if c == "}":
        return (T_CLOSE_BRACE, c), pos + 1
    if _is_ident_start(c):
        ident = _parse_ident(text, pos)
        if ident is not None:
            return _ident_like(text, ident)
    if c.isdigit():
        num = _parse_numeric(text, pos)
        if num is not None:
            return num
    return (T_DELIM, c), pos + 1


def _ident_like(text, ident):
    name, pos = ident
    if pos < len(text) and text[pos] == "(":
        return (T_FUNCTION, name), pos + 1
    return (T_IDENT, name), pos


# --- values & colours -----------------------------------------------------------


def _parse_value(text: str, pos: int):
    """Tokens until ';' / end / '}' boundary; !important extraction."""
    tokens = []
    while True:
        save = pos
        tok = parse_token(text, pos)
        if tok is None:
            break
        (kind, value), npos = tok
        if kind == T_SEMI or kind == T_CLOSE_BRACE:
            pos = save
            break
        tokens.append((kind, value))
        pos = npos
    important = False
    if (
        len(tokens) >= 2
        and tokens[-2] == (T_DELIM, "!")
        and tokens[-1][0] == T_IDENT
        and tokens[-1][1] == "important"
    ):
        tokens = tokens[:-2]
        important = True
    return tokens, important, pos


_NAMED_COLOURS = {
    "aqua": (0, 0xFF, 0xFF),
    "black": (0, 0, 0),
    "blue": (0, 0, 0xFF),
    "fuchsia": (0xFF, 0, 0xFF),
    "gray": (0x80, 0x80, 0x80),
    "green": (0, 0x80, 0),
    "lime": (0, 0xFF, 0),
    "maroon": (0x80, 0, 0),
    "navy": (0, 0, 0x80),
    "olive": (0x80, 0x80, 0),
    "orange": (0xFF, 0xA5, 0),
    "purple": (0x80, 0, 0x80),
    "red": (0xFF, 0, 0),
    "silver": (0xC0, 0xC0, 0xC0),
    "teal": (0, 0x80, 0x80),
    "white": (0xFF, 0xFF, 0xFF),
    "yellow": (0xFF, 0xFF, 0),
}


def parse_color(tokens):
    """parser.rs:528-593; returns (r,g,b) or None."""
    if not tokens:
        return None
    if len(tokens) == 1:
        kind, value = tokens[0]
        if kind == T_IDENT:
            return _NAMED_COLOURS.get(value)
        if kind == T_HASH:
            s = value
            try:
                v = int(s, 16)
            except ValueError:
                return None
            if len(s) == 3:
                return (
                    ((v >> 8) & 0xF) * 0x11,
                    ((v >> 4) & 0xF) * 0x11,
                    (v & 0xF) * 0x11,
                )
            if len(s) == 6:
                return ((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)
            return None
        return None
    if tokens[0][0] == T_FUNCTION and tokens[-1][0] == T_CLOSE_ROUND:
        if tokens[0][1] == "rgb":
            args = tokens[1:-1]
            if (
                len(args) == 5
                and args[0][0] == T_NUMBER
                and args[1][0] == T_COMMA
                and args[2][0] == T_NUMBER
                and args[3][0] == T_COMMA
                and args[4][0] == T_NUMBER
            ):
                try:
                    r, g, b = (int(args[i][1]) for i in (0, 2, 4))
                except ValueError:
                    return None
                if 0 <= r <= 255 and 0 <= g <= 255 and 0 <= b <= 255:
                    return (r, g, b)
            return None
    return None


def parse_color_attribute(text: str):
    """parser.rs:394-419 incl. faulty bare-hex fallback."""
    tokens, _imp, _pos = _parse_value(text, 0)
    col = parse_color(tokens)
    if col is not None:
        return col
    t = text.strip()
    try:
        r = int(t[0:2], 16)
        g = int(t[2:4], 16)
        b = int(t[4:6], 16)
        return (r, g, b)
    except (ValueError, IndexError):
        return None


_HEIGHT_UNITS = frozenset("in cm mm pt pc px em ex".split())


def _parse_declaration(text: str, pos: int):
    """parser.rs:421-522; returns (decls_or_None, new_pos) or None on fail."""
    ident = _parse_ident(text, pos)
    if ident is None:
        return None
    prop, pos = ident
    pos = _skip_ws(text, pos)
    if pos >= len(text) or text[pos] != ":":
        return None
    pos += 1
    pos = _skip_ws(text, pos)
    tokens, important, pos = _parse_value(text, pos)
    return (prop, tokens, important), pos


def _styles_from_declaration(prop, tokens, important, state, allow_extensions=False):
    """css.rs:363-481 property recognition; returns list[StyleDecl]."""
    out = []
    if prop == "color":
        col = parse_color(tokens)
        if col is not None:
            out.append(StyleDecl(S_COLOUR, col, important))
    elif prop == "background-color":
        col = parse_color(tokens)
        if col is not None:
            out.append(StyleDecl(S_BG_COLOUR, col, important))
    elif prop == "background":
        # last comma-separated layer only
        last = []
        for tok in tokens:
            if tok[0] == T_COMMA:
                last = []
            else:
                last.append(tok)
        col = parse_color(last)
        if col is not None:
            out.append(StyleDecl(S_BG_COLOUR, col, important))
    elif prop in ("height", "max-height"):
        if len(tokens) == 1:
            kind, value = tokens[0]
            if kind == T_DIMENSION and value[1] in _HEIGHT_UNITS:
                try:
                    if float(value[0]) == 0.0:
                        state["height_zero"] = True
                except ValueError:
                    pass
            elif kind == T_NUMBER:
                try:
                    if float(value) == 0.0:
                        state["height_zero"] = True
                except ValueError:
                    pass
    elif prop in ("overflow", "overflow-y"):
        for kind, value in tokens:
            if kind == T_IDENT and value in ("visible", "hidden", "scroll", "auto"):
                if value == "hidden":
                    state["overflow_hidden"] = True
                break
    elif prop == "display":
        for kind, value in tokens:
            if kind == T_IDENT and value == "none":
                out.append(StyleDecl(S_DISPLAY, DISPLAY_NONE, important))
                break
            if kind == T_IDENT and value == "x-raw-dom" and allow_extensions:
                out.append(StyleDecl(S_DISPLAY, DISPLAY_RAW_DOM, important))
                break
    elif prop == "white-space":
        ws = WS_NORMAL
        for kind, value in tokens:
            if kind == T_IDENT and value in ("normal", "pre", "pre-wrap"):
                ws = {"normal": WS_NORMAL, "pre": WS_PRE, "pre-wrap": WS_PRE_WRAP}[value]
                break
        out.append(StyleDecl(S_WHITE_SPACE, ws, important))
    elif prop == "x-syntax":
        # css_ext extension (parser.rs:788-793); agent/user CSS only
        if allow_extensions and tokens and tokens[0][0] == T_IDENT:
            out.append(StyleDecl(S_SYNTAX, tokens[0][1], important))
    elif prop == "content":
        parts = []
        ok = True
        for kind, value in tokens:
            if kind == T_STRING:
                parts.append(value)
            else:
                ok = False
                break
        if ok:
            out.append(StyleDecl(S_CONTENT, "".join(parts), important))
    return out


def _parse_rules(text: str, pos: int, allow_extensions=False):
    """Declarations separated by ';' (parser.rs:824-828) →
    (styles, new_pos)."""
    styles: list[StyleDecl] = []
    state = {"height_zero": False, "overflow_hidden": False}
    first = True
    while True:
        if not first:
            save = pos
            pos2 = _skip_ws(text, pos)
            if pos2 < len(text) and text[pos2] == ";":
                pos = _skip_ws(text, pos2 + 1)
            else:
                pos = save
                break
        first = False
        decl = _parse_declaration(text, pos)
        if decl is None:
            break
        (prop, tokens, important), pos = decl
        styles.extend(
            _styles_from_declaration(prop, tokens, important, state, allow_extensions)
        )
    if state["height_zero"] and state["overflow_hidden"]:
        styles.append(StyleDecl(S_DISPLAY, DISPLAY_NONE, False))
    return styles, pos


# --- selectors ------------------------------------------------------------------


def _parse_nth_child_args(text: str, pos: int):
    if pos >= len(text) or text[pos] != "(":
        return None
    pos = _skip_ws(text, pos + 1)
    m = re.match(r"even\b", text[pos:])
    a = b = None
    if text.startswith("even", pos):
        a, b = 2, 0
        pos += 4
    elif text.startswith("odd", pos):
        a, b = 2, 1
        pos += 3
    else:
        m = re.match(r"([+-]?)(\d*)n\s*([+-])(\d+)", text[pos:])
        if m:
            a = int(m.group(2) or "1") * (-1 if m.group(1) == "-" else 1)
            b = int(m.group(4)) * (-1 if m.group(3) == "-" else 1)
            pos += m.end()
        else:
            m = re.match(r"([+-]?)(\d*)n", text[pos:])
            if m:
                a = int(m.group(2) or "1") * (-1 if m.group(1) == "-" else 1)
                b = 0
                pos += m.end()
            else:
                m = re.match(r"([+-]?)(\d+)", text[pos:])
                if m:
                    a = 0
                    b = int(m.group(2)) * (-1 if m.group(1) == "-" else 1)
                    pos += m.end()
                else:
                    return None
    pos = _skip_ws(text, pos)
    if pos >= len(text) or text[pos] != ")":
        return None
    sel = Selector([SelectorComponent(C_STAR)])
    return SelectorComponent(C_NTH_CHILD, a=a, b=b, sel=sel), pos + 1


def _parse_simple_selector_component(text: str, pos: int):
    """parser.rs:974-992."""
    # child combinator (with optional surrounding ws)
    save = pos
    p = _skip_ws(text, pos)
    if p < len(text) and text[p] == ">":
        p = _skip_ws(text, p + 1)
        return SelectorComponent(C_COMB_CHILD), p
    if p < len(text) and text[p] == "*":
        p = _skip_ws(text, p + 1)
        return SelectorComponent(C_STAR), p
    if p != pos:
        # non-empty whitespace → descendant combinator
        return SelectorComponent(C_COMB_DESC), p
    pos = save
    if pos >= len(text):
        return None
    c = text[pos]
    if c == ".":
        ident = _parse_ident(text, pos + 1)
        if ident is None:
            return None
        return SelectorComponent(C_CLASS, name=ident[0]), ident[1]
    if c == "[":
        ident = _parse_ident(text, pos + 1)
        if ident is None:
            return None
        name, p = ident
        if p < len(text) and text[p] == "]":
            return SelectorComponent(C_ATTR, name=name), p + 1
        if p < len(text) and text[p] == "=":
            p += 1
            if p < len(text) and text[p] in "\"'":
                (kind, value), p2 = _parse_string_token(text, p)
                if kind != T_STRING:
                    return None
            else:
                ident2 = _parse_ident(text, p)
                if ident2 is None:
                    return None
                value, p2 = ident2
            if p2 < len(text) and text[p2] == "]":
                return (
                    SelectorComponent(C_ATTR, name=name, value=value, op_equal=True),
                    p2 + 1,
                )
        return None
    if c == "#":
        ident = _parse_identstring(text, pos + 1)
        if ident is None:
            return None
        return SelectorComponent(C_HASH, name=ident[0]), ident[1]
    if c == ":" and not text.startswith("::", pos):
        ident = _parse_ident(text, pos + 1)
        if ident is None:
            return None
        name, p = ident
        if name == "nth-child":
            nth = _parse_nth_child_args(text, p)
            if nth is not None:
                return nth
        return None
    ident = _parse_ident(text, pos)
    if ident is not None:
        return SelectorComponent(C_ELEMENT, name=ident[0]), ident[1]
    return None


def parse_selector(text: str, pos: int):
    """parser.rs:1014-1040; returns (Selector, new_pos) or None."""
    components = []
    first = _parse_ident(text, pos)
    if first is not None:
        components.append(SelectorComponent(C_ELEMENT, name=first[0]))
        pos = first[1]
    while True:
        comp = _parse_simple_selector_component(text, pos)
        if comp is None:
            break
        components.append(comp[0])
        pos = comp[1]
    if not components:
        return None
    if components and components[-1].kind == C_COMB_DESC:
        components.pop()
    components.reverse()
    if components and components[-1].kind == C_COMB_DESC:
        components.pop()
    pseudo = None
    if text.startswith("::before", pos):
        pseudo = "before"
        pos += 8
    elif text.startswith("::after", pos):
        pseudo = "after"
        pos += 7
    return Selector(components, pseudo), pos


# --- statements --------------------------------------------------------------


def _parse_ruleset(text: str, pos: int):
    pos = _skip_ws(text, pos)
    selectors = []
    save = pos
    while True:
        sel = parse_selector(text, pos)
        if sel is None:
            break
        selectors.append(sel[0])
        pos = sel[1]
        p = _skip_ws(text, pos)
        if p < len(text) and text[p] == ",":
            pos = _skip_ws(text, p + 1)
        else:
            break
    pos = _skip_ws(text, pos)
    if pos >= len(text) or text[pos] != "{":
        return None
    pos = _skip_ws(text, pos + 1)
    styles, pos = _parse_rules(text, pos, allow_extensions=_ALLOW_EXT[0])
    pos = _skip_ws(text, pos)
    if pos < len(text) and text[pos] == ";":
        pos = _skip_ws(text, pos + 1)
    if pos >= len(text) or text[pos] != "}":
        return None
    pos = _skip_ws(text, pos + 1)
    return selectors, styles, pos


def _skip_to_end_of_statement(text: str, pos: int):
    """parser.rs:1079-1129 — bracket-aware skip."""
    bra_stack = []
    while True:
        save = pos
        tok = parse_token(text, pos)
        if tok is None:
            return pos
        (kind, _value), npos = tok
        if kind in (T_FUNCTION, T_OPEN_ROUND):
            bra_stack.append(T_CLOSE_ROUND)
        elif kind == T_CDO:
            bra_stack.append(T_CDC)
        elif kind == T_OPEN_SQUARE:
            bra_stack.append(T_CLOSE_SQUARE)
        elif kind == T_OPEN_BRACE:
            bra_stack.append(T_CLOSE_BRACE)
        elif kind == T_SEMI:
            if not bra_stack:
                return npos
        elif kind == T_CLOSE_BRACE and not bra_stack:
            return save
        elif kind in (T_CDC, T_CLOSE_SQUARE, T_CLOSE_ROUND, T_CLOSE_BRACE):
            if bra_stack and bra_stack[-1] == kind:
                bra_stack.pop()
                if kind == T_CLOSE_BRACE and not bra_stack:
                    return npos
            else:
                return None  # unbalanced
        pos = npos


_ALLOW_EXT = [False]  # threaded into _parse_ruleset without changing call shape


def parse_stylesheet(text: str, allow_extensions: bool = False):
    """parser.rs:1143-1150; returns list of (selectors, styles)."""
    _ALLOW_EXT[0] = allow_extensions
    pos = 0
    out = []
    while True:
        rs = _parse_ruleset(text, pos)
        if rs is not None:
            selectors, styles, pos = rs
            out.append((selectors, styles))
            continue
        # at-rule?
        p = _skip_ws(text, pos)
        if p < len(text) and text[p] == "@":
            ident = _parse_ident(text, p + 1)
            if ident is not None:
                skipped = _skip_to_end_of_statement(text, ident[1])
                if skipped is not None:
                    pos = skipped
                    continue
        break
    return out, pos


def add_css(rules: list[Ruleset], css: str, allow_extensions: bool = True) -> None:
    """css.rs:485-505 (do_add_css)."""
    parsed, _pos = parse_stylesheet(css, allow_extensions)
    for selectors, styles in parsed:
        if styles:
            for selector in selectors:
                rules.append(Ruleset(selector, list(styles)))


def parse_style_attribute(text: str) -> list[StyleDecl]:
    try:
        styles, _pos = _parse_rules(text, 0)
    except Exception:
        raise CssParseError()
    return styles
