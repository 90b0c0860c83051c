"""Extract golden (html, width, config, expected) tuples from the reference's
inline test corpus (/root/reference/src/tests.rs) into JSON fixtures.

The reference's correctness strategy is golden-string unit tests (153 #[test]
functions, see SURVEY.md §5); those goldens are our byte-identical oracle.
This script parses the Rust source *textually* (literals only — it does not
copy any code, it extracts test DATA).

Usage: python scripts/extract_fixtures.py [--ref /root/reference] [--out tests/fixtures/goldens.json]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

# ---------------------------------------------------------------- Rust lexing


class Cursor:
    def __init__(self, src: str, pos: int = 0):
        self.src = src
        self.pos = pos

    def peek(self, n: int = 1) -> str:
        return self.src[self.pos : self.pos + n]

    def skip_ws_and_comments(self) -> None:
        while self.pos < len(self.src):
            c = self.src[self.pos]
            if c in " \t\r\n":
                self.pos += 1
            elif self.src.startswith("//", self.pos):
                nl = self.src.find("\n", self.pos)
                self.pos = len(self.src) if nl < 0 else nl + 1
            elif self.src.startswith("/*", self.pos):
                end = self.src.find("*/", self.pos + 2)
                self.pos = len(self.src) if end < 0 else end + 2
            else:
                return


ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"', "'": "'", "0": "\0"}


def parse_quoted(cur: Cursor, is_bytes: bool = False) -> str:
    """Parse a normal Rust string body starting at the opening quote.

    In byte strings (b"..."), \\xNN escapes are raw BYTES (typically UTF-8
    encoded text), not code points.
    """
    assert cur.src[cur.pos] == '"'
    cur.pos += 1
    out: list = []  # str pieces and int raw bytes
    def _join():
        buf = bytearray()
        for piece in out:
            if isinstance(piece, int):
                buf.append(piece)
            else:
                buf.extend(piece.encode("utf-8"))
        return buf.decode("utf-8")
    while True:
        c = cur.src[cur.pos]
        if c == '"':
            cur.pos += 1
            return _join()
        if c == "\\":
            nxt = cur.src[cur.pos + 1]
            if nxt == "u":
                # \u{XXXX}
                close = cur.src.index("}", cur.pos)
                out.append(chr(int(cur.src[cur.pos + 3 : close], 16)))
                cur.pos = close + 1
            elif nxt == "x":
                val = int(cur.src[cur.pos + 2 : cur.pos + 4], 16)
                out.append(val if is_bytes else chr(val))
                cur.pos += 4
            elif nxt == "\n":
                # line-continuation: skip newline and leading whitespace
                cur.pos += 2
                while cur.src[cur.pos] in " \t":
                    cur.pos += 1
            else:
                out.append(ESCAPES[nxt])
                cur.pos += 2
        else:
            out.append(c)
            cur.pos += 1


def parse_raw(cur: Cursor) -> str:
    """Parse r"..."/r#"..."# body, cursor at 'r'."""
    assert cur.src[cur.pos] == "r"
    cur.pos += 1
    hashes = 0
    while cur.src[cur.pos] == "#":
        hashes += 1
        cur.pos += 1
    assert cur.src[cur.pos] == '"'
    cur.pos += 1
    terminator = '"' + "#" * hashes
    end = cur.src.index(terminator, cur.pos)
    s = cur.src[cur.pos : end]
    cur.pos = end + len(terminator)
    return s


class Unsupported(Exception):
    pass


BINDINGS: list[tuple[int, str, str]] = []  # (pos, name, value), sorted by pos


def lookup_binding(name: str, pos: int) -> str | None:
    best = None
    for bpos, bname, val in BINDINGS:
        if bpos > pos:
            break
        if bname == name:
            best = val
    return best


def parse_string_expr(cur: Cursor):
    """Parse one string-ish expression argument; return Python str, or raise
    Unsupported for non-literal expressions (format!, repeat chains, vars)."""
    cur.skip_ws_and_comments()
    src, p = cur.src, cur.pos
    if src.startswith("&", p):
        cur.pos += 1
        cur.skip_ws_and_comments()
        p = cur.pos
    im = re.match(r"[A-Za-z_]\w*", src[p:])
    if im and im.group(0) not in ("b", "br", "r"):
        val = lookup_binding(im.group(0), p)
        if val is not None:
            cur.pos = p + im.end()
            s = val
            while True:
                cur.skip_ws_and_comments()
                m = re.match(r"\.(as_bytes|to_string|into)\(\)|\[\.\.\]", cur.src[cur.pos :])
                if not m:
                    break
                cur.pos += m.end()
            return s
        raise Unsupported(f"unresolved identifier {im.group(0)!r} at {p}")
    if src.startswith("br", p) and src[p + 2] in '#"':
        cur.pos += 1  # skip 'b'
        s = parse_raw(cur)
    elif src.startswith('b"', p):
        cur.pos += 1
        s = parse_quoted(cur, is_bytes=True)
    elif src.startswith("r", p) and src[p + 1] in '#"':
        s = parse_raw(cur)
    elif src.startswith('"', p):
        s = parse_quoted(cur)
    else:
        raise Unsupported(f"non-literal string at {p}: {src[p:p+40]!r}")
    # trailing [..] slice / .as_bytes() etc.
    while True:
        cur.skip_ws_and_comments()
        if cur.peek(4) == "[..]":
            cur.pos += 4
        elif cur.peek(1) == ".":
            m = re.match(r"\.(as_bytes|to_string|into)\(\)", cur.src[cur.pos :])
            if not m:
                raise Unsupported(f"method after literal: {cur.src[cur.pos:cur.pos+30]!r}")
            cur.pos += m.end()
        elif cur.peek(1) == "+":
            raise Unsupported("string concatenation")
        else:
            break
    return s


def parse_int(cur: Cursor) -> int:
    cur.skip_ws_and_comments()
    m = re.match(r"-?\d[\d_]*", cur.src[cur.pos :])
    if not m:
        raise Unsupported(f"non-int at {cur.pos}: {cur.src[cur.pos:cur.pos+30]!r}")
    cur.pos += m.end()
    return int(m.group(0).replace("_", ""))


def expect(cur: Cursor, tok: str) -> None:
    cur.skip_ws_and_comments()
    if not cur.src.startswith(tok, cur.pos):
        raise Unsupported(f"expected {tok!r} at {cur.pos}: {cur.src[cur.pos:cur.pos+30]!r}")
    cur.pos += len(tok)


# ------------------------------------------------------------- config closures

# Config-builder methods (src/lib.rs:3105-3260) → fixture config keys.
CONF_METHODS = {
    "max_wrap_width": ("max_wrap_width", "int"),
    "min_wrap_width": ("min_wrap_width", "int"),
    "pad_block_width": ("pad_block_width", "flag"),
    "allow_width_overflow": ("allow_width_overflow", "flag"),
    "raw_mode": ("raw", "bool"),
    "no_table_borders": ("draw_borders_off", "flag"),
    "fence_tables": ("fence_tables", "flag"),
    "no_link_wrapping": ("wrap_links_off", "flag"),
    "link_footnotes": ("link_footnotes", "bool"),
    "unicode_strikeout": ("unicode_strikeout", "bool"),
    "use_doc_css": ("use_doc_css", "flag"),
    "do_decorate": ("do_decorate", "flag"),
}


def parse_conf_closure(cur: Cursor) -> dict:
    """Parse `|conf| conf.m1(a).m2(b)` chains (optionally brace-wrapped)
    with literal args."""
    cur.skip_ws_and_comments()
    m = re.match(r"\|(\w+)\|", cur.src[cur.pos :])
    if not m:
        raise Unsupported("not a simple closure")
    var = m.group(1)
    cur.pos += m.end()
    cur.skip_ws_and_comments()
    braced = False
    if cur.peek(1) == "{":
        braced = True
        cur.pos += 1
        cur.skip_ws_and_comments()
    expect(cur, var)
    conf: dict = {}
    while True:
        cur.skip_ws_and_comments()
        if cur.peek(1) != ".":
            break
        cur.pos += 1
        m = re.match(r"(\w+)\(", cur.src[cur.pos :])
        if not m:
            raise Unsupported(f"odd method at {cur.pos}")
        name = m.group(1)
        cur.pos += m.end()
        cur.skip_ws_and_comments()
        if name in ("add_css", "add_agent_css"):
            css = parse_string_expr(cur)
            conf.setdefault(name, []).append(css)
            cur.skip_ws_and_comments()
            if cur.peek(1) == ",":
                cur.pos += 1
            expect(cur, ")")
            cur.skip_ws_and_comments()
            # .unwrap()
            if cur.src.startswith(".unwrap()", cur.pos):
                cur.pos += len(".unwrap()")
            continue
        if name == "empty_img_mode":
            cur.skip_ws_and_comments()
            mm = re.match(
                r"config::ImageRenderMode::(\w+)(\(\s*\"([^\"]*)\"\s*\))?",
                cur.src[cur.pos :],
            )
            if not mm:
                raise Unsupported("non-literal image mode")
            cur.pos += mm.end()
            mode = {
                "IgnoreEmpty": "ignore_empty",
                "ShowAlways": "show_always",
                "Replace": "replace",
                "Filename": "filename",
            }[mm.group(1)]
            conf["image_mode"] = mode
            if mm.group(3) is not None:
                conf["image_replace"] = mm.group(3)
            expect(cur, ")")
            continue
        if name == "xml_mode":
            cur.skip_ws_and_comments()
            mm = re.match(r"(config::)?XmlMode::(\w+)", cur.src[cur.pos :])
            if not mm:
                raise Unsupported("non-literal xml mode")
            cur.pos += mm.end()
            conf["xml"] = {"Html": False, "Xhtml": True, "Auto": None}[mm.group(2)]
            expect(cur, ")")
            continue
        if name not in CONF_METHODS:
            raise Unsupported(f"unknown config method {name}")
        key, kind = CONF_METHODS[name]
        if kind == "int":
            conf[key] = parse_int(cur)
        elif kind == "bool":
            cur.skip_ws_and_comments()
            if cur.src.startswith("true", cur.pos):
                conf[key] = True
                cur.pos += 4
            elif cur.src.startswith("false", cur.pos):
                conf[key] = False
                cur.pos += 5
            else:
                raise Unsupported("non-literal bool")
        else:  # flag
            conf[key] = True
        expect(cur, ")")
    if braced:
        cur.skip_ws_and_comments()
        expect(cur, "}")
    # normalize
    if conf.pop("draw_borders_off", False):
        conf["draw_borders"] = False
    if conf.pop("wrap_links_off", False):
        conf["wrap_links"] = False
    return conf


# ------------------------------------------------------------------ harnesses


def extract(src: str) -> tuple[list[dict], list[dict]]:
    fixtures: list[dict] = []
    skipped: list[dict] = []

    # pre-pass: resolve `let NAME = <literal>;` / `const NAME: ... = <literal>;`
    BINDINGS.clear()
    for bm in re.finditer(r"\b(?:let|const|static)\s+(\w+)(?:\s*:[^=]+?)?\s*=\s*", src):
        cur = Cursor(src, bm.end())
        try:
            val = parse_string_expr(cur)
        except (Unsupported, AssertionError, IndexError, ValueError, KeyError):
            continue
        cur.skip_ws_and_comments()
        if cur.peek(1) == ";":
            BINDINGS.append((bm.start(), bm.group(1), val))
    BINDINGS.sort(key=lambda t: t[0])

    # test function name context: map positions → enclosing fn name
    fn_spans = []
    for m in re.finditer(r"fn (test_\w+|frag_\w+|\w+)\s*\(\)\s*\{", src):
        fn_spans.append((m.start(), m.group(1)))

    def fn_at(pos: int) -> str:
        name = "?"
        for start, n in fn_spans:
            if start <= pos:
                name = n
            else:
                break
        return name

    harnesses = [
        "test_html_conf_dec",
        "test_html_coloured_conf",
        "test_html_err_conf",
        "test_html_maxwrap",
        "test_html_coloured",
        "test_html_style",
        "test_html_decorator",
        "test_html_conf",
        "test_html_css",
        "test_html_err",
        "test_html",
        "test_xml",
    ]
    pat = re.compile(r"\b(" + "|".join(harnesses) + r")\s*\(")
    counters: dict[str, int] = {}
    for m in pat.finditer(src):
        h = m.group(1)
        # skip the definitions themselves
        before = src[: m.start()].rstrip()
        if before.endswith("fn"):
            continue
        fname = fn_at(m.start())
        counters[fname] = counters.get(fname, 0) + 1
        case_id = fname if counters[fname] == 1 else f"{fname}_{counters[fname]}"
        cur = Cursor(src, m.end())
        entry: dict = {"name": case_id, "harness": h, "config": {}}
        try:
            if h in ("test_html", "test_html_css", "test_html_coloured", "test_xml"):
                entry["html"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["expected"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["width"] = parse_int(cur)
                if h == "test_html_css":
                    entry["config"]["use_doc_css"] = True
                if h == "test_html_coloured":
                    entry["config"]["use_doc_css"] = True
                    entry["config"]["decorator"] = "rich"
                    entry["config"]["colour_map"] = "test"
                if h == "test_xml":
                    entry["config"]["xml"] = True
            elif h == "test_html_maxwrap":
                entry["html"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["expected"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["width"] = parse_int(cur)
                expect(cur, ",")
                entry["config"]["max_wrap_width"] = parse_int(cur)
            elif h == "test_html_style":
                entry["html"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["config"]["add_css"] = [parse_string_expr(cur)]
                expect(cur, ",")
                entry["expected"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["width"] = parse_int(cur)
            elif h == "test_html_err":
                entry["html"] = parse_string_expr(cur)
                expect(cur, ",")
                cur.skip_ws_and_comments()
                em = re.match(r"Error::(\w+)", cur.src[cur.pos :])
                if not em:
                    raise Unsupported("non-literal error")
                entry["expected_error"] = em.group(1)
                cur.pos += em.end()
                expect(cur, ",")
                entry["width"] = parse_int(cur)
            elif h == "test_html_err_conf":
                entry["html"] = parse_string_expr(cur)
                expect(cur, ",")
                cur.skip_ws_and_comments()
                em = re.match(r"Error::(\w+)", cur.src[cur.pos :])
                if not em:
                    raise Unsupported("non-literal error")
                entry["expected_error"] = em.group(1)
                cur.pos += em.end()
                expect(cur, ",")
                entry["width"] = parse_int(cur)
                expect(cur, ",")
                entry["config"].update(parse_conf_closure(cur))
            elif h == "test_html_conf":
                entry["html"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["expected"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["width"] = parse_int(cur)
                expect(cur, ",")
                entry["config"].update(parse_conf_closure(cur))
            elif h == "test_html_decorator":
                entry["html"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["expected"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["width"] = parse_int(cur)
                expect(cur, ",")
                cur.skip_ws_and_comments()
                dm = re.match(r"(\w+)Decorator", cur.src[cur.pos :])
                if not dm:
                    raise Unsupported("non-literal decorator")
                entry["config"]["decorator"] = dm.group(1).lower()
            elif h == "test_html_conf_dec":
                cur.skip_ws_and_comments()
                dm = re.match(r"(\w+)Decorator(::new\(\)|\s*\{\s*\})?", cur.src[cur.pos :])
                if not dm:
                    raise Unsupported("non-literal decorator")
                entry["config"]["decorator"] = dm.group(1).lower()
                cur.pos += dm.end()
                expect(cur, ",")
                entry["html"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["expected"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["width"] = parse_int(cur)
                expect(cur, ",")
                entry["config"].update(parse_conf_closure(cur))
            elif h == "test_html_coloured_conf":
                entry["html"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["expected"] = parse_string_expr(cur)
                expect(cur, ",")
                entry["width"] = parse_int(cur)
                expect(cur, ",")
                entry["config"].update(parse_conf_closure(cur))
                entry["config"]["use_doc_css"] = True
                entry["config"]["decorator"] = "rich"
                entry["config"]["colour_map"] = "test"
            fixtures.append(entry)
        except Unsupported as e:
            skipped.append({"name": case_id, "harness": h, "reason": str(e)})
    return fixtures, skipped


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parents[1] / "tests/fixtures/goldens.json"))
    args = ap.parse_args()
    src = (Path(args.ref) / "src/tests.rs").read_text()
    fixtures, skipped = extract(src)
    out = {"fixtures": fixtures, "skipped": skipped}
    Path(args.out).write_text(json.dumps(out, indent=1, ensure_ascii=False))
    print(f"extracted {len(fixtures)} fixtures, skipped {len(skipped)}", file=sys.stderr)
    for s in skipped:
        print(f"  SKIP {s['name']} ({s['harness']}): {s['reason'][:80]}", file=sys.stderr)


if __name__ == "__main__":
    main()
