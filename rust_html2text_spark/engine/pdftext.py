"""PDF text extraction: fonts, content-stream interpretation, layout.

Companion to pdfparse.py (file structure) — this module turns decoded
page content streams into reading-order text, re-derived from the public
PDF 1.7 spec (ISO 32000-1 §9, text) with the layout heuristics every
public extractor family (pdftotext/pdfminer-style) documents:

- full text-state machine: Tf/Tc/Tw/Tz/TL/Ts/Td/TD/Tm/T*/Tj/TJ/'/",
  q/Q graphics-state stack and cm CTM composition, so every glyph gets a
  real device-space position,
- glyph-advance tracking ((w/1000·Tfs + Tc + Tw)·Th per the spec's
  advance formula), so runs know where they *end* — word breaks between
  separate show operations are decided by actual gap width, not guesses,
- simple fonts (Type1/TrueType) with Standard/WinAnsi/MacRoman base
  encodings plus /Differences, /Widths, and /ToUnicode CMaps
  (bfchar + bfrange, including array destinations),
- composite Type0/Identity-H CID fonts with /W width lists and /DW,
- layout assembly: per-page baseline clustering (tolerance scaled by
  font size), left-to-right ordering inside a line, top-to-bottom line
  order, gap-scaled space insertion, form-feed page separator.

Inline images (BI..ID..EI) are skipped; Tr 3 (invisible text — the OCR
layer trick) is *kept*, matching pdftotext's default, because for a
training-data pipeline the OCR text layer is usually the whole point.
"""

from __future__ import annotations

import re

from .pdfparse import (
    Lexer,
    Name,
    PdfDocument,
    PdfError,
    Stream,
    decode_stream,
    parse_pdf,
)

__all__ = ["extract_pdf_text", "extract_pdf_ex", "PdfError"]


# ---------------------------------------------------------------------------
# Encodings
# ---------------------------------------------------------------------------

# StandardEncoding differs from ASCII only outside the printable range
# plus a few specials; this is the printable subset a text extractor
# needs (full table in ISO 32000-1 Annex D).
_STANDARD_SPECIALS = {
    0x27: "’",  # quoteright
    0x60: "‘",  # quoteleft
    0xA1: "¡",
    0xA2: "¢",
    0xA3: "£",
    0xA4: "⁄",
    0xA5: "¥",
    0xA7: "§",
    0xA8: "¤",
    0xAA: "“",
    0xB4: "·",
    0xB5: "—",
    0xBA: "”",
    0xBF: "¿",
}

# Minimal Adobe-glyph-list subset for /Differences (names not covered
# here fall through the uniXXXX / uXXXX patterns or are dropped).
_GLYPH_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "fi": "ﬁ", "fl": "ﬂ",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "germandbls": "ß", "eacute": "é", "egrave": "è",
    "agrave": "à", "ccedilla": "ç", "ntilde": "ñ",
    "aacute": "á", "iacute": "í", "oacute": "ó",
    "uacute": "ú", "euro": "€", "sterling": "£",
    "degree": "°", "copyright": "©", "registered": "®",
}

_UNI_NAME_RE = re.compile(r"^uni([0-9A-Fa-f]{4,6})$|^u([0-9A-Fa-f]{4,6})$")


def _glyph_to_char(name: str) -> str | None:
    if len(name) == 1:
        return name
    got = _GLYPH_NAMES.get(name)
    if got is not None:
        return got
    m = _UNI_NAME_RE.match(name)
    if m:
        try:
            return chr(int(m.group(1) or m.group(2), 16))
        except (ValueError, OverflowError):
            return None
    return None


_BASE_ENCODING_CACHE: dict[str, dict[int, str]] = {}


def _base_encoding_map(name: str) -> dict[int, str]:
    got = _BASE_ENCODING_CACHE.get(name)
    if got is not None:
        return dict(got)  # callers mutate (via /Differences); hand a copy
    out: dict[int, str] = {}
    if name == "WinAnsiEncoding":
        for code in range(32, 256):
            try:
                ch = bytes([code]).decode("cp1252")
            except UnicodeDecodeError:
                continue
            out[code] = ch
    elif name == "MacRomanEncoding":
        for code in range(32, 256):
            try:
                out[code] = bytes([code]).decode("mac_roman")
            except UnicodeDecodeError:
                continue
    else:  # StandardEncoding (and the fallback for unknown names)
        for code in range(32, 127):
            out[code] = chr(code)
        out.update(_STANDARD_SPECIALS)
    _BASE_ENCODING_CACHE[name] = out
    return dict(out)


# ---------------------------------------------------------------------------
# ToUnicode CMaps
# ---------------------------------------------------------------------------

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_EI_RE = re.compile(rb"\sEI(?=[\s\x00]|$)")


def _hex_to_int(tok: bytes) -> int:
    return int(tok, 16)


def _utf16be(code_hex: bytes) -> str:
    raw = bytes.fromhex(code_hex.decode("ascii"))
    try:
        return raw.decode("utf-16-be")
    except UnicodeDecodeError:
        return raw.decode("utf-16-be", "replace")


def parse_tounicode(data: bytes) -> dict[int, str]:
    """Parse the bfchar/bfrange sections of a ToUnicode CMap stream."""
    out: dict[int, str] = {}
    hexstr = rb"<([0-9A-Fa-f]+)>"
    pair = re.compile(hexstr + rb"\s*" + hexstr)
    for m in _BFCHAR_RE.finditer(data):
        for src, dst in pair.findall(m.group(1)):
            out[_hex_to_int(src)] = _utf16be(dst)
    triple = re.compile(hexstr + rb"\s*" + hexstr + rb"\s*(?:" + hexstr + rb"|\[(.*?)\])", re.DOTALL)
    for m in _BFRANGE_RE.finditer(data):
        for lo, hi, dst, arr in triple.findall(m.group(1)):
            lo_i, hi_i = _hex_to_int(lo), _hex_to_int(hi)
            if hi_i - lo_i > 0x10000:  # hostile range bomb
                hi_i = lo_i + 0x10000
            if arr:
                dsts = re.findall(hexstr, arr)
                for k, d in enumerate(dsts[: hi_i - lo_i + 1]):
                    out[lo_i + k] = _utf16be(d)
            elif dst:
                base_raw = bytes.fromhex(dst.decode("ascii"))
                base = int.from_bytes(base_raw, "big")
                width = max(len(base_raw), 2)
                mask = (1 << (8 * width)) - 1  # hostile overflow wraps
                for k in range(hi_i - lo_i + 1):
                    out[lo_i + k] = (
                        ((base + k) & mask).to_bytes(width, "big").decode(
                            "utf-16-be", "replace"
                        )
                    )
    return out


# ---------------------------------------------------------------------------
# Fonts
# ---------------------------------------------------------------------------


class Font:
    """Decoded font state: code iteration, unicode mapping, widths."""

    __slots__ = (
        "is_cid", "widths", "default_width", "tounicode", "encoding", "_fast",
    )

    def __init__(self) -> None:
        self.is_cid = False
        self.widths: dict[int, float] = {}
        self.default_width = 500.0
        self.tounicode: dict[int, str] | None = None
        self.encoding: dict[int, str] = {}
        self._fast = None

    def fast_tables(self):
        """(decoded, base_width) 256-entry tables for simple (1-byte)
        fonts — one list index per code in the show loop instead of
        dict probes + a division (identical values: base_width is the
        same width_of(code)/1000.0 the slow path computes)."""
        t = self._fast
        if t is None:
            # layered build, C-level dict iteration instead of 256
            # decode_code calls (same precedence as decode_code for a
            # non-CID font: tounicode > encoding > printable ASCII > "")
            dec = [""] * 256
            for c in range(32, 127):
                dec[c] = chr(c)
            for c, ch in self.encoding.items():
                if ch is not None and 0 <= c < 256:
                    dec[c] = ch
            if self.tounicode is not None:
                for c, ch in self.tounicode.items():
                    if ch is not None and 0 <= c < 256:
                        dec[c] = ch
            dw = self.default_width / 1000.0
            bw = [dw] * 256
            for c, w in self.widths.items():
                if 0 <= c < 256:
                    bw[c] = w / 1000.0
            t = self._fast = (dec, bw)
        return t

    @classmethod
    def load(cls, doc: PdfDocument, font_dict: dict) -> "Font":
        f = cls()
        r = doc.resolve
        subtype = str(r(font_dict.get("Subtype", "")))
        tu = r(font_dict.get("ToUnicode"))
        if isinstance(tu, Stream):
            try:
                f.tounicode = parse_tounicode(decode_stream(tu, r))
            except PdfError:
                f.tounicode = None
        if subtype == "Type0":
            f.is_cid = True
            f.default_width = 1000.0
            desc = r(font_dict.get("DescendantFonts"))
            if isinstance(desc, list) and desc:
                d0 = r(desc[0])
                if isinstance(d0, dict):
                    dw = r(d0.get("DW"))
                    if isinstance(dw, (int, float)):
                        f.default_width = float(dw)
                    f._load_cid_widths(r(d0.get("W")), r)
            return f
        # simple font
        enc = r(font_dict.get("Encoding"))
        base = "StandardEncoding"
        diffs = None
        if isinstance(enc, Name):
            base = str(enc)
        elif isinstance(enc, dict):
            be = r(enc.get("BaseEncoding"))
            if be is not None:
                base = str(be)
            diffs = r(enc.get("Differences"))
        f.encoding = _base_encoding_map(base)
        if isinstance(diffs, list):
            code = 0
            for item in diffs:
                item = r(item)
                if isinstance(item, (int, float)):
                    code = int(item)
                elif isinstance(item, Name):
                    ch = _glyph_to_char(str(item))
                    if ch is not None:
                        f.encoding[code] = ch
                    code += 1
        first = r(font_dict.get("FirstChar"))
        widths = r(font_dict.get("Widths"))
        if isinstance(first, (int, float)) and isinstance(widths, list):
            for k, w in enumerate(widths):
                w = r(w)
                if isinstance(w, (int, float)):
                    f.widths[int(first) + k] = float(w)
        fd = r(font_dict.get("FontDescriptor"))
        if isinstance(fd, dict):
            mw = r(fd.get("MissingWidth"))
            if isinstance(mw, (int, float)):
                f.default_width = float(mw) or f.default_width
        return f

    def _load_cid_widths(self, w_array, r) -> None:
        """CID /W list: `c [w1 w2 ...]` or `c1 c2 w` runs, mixed."""
        if not isinstance(w_array, list):
            return
        i = 0
        n = len(w_array)
        while i < n:
            a = r(w_array[i])
            if not isinstance(a, (int, float)):
                i += 1
                continue
            if i + 1 < n and isinstance(r(w_array[i + 1]), list):
                for k, w in enumerate(r(w_array[i + 1])):
                    w = r(w)
                    if isinstance(w, (int, float)):
                        self.widths[int(a) + k] = float(w)
                i += 2
            elif i + 2 < n:
                b, w = r(w_array[i + 1]), r(w_array[i + 2])
                if isinstance(b, (int, float)) and isinstance(w, (int, float)):
                    b = int(b)
                    if b - int(a) > 0x10000:
                        b = int(a) + 0x10000
                    for c in range(int(a), b + 1):
                        self.widths[c] = float(w)
                i += 3
            else:
                break

    def iter_codes(self, raw: bytes):
        if self.is_cid:  # Identity-H: 2-byte big-endian codes
            for k in range(0, len(raw) - 1, 2):
                yield (raw[k] << 8) | raw[k + 1]
            if len(raw) % 2:
                yield raw[-1]
        else:
            yield from raw

    def decode_code(self, code: int) -> str:
        if self.tounicode is not None:
            got = self.tounicode.get(code)
            if got is not None:
                return got
        if self.is_cid:
            # Identity CID without ToUnicode: code == unicode is the
            # best public fallback (true for the common UCS-2 orderings)
            try:
                return chr(code)
            except ValueError:
                return "�"
        got = self.encoding.get(code)
        if got is not None:
            return got
        if 32 <= code < 127:
            return chr(code)
        return ""  # unmapped control/symbol glyph

    def width_of(self, code: int) -> float:
        return self.widths.get(code, self.default_width)


_DEFAULT_FONT = Font()
_DEFAULT_FONT.encoding = _base_encoding_map("StandardEncoding")


# ---------------------------------------------------------------------------
# Content-stream interpreter
# ---------------------------------------------------------------------------


def _mat_mul(m1, m2):
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


_IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


class _Run:
    """One shown text fragment at a device position."""

    __slots__ = ("x", "y", "end_x", "size", "text")

    def __init__(self, x: float, y: float, size: float) -> None:
        self.x = x
        self.y = y
        self.end_x = x
        self.size = size
        self.text: list[str] = []


class _GState:
    __slots__ = ("ctm", "font", "size", "char_sp", "word_sp", "hscale", "leading", "rise")

    def __init__(self) -> None:
        self.ctm = _IDENTITY
        self.font = _DEFAULT_FONT
        self.size = 0.0
        self.char_sp = 0.0
        self.word_sp = 0.0
        self.hscale = 1.0
        self.leading = 0.0
        self.rise = 0.0

    def clone(self) -> "_GState":
        g = _GState.__new__(_GState)
        for s in self.__slots__:
            setattr(g, s, getattr(self, s))
        return g


_MAX_RUNS_PER_PAGE = 200_000
# Form XObjects may nest (ISO 32000-1 §8.10); real documents rarely go
# past 2-3 levels — the guard stops hostile deep/self-referential chains.
_MAX_FORM_DEPTH = 8
# Whole-document link-annotation bound: the per-page cap alone still lets
# a hostile 10k-page PDF emit ~10M tuples (GBs) from one row.
_MAX_LINKS_PER_DOC = 100_000


def interpret_page(
    doc: PdfDocument, page: dict, font_cache: dict | None = None
) -> list[_Run]:
    """Execute a page's content stream, returning positioned text runs.
    `font_cache` (keyed by resolved font-dict identity) is shared across
    a document's pages — inherited /Resources resolve to the same dicts,
    so each font loads once per document, not once per page."""
    content = doc.page_content(page)
    resources = doc.resolve(page.get("Resources")) or {}
    if font_cache is None:
        font_cache = {}

    runs: list[_Run] = []
    g = _GState()
    stack: list[_GState] = []
    tm = _IDENTITY  # text matrix
    tlm = _IDENTITY  # text line matrix
    in_text = False
    steps = 0
    max_steps = 4_000_000

    def num(v, default=0.0) -> float:
        return float(v) if isinstance(v, (int, float)) else default

    def show(raw: bytes) -> None:
        nonlocal tm
        if not isinstance(raw, bytes) or g.size == 0 and not raw:
            return
        rm = _mat_mul(tm, g.ctm)
        scale = (rm[0] ** 2 + rm[1] ** 2) ** 0.5  # device text scale
        run = _Run(rm[4], rm[5], g.size * scale or 1.0)
        advance = 0.0  # text-space advance accumulated across the string
        font = g.font
        if not font.is_cid:
            # simple 1-byte font: table lookups, same arithmetic order
            dec, bw = font.fast_tables()
            size = g.size
            char_sp = g.char_sp
            word_sp = g.word_sp
            hscale = g.hscale
            text_append = run.text.append
            for code in raw:
                text_append(dec[code])
                w = bw[code] * size + char_sp
                if code == 32:
                    w += word_sp
                advance += w * hscale
        else:
            # CID fast path (r07): same per-code semantics as
            # iter_codes + decode_code + width_of, with the three
            # per-glyph Python calls inlined (codes are ≤ 0xFFFF, so
            # the chr() fallback can never raise).  Arithmetic order is
            # unchanged — glyph positions stay bit-equal.
            tun = font.tounicode
            wget = font.widths.get
            dw = font.default_width
            size = g.size
            char_sp = g.char_sp
            hscale = g.hscale
            text_append = run.text.append
            nraw = len(raw)
            codes = [
                (raw[k] << 8) | raw[k + 1] for k in range(0, nraw - 1, 2)
            ]
            if nraw % 2:
                codes.append(raw[-1])
            for code in codes:
                ch = None if tun is None else tun.get(code)
                if ch is None:
                    ch = chr(code)
                text_append(ch)
                w = wget(code, dw) / 1000.0 * size + char_sp
                advance += w * hscale
        tm = _mat_mul((1, 0, 0, 1, advance, 0), tm)
        rm_end = _mat_mul(tm, g.ctm)
        run.end_x = rm_end[4]
        if run.text and len(runs) < _MAX_RUNS_PER_PAGE:
            runs.append(run)

    def next_line(tx: float, ty: float) -> None:
        nonlocal tm, tlm
        tlm = _mat_mul((1, 0, 0, 1, tx, ty), tlm)
        tm = tlm

    def exec_stream(content: bytes, resources: dict, depth: int, active: frozenset) -> None:
        """Execute one content stream against the shared graphics/text state.
        Called once for the page stream and recursively for /Subtype /Form
        XObjects (Do operator) — text inside Form XObjects (stamps, headers,
        generated layouts) is real content the pdftotext family emits, so
        dropping Do would silently lose it.  `active` carries the ids of
        streams currently on the exec stack (self-reference guard);
        `steps` is a document-wide budget shared across recursion."""
        nonlocal g, tm, tlm, in_text, steps
        font_dicts = doc.resolve(resources.get("Font")) or {}
        xobjects = doc.resolve(resources.get("XObject")) or {}
        fonts: dict[str, Font] = {}

        def get_font(name: str) -> Font:
            got = fonts.get(name)
            if got is None:
                fd = doc.resolve(font_dicts.get(name)) if isinstance(font_dicts, dict) else None
                if isinstance(fd, dict):
                    got = font_cache.get(id(fd))
                    if got is None:
                        got = Font.load(doc, fd)
                        font_cache[id(fd)] = got
                else:
                    got = _DEFAULT_FONT
                fonts[name] = got
            return got

        def do_xobject(name: str) -> None:
            nonlocal g
            if depth >= _MAX_FORM_DEPTH or not isinstance(xobjects, dict):
                return
            xo = doc.resolve(xobjects.get(name))
            if not isinstance(xo, Stream) or id(xo) in active:
                return
            d = doc.resolve(xo.dict.get("Subtype"))
            if str(d) != "Form":
                return  # images and other XObjects paint no text
            inner = decode_stream(xo, doc.resolve)
            # ISO 32000-1 §8.10.1: executing a form implicitly saves the
            # graphics state, composes /Matrix onto the CTM, runs the
            # form's stream with its own /Resources (inheriting the
            # parent's when absent), then restores.
            saved_g, saved_depth = g.clone(), len(stack)
            mat = doc.resolve(xo.dict.get("Matrix"))
            if isinstance(mat, list) and len(mat) == 6:
                g.ctm = _mat_mul(tuple(num(v) for v in mat), g.ctm)
            sub_res = doc.resolve(xo.dict.get("Resources"))
            exec_stream(
                inner,
                sub_res if isinstance(sub_res, dict) else resources,
                depth + 1,
                active | {id(xo)},
            )
            del stack[saved_depth:]  # unbalanced q inside the form
            g = saved_g

        operands: list = []
        lex = Lexer(content)
        while steps < max_steps:
            steps += 1
            try:
                tok = lex.next_token()
            except PdfError:
                break
            if tok is None:
                break
            if not (isinstance(tok, tuple) and len(tok) == 2 and tok[0] == "op"):
                operands.append(tok)
                if len(operands) > 64:
                    del operands[:-16]
                continue
            op = tok[1]
            try:
                if op == b"q":
                    stack.append(g.clone())
                elif op == b"Q":
                    if stack:
                        g = stack.pop()
                elif op == b"cm" and len(operands) >= 6:
                    g.ctm = _mat_mul(tuple(num(v) for v in operands[-6:]), g.ctm)
                elif op == b"BT":
                    in_text = True
                    tm = tlm = _IDENTITY
                elif op == b"ET":
                    in_text = False
                elif op == b"Tf" and len(operands) >= 2:
                    if isinstance(operands[-2], Name):
                        g.font = get_font(str(operands[-2]))
                    g.size = num(operands[-1])
                elif op == b"Tc" and operands:
                    g.char_sp = num(operands[-1])
                elif op == b"Tw" and operands:
                    g.word_sp = num(operands[-1])
                elif op == b"Tz" and operands:
                    g.hscale = num(operands[-1], 100.0) / 100.0
                elif op == b"TL" and operands:
                    g.leading = num(operands[-1])
                elif op == b"Ts" and operands:
                    g.rise = num(operands[-1])
                elif op == b"Td" and len(operands) >= 2:
                    next_line(num(operands[-2]), num(operands[-1]))
                elif op == b"TD" and len(operands) >= 2:
                    g.leading = -num(operands[-1])
                    next_line(num(operands[-2]), num(operands[-1]))
                elif op == b"Tm" and len(operands) >= 6:
                    tlm = tuple(num(v) for v in operands[-6:])
                    tm = tlm
                elif op == b"T*":
                    next_line(0.0, -g.leading)
                elif op == b"Tj" and operands:
                    if in_text:
                        show(operands[-1])
                elif op == b"'" and operands:
                    next_line(0.0, -g.leading)
                    if in_text:
                        show(operands[-1])
                elif op == b'"' and len(operands) >= 3:
                    g.word_sp = num(operands[-3])
                    g.char_sp = num(operands[-2])
                    next_line(0.0, -g.leading)
                    if in_text:
                        show(operands[-1])
                elif op == b"TJ" and operands and isinstance(operands[-1], list):
                    if in_text:
                        tm_adj = 0.0
                        for el in operands[-1]:
                            if isinstance(el, bytes):
                                show(el)
                            elif isinstance(el, (int, float)):
                                tx = -float(el) / 1000.0 * g.size * g.hscale
                                tm = _mat_mul((1, 0, 0, 1, tx, 0), tm)
                                tm_adj += tx
                elif op == b"Do" and operands and isinstance(operands[-1], Name):
                    do_xobject(str(operands[-1]))
                elif op == b"BI":
                    # inline image: skip to `EI` delimited by whitespace.
                    # search(content, lex.pos) scans in place — slicing
                    # content[lex.pos:] would copy the remaining stream per
                    # BI op, letting a hostile stream force quadratic memcpy.
                    m = _EI_RE.search(content, lex.pos)
                    lex.pos = m.end() if m else len(content)
                # all other painting/path/colour operators: no text effect
            except (PdfError, ValueError, TypeError, IndexError):
                pass  # hostile operand shapes: drop the op, keep going
            operands.clear()

    exec_stream(content, resources, 0, frozenset())
    return runs


# ---------------------------------------------------------------------------
# Layout: runs -> text
# ---------------------------------------------------------------------------


def runs_to_text(runs: list[_Run]) -> str:
    """Assemble reading-order text: cluster runs into baselines
    (tolerance scaled by font size), order lines top-to-bottom, runs
    left-to-right, and insert spaces where the device-space gap between
    a run and its predecessor exceeds a size-scaled threshold."""
    if not runs:
        return ""
    runs = sorted(runs, key=lambda r: (-r.y, r.x))
    lines: list[tuple[float, list[_Run]]] = []
    for run in runs:
        tol = max(1.0, 0.4 * run.size)
        if lines and abs(lines[-1][0] - run.y) <= tol:
            lines[-1][1].append(run)
        else:
            lines.append((run.y, [run]))
    out_lines: list[str] = []
    for _y, line_runs in lines:
        line_runs.sort(key=lambda r: r.x)
        parts: list[str] = []
        prev_end: float | None = None
        for run in line_runs:
            text = "".join(run.text)
            if not text:
                continue
            if prev_end is not None:
                gap = run.x - prev_end
                if gap > max(0.75, 0.18 * run.size) and parts and not (
                    parts[-1].endswith(" ") or text.startswith(" ")
                ):
                    parts.append(" ")
            parts.append(text)
            prev_end = max(run.end_x, run.x)
        line = "".join(parts).rstrip()
        out_lines.append(line)
    # trim trailing blank lines but keep interior blanks out (baseline
    # clustering already merges; PDF has no semantic blank lines)
    return "\n".join(s for s in out_lines if s)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _decode_pdf_string(val) -> str | None:
    if isinstance(val, bytes):
        if val[:2] == b"\xfe\xff":
            return val[2:].decode("utf-16-be", "replace")
        return val.decode("latin-1")
    if isinstance(val, str):
        return val
    return None


def pdf_links_from_doc(doc: PdfDocument, pages: list[dict]) -> list[tuple[int, int, str]]:
    """URI link annotations in page order: (page_index, ordinal, uri).
    Crawled PDFs carry their outbound edges as /Annots Link→/A /URI
    actions, not as text — this is the PDF half of the crawl link graph
    (the HTML half is extract.links_from_node)."""
    out: list[tuple[int, int, str]] = []
    for page_idx, page in enumerate(pages):
        if len(out) >= _MAX_LINKS_PER_DOC:
            break  # per-page cap alone still allows pages×1000 tuples
        annots = doc.resolve(page.get("Annots"))
        if not isinstance(annots, list):
            continue
        for annot in annots[:1000]:  # hostile annot-bomb bound
            annot = doc.resolve(annot)
            if not isinstance(annot, dict):
                continue
            if str(doc.resolve(annot.get("Subtype"))) != "Link":
                continue
            action = doc.resolve(annot.get("A"))
            if not isinstance(action, dict) or str(doc.resolve(action.get("S"))) != "URI":
                continue
            uri = _decode_pdf_string(doc.resolve(action.get("URI")))
            if uri:
                out.append((page_idx, len(out), uri))
    return out


def extract_pdf_ex(data: bytes, page_sep: str = "\f") -> dict:
    """Parse + extract: {text, n_pages, pdf_version}.  Raises PdfError on
    structurally unusable input (the Spark operator maps that to an
    error row)."""
    doc = parse_pdf(data)
    pages = doc.pages()
    page_texts = []
    font_cache: dict = {}
    for page in pages:
        try:
            page_texts.append(runs_to_text(interpret_page(doc, page, font_cache)))
        except (PdfError, RecursionError):
            page_texts.append("")
    m = re.search(rb"%PDF-(\d+\.\d+)", data[:1024])
    info = doc.info()
    return {
        "text": page_sep.join(page_texts),
        "n_pages": len(pages),
        "pdf_version": m.group(1).decode("ascii") if m else None,
        "title": info.get("Title"),
        "author": info.get("Author"),
        "links": pdf_links_from_doc(doc, pages),
    }


def extract_pdf_text(data: bytes, page_sep: str = "\f") -> str:
    return extract_pdf_ex(data, page_sep)["text"]
