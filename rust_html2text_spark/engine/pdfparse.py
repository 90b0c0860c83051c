"""PDF document-structure parser (pure stdlib).

The extraction tier's north rule names "PDF/layout parse" alongside the
HTML boilerplate strip; the reference engine is HTML-only, so this module
is re-derived from the public PDF 1.7 specification (ISO 32000-1) rather
than from any reference code.  It covers what a crawl-scale text
extractor needs from the *file structure* layer:

- the object syntax (numbers, strings, hex strings, names with #xx
  escapes, arrays, dictionaries, booleans, null, indirect references,
  streams),
- both cross-reference flavours — classic ``xref`` tables and PDF 1.5+
  cross-reference *streams* — including incremental-update /Prev chains
  and hybrid /XRefStm files, with newest-definition-wins semantics,
- compressed objects inside /ObjStm object streams,
- stream filters: FlateDecode (with TIFF and PNG predictors),
  ASCIIHexDecode, ASCII85Decode, RunLengthDecode and LZWDecode (with
  EarlyChange), which is the full set a text extractor must *decode*
  (image-only filters like DCTDecode never hold content streams),
- a last-resort brute scan that rebuilds the object table from ``N G
  obj`` markers when the xref is missing or lies — crawled PDFs are
  routinely truncated or rewritten by broken generators.

Everything raises ``PdfError`` (a ValueError) on malformed input; the
Spark operator maps that to an error row, never a task failure.
"""

from __future__ import annotations

import re
import zlib

__all__ = [
    "PdfError",
    "Name",
    "Ref",
    "Stream",
    "PdfDocument",
    "Lexer",
    "parse_pdf",
    "decode_stream",
]

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMITERS = b"()<>[]{}/%"

# lexer fast paths (r07): one C-level regex step for the common shapes
_WS_OR_COMMENT_RE = re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)+")
# regular name chars: not whitespace, not a delimiter, not the '#' escape
_NAME_RUN_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%#]*")


class PdfError(ValueError):
    """Structurally unusable PDF input."""


class Name(str):
    """A PDF name object (/Foo) — distinct from a text string."""

    __slots__ = ()


class Ref:
    """Indirect reference `num gen R`."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int) -> None:
        self.num = num
        self.gen = gen

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Ref({self.num},{self.gen})"

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Ref) and other.num == self.num and other.gen == self.gen
        )

    def __hash__(self) -> int:
        return hash((self.num, self.gen))


class Stream:
    """A stream object: its dictionary plus the raw (encoded) bytes."""

    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes) -> None:
        self.dict = d
        self.raw = raw

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Stream({self.dict!r}, {len(self.raw)} bytes)"


_NUMBER_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")

# shared interned Name objects for the escape-free fast path (bounded)
_NAME_CACHE: dict[bytes, "Name"] = {}


class Lexer:
    """Tokenizer/parser over a bytes buffer.  One instance parses both
    file-structure objects and content streams (the grammar is shared;
    content streams simply add operator keywords, which `parse_object`
    surfaces as `Name`-tagged operator tokens via `next_token`)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    # -- low level ---------------------------------------------------

    def skip_ws(self) -> None:
        # whitespace runs and %-comments (terminated by the following
        # ws run or EOF).  The overwhelmingly common shape is 0-2 plain
        # ws bytes and no comment: walk those inline (a failed/short
        # regex match costs more than the byte checks) and fall back to
        # the one-regex step only at a '%'.
        data = self.data
        pos = self.pos
        n = len(data)
        while pos < n:
            c = data[pos]
            if c in WHITESPACE:
                pos += 1
            elif c == 0x25:  # '%': comment(s) — the regex eats the rest
                m = _WS_OR_COMMENT_RE.match(data, pos)
                self.pos = m.end()
                return
            else:
                break
        self.pos = pos

    def peek(self) -> int:
        if self.pos >= len(self.data):
            return -1
        return self.data[self.pos]

    def _keyword(self) -> bytes:
        start = self.pos
        data, n = self.data, len(self.data)
        while self.pos < n:
            c = data[self.pos]
            if c in WHITESPACE or c in DELIMITERS:
                break
            self.pos += 1
        if self.pos == start:
            # a lone delimiter we don't otherwise handle ({, }, ...)
            self.pos += 1
            return data[start : self.pos]
        return data[start : self.pos]

    # -- object grammar ----------------------------------------------

    def parse_name(self) -> Name:
        assert self.data[self.pos] == 0x2F  # '/'
        self.pos += 1
        data, n = self.data, len(self.data)
        # fast path: a plain name with no '#xx' escape
        m = _NAME_RUN_RE.match(data, self.pos)
        end = m.end()
        if end >= n or data[end] != 0x23:
            start = self.pos
            self.pos = end
            raw = data[start:end]
            # intern: /Type /Font /Widths ... repeat constantly (Name is
            # an immutable str subclass, sharing instances is safe)
            got = _NAME_CACHE.get(raw)
            if got is None:
                got = Name(raw.decode("latin-1"))
                if len(_NAME_CACHE) < 4096:
                    _NAME_CACHE[raw] = got
            return got
        out = bytearray()
        while self.pos < n:
            c = data[self.pos]
            if c in WHITESPACE or c in DELIMITERS:
                break
            if c == 0x23 and self.pos + 2 < n:  # '#xx'
                try:
                    out.append(int(data[self.pos + 1 : self.pos + 3], 16))
                    self.pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            self.pos += 1
        return Name(out.decode("latin-1"))

    def parse_literal_string(self) -> bytes:
        assert self.data[self.pos] == 0x28  # '('
        self.pos += 1
        data, n = self.data, len(self.data)
        # fast path: no escapes, no nesting before the closing paren
        j = data.find(b")", self.pos)
        if j != -1:
            seg = data[self.pos : j]
            if b"\\" not in seg and b"(" not in seg:
                self.pos = j + 1
                return bytes(seg)
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = data[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = data[self.pos]
                if e in b"nrtbf":
                    out.append(b"\n\r\t\b\x0c"[b"nrtbf".index(e)])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                    oct_digits = bytearray()
                    while (
                        self.pos < n
                        and len(oct_digits) < 3
                        and 0x30 <= data[self.pos] <= 0x37
                    ):
                        oct_digits.append(data[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e == 0x0D:  # line continuation \<CR>[<LF>]
                    self.pos += 1
                    if self.pos < n and data[self.pos] == 0x0A:
                        self.pos += 1
                elif e == 0x0A:
                    self.pos += 1
                else:  # unknown escape: the backslash is dropped
                    out.append(e)
                    self.pos += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
            out.append(c)
            self.pos += 1
        raise PdfError("unterminated literal string")

    def parse_hex_string(self) -> bytes:
        assert self.data[self.pos] == 0x3C  # '<'
        self.pos += 1
        end = self.data.find(b">", self.pos)
        if end == -1:
            raise PdfError("unterminated hex string")
        hexpart = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos : end])
        self.pos = end + 1
        if len(hexpart) % 2:
            hexpart += b"0"  # odd count: final digit padded with 0
        return bytes.fromhex(hexpart.decode("ascii"))

    def parse_dict_or_hex(self):
        if self.data[self.pos : self.pos + 2] == b"<<":
            self.pos += 2
            d: dict = {}
            while True:
                self.skip_ws()
                if self.data[self.pos : self.pos + 2] == b">>":
                    self.pos += 2
                    return d
                if self.peek() != 0x2F:
                    raise PdfError(f"dict key is not a name at {self.pos}")
                key = self.parse_name()
                d[str(key)] = self.parse_object()
        return self.parse_hex_string()

    def parse_array(self) -> list:
        assert self.data[self.pos] == 0x5B  # '['
        self.pos += 1
        out = []
        while True:
            self.skip_ws()
            if self.peek() == 0x5D:
                self.pos += 1
                return out
            if self.peek() == -1:
                raise PdfError("unterminated array")
            out.append(self.parse_object())

    def parse_number(self):
        m = _NUMBER_RE.match(self.data, self.pos)
        if not m:
            raise PdfError(f"bad number at {self.pos}")
        self.pos = m.end()
        tok = m.group()
        if b"." in tok:
            return float(tok)
        return int(tok)

    def parse_object(self):
        """Parse one object, folding `N G R` into a Ref."""
        # inlined skip_ws + peek (hot: one pair of calls per object)
        data = self.data
        pos = self.pos
        n = len(data)
        while pos < n:
            c = data[pos]
            if c in WHITESPACE:
                pos += 1
            elif c == 0x25:
                m = _WS_OR_COMMENT_RE.match(data, pos)
                pos = m.end()
            else:
                break
        self.pos = pos
        if pos >= n:
            raise PdfError("unexpected end of data")
        c = data[pos]
        if c == 0x2F:
            return self.parse_name()
        if c == 0x28:
            return self.parse_literal_string()
        if c == 0x3C:
            return self.parse_dict_or_hex()
        if c == 0x5B:
            return self.parse_array()
        if 0x30 <= c <= 0x39 or c in (0x2B, 0x2D, 0x2E):
            num = self.parse_number()
            # lookahead for `gen R`
            if isinstance(num, int) and num >= 0:
                save = self.pos
                self.skip_ws()
                m = _NUMBER_RE.match(self.data, self.pos)
                if m and m.group().isdigit():
                    # inline probe (was a throwaway Lexer + skip_ws):
                    # skip ws/comments after the 2nd number, then look
                    # for a delimited 'R'
                    p = m.end()
                    while p < n:
                        ch = data[p]
                        if ch in WHITESPACE:
                            p += 1
                        elif ch == 0x25:
                            mm = _WS_OR_COMMENT_RE.match(data, p)
                            p = mm.end()
                        else:
                            break
                    after = data[p + 1 : p + 2]
                    if data[p : p + 1] == b"R" and (
                        after == b""
                        or after[0] in WHITESPACE
                        or after[0] in DELIMITERS
                    ):
                        self.pos = p + 1
                        return Ref(num, int(m.group()))
                self.pos = save
            return num
        kw = self._keyword()
        if kw == b"true":
            return True
        if kw == b"false":
            return False
        if kw == b"null":
            return None
        raise PdfError(f"unexpected keyword {kw!r} at {self.pos}")

    def next_token(self):
        """Content-stream tokenizer: like parse_object but unknown
        keywords come back as ('op', bytes) operator tokens and EOF as
        None (content streams are a flat postfix stream, not a tree)."""
        # inlined skip_ws + peek (hot: one pair of calls per token)
        data = self.data
        pos = self.pos
        n = len(data)
        while pos < n:
            c = data[pos]
            if c in WHITESPACE:
                pos += 1
            elif c == 0x25:
                m = _WS_OR_COMMENT_RE.match(data, pos)
                pos = m.end()
            else:
                break
        self.pos = pos
        if pos >= n:
            return None
        c = data[pos]
        if c == 0x2F:
            return self.parse_name()
        if c == 0x28:
            return self.parse_literal_string()
        if c == 0x3C:
            return self.parse_dict_or_hex()
        if c == 0x5B:
            return self.parse_array()
        if c == 0x5D:  # stray close (malformed): skip
            self.pos += 1
            return ("op", b"]")
        if 0x30 <= c <= 0x39 or c in (0x2B, 0x2D, 0x2E):
            try:
                return self.parse_number()
            except PdfError:
                self.pos += 1
                return ("op", b"?")
        kw = self._keyword()
        if kw == b"true":
            return True
        if kw == b"false":
            return False
        if kw == b"null":
            return None
        return ("op", kw)


# ---------------------------------------------------------------------------
# Filters
# ---------------------------------------------------------------------------


def _apply_predictor(data: bytes, predictor: int, colors: int, bpc: int, columns: int) -> bytes:
    if predictor <= 1:
        return data
    bpp = max(1, (colors * bpc + 7) // 8)  # bytes per pixel
    row_len = (columns * colors * bpc + 7) // 8
    if predictor == 2:  # TIFF horizontal differencing (8-bit only here)
        if bpc != 8:
            raise PdfError("TIFF predictor with bpc != 8 unsupported")
        out = bytearray(data)
        for r in range(0, len(out) - row_len + 1, row_len):
            for i in range(r + bpp, r + row_len):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    # PNG predictors: every row is prefixed with a filter-type byte
    out = bytearray()
    prev = bytearray(row_len)
    pos = 0
    n = len(data)
    while pos < n - 1:  # need a filter byte plus at least one data byte
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + row_len])
        if len(row) < row_len:
            row.extend(b"\x00" * (row_len - len(row)))
        pos += 1 + row_len
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, row_len):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(row_len):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(row_len):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(row_len):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise PdfError(f"unknown PNG filter type {ft}")
        out.extend(row)
        prev = row
        if pos >= n:
            break
    return bytes(out)


# Per-stream decompressed-size budget.  A tiny FlateDecode/LZW bomb in a
# crawled PDF can otherwise expand to tens of GB and OOM the executor,
# breaking the operator contract (error row, never a task failure).  Real
# content streams are text-sized; 64 MiB is orders of magnitude above any
# legitimate one while keeping worst-case per-row memory bounded.
_MAX_DECODED_BYTES = 64 * 1024 * 1024


def _flate(data: bytes) -> bytes:
    d = zlib.decompressobj()
    try:
        out = d.decompress(data, _MAX_DECODED_BYTES + 1)
    except zlib.error as e:
        raise PdfError(f"FlateDecode failed: {e}") from None
    if len(out) > _MAX_DECODED_BYTES:
        raise PdfError("FlateDecode output exceeds decompression budget")
    # tolerate truncated/garbage-trailed streams (common in crawls):
    # whatever decoded before the error is returned; a clean stream has
    # consumed all input at this point anyway.
    return out


def _ascii_hex(data: bytes) -> bytes:
    end = data.find(b">")
    if end != -1:
        data = data[:end]
    hexpart = re.sub(rb"[^0-9A-Fa-f]", b"", data)
    if len(hexpart) % 2:
        hexpart += b"0"
    return bytes.fromhex(hexpart.decode("ascii"))


def _ascii_85(data: bytes) -> bytes:
    import base64

    data = re.sub(rb"\s", b"", data)
    if data.startswith(b"<~"):
        data = data[2:]
    if data.endswith(b"~>"):
        data = data[:-2]
    try:
        return base64.a85decode(data, adobe=False)
    except ValueError as e:
        raise PdfError(f"ASCII85Decode failed: {e}") from None


def _run_length(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        if len(out) > _MAX_DECODED_BYTES:
            raise PdfError("RunLengthDecode output exceeds decompression budget")
        length = data[i]
        i += 1
        if length == 128:
            break
        if length < 128:
            out.extend(data[i : i + length + 1])
            i += length + 1
        else:
            if i < n:
                out.extend(data[i : i + 1] * (257 - length))
                i += 1
    return bytes(out)


def _lzw(data: bytes, early_change: int = 1) -> bytes:
    """PDF/TIFF-flavoured LZW: 9..12-bit codes, 256=clear, 257=EOD."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    code_len = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= code_len:
            nbits -= code_len
            code = (acc >> nbits) & ((1 << code_len) - 1)
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                code_len = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise PdfError("LZWDecode: code out of range")
            out.extend(entry)
            if len(out) > _MAX_DECODED_BYTES:
                raise PdfError("LZWDecode output exceeds decompression budget")
            prev = entry
            if len(table) + early_change - 1 >= (1 << code_len) and code_len < 12:
                code_len += 1
    return bytes(out)


def _as_int(v, default: int | None = None) -> int:
    """Coerce a resolved object to int; hostile values (a Name where a
    count belongs, etc.) become PdfError, never ValueError/TypeError."""
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        if default is not None:
            return default
        raise PdfError(f"expected integer, got {type(v).__name__}")
    return int(v)


def decode_stream(stream: Stream, resolve=lambda x: x) -> bytes:
    """Apply the stream's /Filter chain (with /DecodeParms) to its raw
    bytes.  `resolve` dereferences indirect filter parameters."""
    filters = resolve(stream.dict.get("Filter"))
    if filters is None:
        return stream.raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = resolve(stream.dict.get("DecodeParms", stream.dict.get("DP")))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = stream.raw
    for f, p in zip(filters, parms):
        f = str(resolve(f)) if f is not None else None
        p = resolve(p) or {}
        if f in ("FlateDecode", "Fl"):
            data = _flate(data)
        elif f in ("ASCIIHexDecode", "AHx"):
            data = _ascii_hex(data)
        elif f in ("ASCII85Decode", "A85"):
            data = _ascii_85(data)
        elif f in ("RunLengthDecode", "RL"):
            data = _run_length(data)
        elif f in ("LZWDecode", "LZW"):
            data = _lzw(data, _as_int(resolve(p.get("EarlyChange", 1)), 1))
        elif f == "Crypt":
            raise PdfError("encrypted stream")
        else:
            raise PdfError(f"unsupported stream filter {f}")
        pred = _as_int(resolve(p.get("Predictor", 1)), 1)
        if pred > 1:
            data = _apply_predictor(
                data,
                pred,
                _as_int(resolve(p.get("Colors", 1)), 1),
                _as_int(resolve(p.get("BitsPerComponent", 8)), 8),
                _as_int(resolve(p.get("Columns", 1)), 1),
            )
    return data


# ---------------------------------------------------------------------------
# Document / xref
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d{1,10})\s+(\d{1,5})\s+obj\b")


class PdfDocument:
    """Parsed PDF: object table + trailer, lazy object loading."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        # obj num -> ("f",) | ("n", offset, gen) | ("c", objstm_num, idx)
        self.xref: dict[int, tuple] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        self._decryptor = None
        self._enc_obj_num: int | None = None
        self._used_brute = False
        self._parse_structure()
        if "Encrypt" in self.trailer:
            self._init_decryptor()

    def _init_decryptor(self) -> None:
        """Standard security handler, EMPTY user/owner password only
        (ISO 32000-1 §7.6.3 for /R 2-4; ISO 32000-2 §7.6.4 for the
        AES-256 /R 5-6 revisions) — the common crawled case where
        encryption only enforces owner permissions.  Real passwords
        still raise (detect-and-skip, as before this existed)."""
        if self._used_brute:
            # objects were already eagerly parsed without decryption
            raise PdfError("encrypted document (damaged xref)")
        from .pdfcrypt import StandardSecurityHandler

        enc_ref = self.trailer.get("Encrypt")
        if isinstance(enc_ref, Ref):
            self._enc_obj_num = enc_ref.num
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            raise PdfError("encrypted document (bad /Encrypt)")
        ids = self.trailer.get("ID")
        id0 = b""
        if isinstance(ids, list) and ids and isinstance(ids[0], bytes):
            id0 = ids[0]
        self._decryptor = StandardSecurityHandler(enc, id0, self.resolve)

    def _decrypt_object(self, obj, num: int, gen: int):
        """Decrypt strings and stream payloads of a freshly-loaded
        top-level object.  Never applied to the /Encrypt dict itself,
        to XRef streams, or to objects inside an ObjStm (the container
        stream was the encrypted unit).  Strings and streams go through
        their OWN crypt filters (/StrF vs /StmF may differ).

        The walk builds a NEW tree (fresh Stream nodes included) and
        only the fully-decrypted result is returned: if decryption
        raises partway (e.g. a non-block-aligned AES payload on a later
        sibling), the caller keeps the ORIGINAL object untouched — a
        half-decrypted hybrid must never be cached and served."""
        dec = self._decryptor

        def walk(o):
            if isinstance(o, bytes):
                return dec.decrypt(o, num, gen, string=True)
            if isinstance(o, list):
                return [walk(x) for x in o]
            if isinstance(o, Stream):
                d = walk(o.dict)
                raw = o.raw
                if str(d.get("Type")) != "XRef":
                    raw = dec.decrypt(raw, num, gen)
                return Stream(d, raw)
            if isinstance(o, dict):
                return {k: walk(v) for k, v in o.items()}
            return o

        try:
            return walk(obj)
        except PdfError:
            return obj  # undecryptable object: keep raw, fail downstream

    # -- structure ----------------------------------------------------

    def _parse_structure(self) -> None:
        try:
            self._parse_xref_chain()
        except PdfError:
            self.xref = {}
            self.trailer = {}
        if not self.xref or "Root" not in self.trailer:
            self._brute_scan()
        if "Root" not in self.trailer:
            raise PdfError("no document catalog (/Root)")

    def _parse_xref_chain(self) -> None:
        tail = self.data[-2048:]
        i = tail.rfind(b"startxref")
        if i == -1:
            raise PdfError("no startxref")
        lex = Lexer(tail, i + len(b"startxref"))
        lex.skip_ws()
        offset = lex.parse_number()
        seen = set()
        while isinstance(offset, int) and 0 <= offset < len(self.data):
            if offset in seen:
                break
            seen.add(offset)
            offset = self._parse_xref_section(offset)

    def _parse_xref_section(self, offset: int) -> int | None:
        """Parse one xref section (classic or stream); returns /Prev."""
        lex = Lexer(self.data, offset)
        lex.skip_ws()
        if self.data[lex.pos : lex.pos + 4] == b"xref":
            lex.pos += 4
            # subsections: `start count` then count 20-byte entries
            while True:
                lex.skip_ws()
                if self.data[lex.pos : lex.pos + 7] == b"trailer":
                    lex.pos += 7
                    trailer = lex.parse_object()
                    if not isinstance(trailer, dict):
                        raise PdfError("bad trailer")
                    for k, v in trailer.items():
                        self.trailer.setdefault(k, v)
                    # hybrid files: /XRefStm points at an xref stream with
                    # entries for compressed objects
                    if "XRefStm" in trailer:
                        try:
                            self._parse_xref_section(int(trailer["XRefStm"]))
                        except (PdfError, TypeError, ValueError):
                            pass
                    prev = trailer.get("Prev")
                    return int(prev) if isinstance(prev, (int, float)) else None
                m = _NUMBER_RE.match(self.data, lex.pos)
                if not m or not m.group().isdigit():
                    raise PdfError("bad xref subsection")
                start = int(m.group())
                lex.pos = m.end()
                lex.skip_ws()
                count = _as_int(lex.parse_number())
                lex.skip_ws()
                for k in range(count):
                    line = self.data[lex.pos : lex.pos + 20]
                    if len(line) < 18:
                        raise PdfError("truncated xref table")
                    try:
                        off = int(line[0:10])
                        gen = int(line[11:16])
                    except ValueError as e:
                        raise PdfError(f"bad xref entry: {e}") from None
                    kind = line[17:18]
                    num = start + k
                    if num not in self.xref:
                        self.xref[num] = (
                            ("n", off, gen) if kind == b"n" else ("f",)
                        )
                    # entries are 20 bytes in well-formed files but 19
                    # (single-char EOL) exists in the wild
                    lex.pos += 20 if line[18:20] in (b"\r\n", b" \r", b" \n") else 19
            # unreachable
        # else: xref stream — `N G obj <<...>> stream`
        obj = self._parse_indirect_at(offset)
        if not isinstance(obj, Stream) or str(obj.dict.get("Type")) != "XRef":
            raise PdfError("startxref does not point at xref data")
        self._load_xref_stream(obj)
        for k, v in obj.dict.items():
            if k not in ("Length", "Filter", "DecodeParms", "W", "Index", "Type"):
                self.trailer.setdefault(k, v)
        prev = obj.dict.get("Prev")
        return int(prev) if isinstance(prev, (int, float)) else None

    def _load_xref_stream(self, stream: Stream) -> None:
        data = decode_stream(stream, self.resolve)
        w_raw = self.resolve(stream.dict.get("W", []))
        if not isinstance(w_raw, list):
            raise PdfError("xref stream /W is not an array")
        w = [_as_int(self.resolve(x)) for x in w_raw]
        if len(w) != 3:
            raise PdfError("xref stream /W must have 3 entries")
        size = _as_int(self.resolve(stream.dict.get("Size", 0)), 0)
        index = self.resolve(stream.dict.get("Index"))
        if not isinstance(index, list):
            index = [0, size]
        rec_len = sum(w)
        if rec_len <= 0:
            raise PdfError("bad xref stream widths")
        pos = 0

        def field(width: int) -> int:
            nonlocal pos
            if width == 0:
                return -1  # "default" marker
            v = int.from_bytes(data[pos : pos + width], "big")
            pos += width
            return v

        pairs = list(zip(index[0::2], index[1::2]))
        for start, count in pairs:
            start = _as_int(self.resolve(start))
            for k in range(_as_int(self.resolve(count))):
                if pos + rec_len > len(data):
                    return
                t = field(w[0])
                if t == -1:
                    t = 1  # default type is 1 when W[0] == 0
                f2 = field(w[1])
                f3 = field(w[2])
                num = start + k
                if num in self.xref:
                    continue
                if t == 0:
                    self.xref[num] = ("f",)
                elif t == 1:
                    self.xref[num] = ("n", f2, max(f3, 0))
                elif t == 2:
                    self.xref[num] = ("c", f2, f3)

    def _brute_scan(self) -> None:
        """Rebuild the object table by scanning for `N G obj` markers.
        Later definitions win (incremental updates append)."""
        self._used_brute = True
        for m in _OBJ_RE.finditer(self.data):
            num, gen = int(m.group(1)), int(m.group(2))
            self.xref[num] = ("n", m.start(), gen)
        # trailer(s): classic keyword, else any object with /Root
        for m in re.finditer(rb"trailer", self.data):
            lex = Lexer(self.data, m.end())
            try:
                t = lex.parse_object()
            except PdfError:
                continue
            if isinstance(t, dict):
                for k, v in t.items():
                    self.trailer[k] = v
        # register objects hiding inside ObjStm containers (modern PDFs
        # keep the catalog there; a broken xref must not lose it), and
        # recover trailer keys from any XRef stream dict
        for num in sorted(self.xref):
            try:
                obj = self.get_object(num)
            except PdfError:
                continue
            d = obj.dict if isinstance(obj, Stream) else obj
            if not isinstance(d, dict):
                continue
            t = str(d.get("Type"))
            if t == "ObjStm":
                try:
                    for inner in self._load_objstm(num):
                        self.xref.setdefault(inner, ("c", num, 0))
                except PdfError:
                    continue
            elif t == "XRef":
                for k, v in d.items():
                    if k not in ("Length", "Filter", "DecodeParms", "W", "Index"):
                        self.trailer.setdefault(k, v)
        if "Root" not in self.trailer:
            for num in sorted(self.xref):
                try:
                    obj = self.get_object(num)
                except PdfError:
                    continue
                d = obj.dict if isinstance(obj, Stream) else obj
                if isinstance(d, dict) and str(d.get("Type")) == "Catalog":
                    self.trailer["Root"] = Ref(num, 0)
                    break

    # -- objects -------------------------------------------------------

    def _parse_indirect_at(self, offset: int):
        lex = Lexer(self.data, offset)
        lex.skip_ws()
        m = _OBJ_RE.match(self.data, lex.pos)
        if not m:
            raise PdfError(f"no indirect object at offset {offset}")
        lex.pos = m.end()
        obj = lex.parse_object()
        lex.skip_ws()
        if self.data[lex.pos : lex.pos + 6] == b"stream":
            if not isinstance(obj, dict):
                raise PdfError("stream without dictionary")
            lex.pos += 6
            if self.data[lex.pos : lex.pos + 2] == b"\r\n":
                lex.pos += 2
            elif self.data[lex.pos : lex.pos + 1] in (b"\n", b"\r"):
                lex.pos += 1
            length = obj.get("Length")
            if isinstance(length, Ref):
                try:
                    length = self.get_object(length.num)
                except PdfError:
                    length = None
            start = lex.pos
            if isinstance(length, int) and 0 <= length <= len(self.data) - start:
                raw = self.data[start : start + length]
                # verify: `endstream` should follow (possibly after EOL)
                probe = self.data[start + length : start + length + 11]
                if b"endstream" not in probe:
                    length = None
            else:
                length = None  # absent, indirect-unresolvable, or out of range
            if not isinstance(length, int):
                end = self.data.find(b"endstream", start)
                if end == -1:
                    raise PdfError("unterminated stream")
                raw = self.data[start:end]
                if raw.endswith(b"\r\n"):
                    raw = raw[:-2]
                elif raw.endswith((b"\n", b"\r")):
                    raw = raw[:-1]
            return Stream(obj, raw)
        return obj

    def _load_objstm(self, num: int) -> dict[int, object]:
        got = self._objstm_cache.get(num)
        if got is not None:
            return got
        stm = self.get_object(num)
        if not isinstance(stm, Stream) or str(self.resolve(stm.dict.get("Type"))) != "ObjStm":
            raise PdfError(f"object {num} is not an ObjStm")
        data = decode_stream(stm, self.resolve)
        n = _as_int(self.resolve(stm.dict.get("N", 0)))
        first = _as_int(self.resolve(stm.dict.get("First", 0)))
        header = Lexer(data[:first])
        table = {}
        pairs = []
        for _ in range(n):
            header.skip_ws()
            onum = header.parse_number()
            header.skip_ws()
            ooff = header.parse_number()
            pairs.append((_as_int(onum), _as_int(ooff)))
        for onum, ooff in pairs:
            lex = Lexer(data, first + ooff)
            try:
                table[onum] = lex.parse_object()
            except PdfError:
                table[onum] = None
        self._objstm_cache[num] = table
        return table

    def get_object(self, num: int, gen: int | None = None):
        if num in self._cache:
            return self._cache[num]
        entry = self.xref.get(num)
        if entry is None or entry[0] == "f":
            raise PdfError(f"object {num} not in xref")
        self._cache[num] = None  # cycle guard while loading
        try:
            if entry[0] == "n":
                obj = self._parse_indirect_at(entry[1])
                if self._decryptor is not None and num != self._enc_obj_num:
                    obj = self._decrypt_object(obj, num, entry[2])
            else:  # compressed — the ObjStm table is keyed by object number
                obj = self._load_objstm(entry[1]).get(num)
            self._cache[num] = obj
            return obj
        except PdfError:
            del self._cache[num]
            raise

    def resolve(self, obj, _depth: int = 0):
        while isinstance(obj, Ref):
            if _depth > 32:
                raise PdfError("reference cycle")
            try:
                obj = self.get_object(obj.num)
            except PdfError:
                return None
            _depth += 1
        return obj

    # -- page tree ------------------------------------------------------

    _INHERITED = ("Resources", "MediaBox", "CropBox", "Rotate")

    def pages(self) -> list[dict]:
        """Flatten the page tree into page dicts with inherited
        attributes folded in (depth-first = document page order)."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("bad catalog")
        tree = self.resolve(root.get("Pages"))
        out: list[dict] = []

        def walk(node, inherited: dict, depth: int) -> None:
            if depth > 64 or not isinstance(node, dict) or len(out) >= 10_000:
                return
            inh = dict(inherited)
            for key in self._INHERITED:
                if key in node:
                    inh[key] = node[key]
            t = str(self.resolve(node.get("Type", "")))
            kids = self.resolve(node.get("Kids"))
            if t == "Pages" or (t != "Page" and isinstance(kids, list)):
                for kid in (kids if isinstance(kids, list) else []):
                    walk(self.resolve(kid), inh, depth + 1)
            elif t == "Page" or "Contents" in node:
                page = dict(node)
                for key, val in inh.items():
                    page.setdefault(key, val)
                out.append(page)

        walk(tree, {}, 0)
        if not out:
            raise PdfError("document has no pages")
        return out

    def info(self) -> dict[str, str]:
        """Document information dictionary (trailer /Info) with text
        strings decoded: UTF-16BE when BOM-prefixed, else PDFDocEncoding
        (approximated as latin-1 — identical for the printable range)."""
        raw = self.resolve(self.trailer.get("Info"))
        out: dict[str, str] = {}
        if not isinstance(raw, dict):
            return out
        for key, val in raw.items():
            val = self.resolve(val)
            if isinstance(val, bytes):
                if val[:2] == b"\xfe\xff":
                    out[key] = val[2:].decode("utf-16-be", "replace")
                else:
                    out[key] = val.decode("latin-1")
            elif isinstance(val, (str, int, float)):
                out[key] = str(val)
        return out

    def page_content(self, page: dict) -> bytes:
        """Concatenated, decoded content streams of a page."""
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if not isinstance(contents, list):
            contents = [contents]
        parts = []
        for c in contents:
            c = self.resolve(c)
            if isinstance(c, Stream):
                parts.append(decode_stream(c, self.resolve))
        return b"\n".join(parts)


def parse_pdf(data: bytes) -> PdfDocument:
    if not isinstance(data, (bytes, bytearray)):
        raise PdfError("input is not bytes")
    start = data[:1024].find(b"%PDF-")
    if start == -1:
        raise PdfError("missing %PDF header")
    if start > 0:
        # leading junk (HTTP noise, mislabeled framing): xref offsets are
        # relative to the %PDF header, so slicing restores them — better
        # than falling back to the brute scan, which cannot serve
        # encrypted documents (their objects need the real xref)
        data = data[start:]
    return PdfDocument(bytes(data))
