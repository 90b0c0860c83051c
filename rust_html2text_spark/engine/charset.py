"""WHATWG-style encoding sniffing for the EXTRACTION tier.

Real crawls are double-digit-percent non-UTF-8 (windows-1252,
shift_jis, iso-8859-*, gbk, ...); decoding those as utf-8/replace
yields mojibake with no error signal.  This module implements the
detection order of the WHATWG Encoding standard's "sniffing" algorithm
(https://html.spec.whatwg.org/multipage/parsing.html#determining-the-character-encoding):

  1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — always wins;
  2. prescan of the first 1024 bytes for a <meta charset=...> or
     <meta http-equiv="content-type" content="...charset=..."> declaration;
  3. the caller's fallback (configurable; utf-8 here, where the spec
     leaves it to locale).

Labels map to codecs per the WHATWG Encoding registry — notably
ascii / latin1 / iso-8859-1 are LABELS FOR windows-1252, and a
meta-declared utf-16 is treated as utf-8 (the spec's x-user-defined
and utf-16 quirks), because the prescan having found ASCII-shaped
bytes contradicts a UTF-16 declaration.

This is deliberately NOT wired into the byte-identity render path:
`from_read`'s utf-8/replace decode is exact reference parity
(rust-html2text src/lib.rs:3011-3023, `from_utf8().read_from(...)`).
The extraction operators opt in via `charset_sniff=True`.
"""

from __future__ import annotations

import re

__all__ = ["sniff_encoding", "decode_html", "WHATWG_LABELS"]

# WHATWG Encoding registry labels -> Python codec names (the subset a
# crawl extractor meets; unknown labels fall through to the fallback).
WHATWG_LABELS: dict[str, str] = {}


def _reg(codec: str, *labels: str) -> None:
    for lab in labels:
        WHATWG_LABELS[lab] = codec


_reg("utf-8", "utf-8", "utf8", "unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8", "x-unicode20utf8")
_reg(
    "cp1252",
    "windows-1252", "cp1252", "x-cp1252", "ansi_x3.4-1968", "ascii",
    "us-ascii", "iso-8859-1", "iso8859-1", "iso88591", "latin1", "l1",
    "cp819", "ibm819", "csisolatin1", "iso-ir-100", "iso_8859-1",
    "iso_8859-1:1987",
)
_reg("cp1250", "windows-1250", "cp1250", "x-cp1250")
_reg("cp1251", "windows-1251", "cp1251", "x-cp1251")
_reg("cp1253", "windows-1253", "cp1253", "x-cp1253")
_reg("cp1254", "windows-1254", "cp1254", "x-cp1254", "iso-8859-9", "latin5")
_reg("cp1255", "windows-1255", "cp1255", "x-cp1255")
_reg("cp1256", "windows-1256", "cp1256", "x-cp1256")
_reg("cp1257", "windows-1257", "cp1257", "x-cp1257")
_reg("cp1258", "windows-1258", "cp1258", "x-cp1258")
_reg("iso8859-2", "iso-8859-2", "iso8859-2", "latin2", "l2")
_reg("iso8859-3", "iso-8859-3", "iso8859-3", "latin3")
_reg("iso8859-4", "iso-8859-4", "iso8859-4", "latin4")
_reg("iso8859-5", "iso-8859-5", "iso8859-5", "cyrillic")
_reg("iso8859-6", "iso-8859-6", "iso8859-6", "arabic")
_reg("iso8859-7", "iso-8859-7", "iso8859-7", "greek", "greek8")
_reg("iso8859-8", "iso-8859-8", "iso8859-8", "hebrew")
_reg("iso8859-10", "iso-8859-10", "latin6")
_reg("iso8859-13", "iso-8859-13")
_reg("iso8859-14", "iso-8859-14")
_reg("iso8859-15", "iso-8859-15", "iso8859-15", "latin9", "l9")
_reg("iso8859-16", "iso-8859-16")
_reg("koi8-r", "koi8-r", "koi8", "koi", "cskoi8r")
_reg("koi8-u", "koi8-u", "koi8-ru")
_reg("mac-roman", "macintosh", "x-mac-roman", "mac", "csmacintosh")
_reg(
    "shift_jis",
    "shift_jis", "shift-jis", "sjis", "x-sjis", "ms932", "ms_kanji",
    "csshiftjis", "windows-31j",
)
_reg("euc_jp", "euc-jp", "x-euc-jp", "cseucpkdfmtjapanese")
_reg("iso2022_jp", "iso-2022-jp", "csiso2022jp")
_reg("gbk", "gbk", "gb2312", "gb_2312", "gb_2312-80", "chinese",
     "csgb2312", "csiso58gb231280", "iso-ir-58", "x-gbk")
_reg("gb18030", "gb18030")
_reg("big5", "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5")
_reg("euc_kr", "euc-kr", "korean", "csksc56011987", "cseuckr",
     "iso-ir-149", "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601",
     "ksc_5601", "windows-949")
_reg("cp874", "windows-874", "dos-874", "iso-8859-11", "tis-620")
_reg("utf-16-le", "utf-16", "utf-16le", "ucs-2", "unicode",
     "unicodefeff", "csunicode")
_reg("utf-16-be", "utf-16be", "unicodefffe")

# prescan: <meta charset="..."> and <meta http-equiv=content-type
# content="...; charset=...">, attribute order / quoting / case free.
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+?charset\s*=\s*["']?\s*([a-zA-Z0-9._:\-]+)""",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)


def _label_to_codec(label: str) -> str | None:
    return WHATWG_LABELS.get(label.strip().lower())


def sniff_encoding(
    data: bytes,
    fallback: str = "utf-8",
    transport_label: str | None = None,
) -> tuple[str, str]:
    """Return (python codec, source) with source in {"bom", "http",
    "meta", "default"}.  Detection order per the WHATWG algorithm: a BOM
    always wins; then the transport layer's declaration
    (`transport_label`, e.g. the charset= parameter of an HTTP
    Content-Type header — a crawl's WARC records carry it); then the
    1024-byte meta prescan; then the caller's fallback.  An unknown
    transport label falls through to the prescan rather than erroring
    (crawl headers lie and typo)."""
    if data.startswith(b"\xef\xbb\xbf"):
        return "utf-8", "bom"
    if data.startswith(b"\xff\xfe"):
        return "utf-16-le", "bom"
    if data.startswith(b"\xfe\xff"):
        return "utf-16-be", "bom"
    if transport_label:
        codec = _label_to_codec(transport_label)
        if codec is not None:
            return codec, "http"
    head = _COMMENT_RE.sub(b"", data[:1024])
    m = _META_CHARSET_RE.search(head)
    if m:
        try:
            label = m.group(1).decode("ascii")
        except UnicodeDecodeError:
            label = ""
        codec = _label_to_codec(label)
        if codec in ("utf-16-le", "utf-16-be"):
            # WHATWG: a meta-declared utf-16 is read as utf-8 — the
            # prescan just parsed ASCII-shaped bytes, contradicting it
            codec = "utf-8"
        if codec is not None:
            return codec, "meta"
    codec = _label_to_codec(fallback) or fallback
    return codec, "default"


def decode_html(
    data: bytes,
    fallback: str = "utf-8",
    transport_label: str | None = None,
) -> tuple[str, str, str]:
    """Sniff + decode: returns (text, codec, source).  Decoding never
    raises (errors=replace — a lying declaration degrades to U+FFFD
    noise, it must not kill a batch); a BOM is not part of the
    document and is stripped."""
    codec, source = sniff_encoding(data, fallback, transport_label)
    if source == "bom":
        data = data[3:] if codec == "utf-8" else data[2:]
    try:
        return data.decode(codec, "replace"), codec, source
    except LookupError:  # unknown fallback label passed straight through
        return data.decode("utf-8", "replace"), "utf-8", "default"
