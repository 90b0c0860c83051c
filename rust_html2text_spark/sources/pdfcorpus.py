"""Deterministic synthetic PDF corpus (writer + Spark source).

The extraction tier's north rule includes "PDF/layout parse"; like the
WARC source (sources/warc.py), this module pairs the reader with a
deterministic writer so the corpus can be synthesized at any scale with
no external data and the reader is testable by round-trip.

`build_pdf` emits a real, spec-conformant PDF per document:

- Letter pages with a running header (journal name left, url right — two
  separate show ops on one baseline, exercising gap-scaled word breaks),
  a kerned TJ title, a wrapped 10pt body using TL/T* line stepping, and
  a centered footer that is written FIRST in the content stream but must
  sort LAST in reading order (the layout-ordering proof),
- WinAnsi Helvetica for Latin-1 lines and a Type0/Identity-H font with
  an identity ToUnicode CMap for lines with wider codepoints,
- FlateDecode content streams (doc_id % 3 != 1 — some stay raw),
- doc_id % 2 == 0: classic xref table; otherwise an xref *stream* with
  all non-stream objects packed into an /ObjStm — so both reader paths
  stay exercised at corpus scale,
- resources inherited from the /Pages node, not repeated per page.

The Spark source wraps the writer in an Arrow-batched pandas UDF (corpus
synthesis is input materialization, never the measured path).
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F

PAGE_W, PAGE_H = 612, 792
MARGIN = 72
BODY_SIZE, BODY_LEADING = 10, 12
WRAP_CHARS = 90
LINES_PER_PAGE = 52


def _esc(s: str) -> bytes:
    """Literal-string escaping for cp1252-encodable text."""
    raw = s.encode("cp1252")
    return (
        raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def _hex_utf16(s: str) -> bytes:
    """2-byte Identity-H codes: BMP codepoints, others become U+FFFD."""
    out = bytearray()
    for ch in s:
        cp = ord(ch)
        if cp > 0xFFFF or 0xD800 <= cp <= 0xDFFF:
            cp = 0xFFFD
        out += cp.to_bytes(2, "big")
    return b"<" + out.hex().upper().encode("ascii") + b">"


def _wrap(text: str, width: int) -> list[str]:
    lines: list[str] = []
    for para in text.split("\n"):
        words = para.split()
        cur = ""
        for w in words:
            if cur and len(cur) + 1 + len(w) > width:
                lines.append(cur)
                cur = w
            else:
                cur = f"{cur} {w}" if cur else w
        if cur:
            lines.append(cur)
    return lines or [""]


def _cp1252able(s: str) -> bool:
    try:
        s.encode("cp1252")
        return True
    except UnicodeEncodeError:
        return False


_TOUNICODE = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /UniDoc-Identity def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
1 beginbfrange
<0000> <FFFF> <0000>
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""


def _ser(obj) -> bytes:
    """Serialize a python value as a PDF object (dicts keyed by name)."""
    if obj is None:
        return b"null"
    if obj is True:
        return b"true"
    if obj is False:
        return b"false"
    if isinstance(obj, int):
        return str(obj).encode()
    if isinstance(obj, float):
        return f"{obj:.4f}".rstrip("0").rstrip(".").encode()
    if isinstance(obj, str):  # names
        return b"/" + obj.encode("ascii")
    if isinstance(obj, bytes):  # pre-serialized fragment (strings, refs)
        return obj
    if isinstance(obj, list):
        return b"[" + b" ".join(_ser(x) for x in obj) + b"]"
    if isinstance(obj, dict):
        return (
            b"<< "
            + b" ".join(b"/" + k.encode("ascii") + b" " + _ser(v) for k, v in obj.items())
            + b" >>"
        )
    raise TypeError(type(obj))


def _ref(n: int) -> bytes:
    return f"{n} 0 R".encode()


def _hexstr(raw: bytes) -> bytes:
    return b"<" + raw.hex().upper().encode("ascii") + b">"


def _unesc_literal(inner: bytes) -> bytes:
    """Inverse of _esc for the escapes it produces (\\\\, \\(, \\))."""
    out = bytearray()
    i = 0
    while i < len(inner):
        c = inner[i]
        if c == 0x5C and i + 1 < len(inner):
            out.append(inner[i + 1])
            i += 2
        else:
            out.append(c)
            i += 1
    return bytes(out)


def _crypt_obj(obj, crypt, num: int):
    """Encrypt every string fragment of a serialized-value tree with the
    object's key; refs/names/numbers pass through.  Encrypted strings
    re-serialize as hex strings (arbitrary bytes, no escaping needed)."""
    if isinstance(obj, bytes):
        if obj.startswith(b"(") and obj.endswith(b")"):
            return _hexstr(crypt.encrypt(_unesc_literal(obj[1:-1]), num))
        if (
            obj.startswith(b"<")
            and obj.endswith(b">")
            and not obj.startswith(b"<<")
        ):
            return _hexstr(
                crypt.encrypt(bytes.fromhex(obj[1:-1].decode("ascii")), num)
            )
        return obj
    if isinstance(obj, list):
        return [_crypt_obj(x, crypt, num) for x in obj]
    if isinstance(obj, dict):
        return {k: _crypt_obj(v, crypt, num) for k, v in obj.items()}
    return obj


def _ser_encrypt_dict(crypt) -> bytes:
    """Serialize the /Encrypt dictionary — its own byte entries
    (/O /U /OE /UE /Perms) are NEVER encrypted (they bootstrap the
    key)."""
    d = dict(crypt.encrypt_dict())
    for k in ("O", "U", "OE", "UE", "Perms"):
        if k in d:
            d[k] = _hexstr(d[k])
    return _ser(d)


def build_pdf(
    doc_id: int,
    text: str,
    source: str,
    user_pw: bytes = b"",
) -> bytes:
    """One deterministic PDF for a corpus document.

    Encrypted lanes (standard security handler, empty user password —
    the crawled-PDF shape every viewer opens): doc_id % 9 == 4 →
    RC4-128 /R 3, doc_id % 18 == 7 → AES-128 /R 4 /AESV2, doc_id % 18
    == 16 → RC4-40 /R 2, doc_id % 18 == 11 → AES-256 /AESV3 per ISO
    32000-2 (doc_id % 360 == 11 → /R 6 with the iterated Algorithm-2.B
    hash, the rest of the lane → the /R 5 SHA-256 shape — the R6 hash
    is SPEC-MANDATED expensive, ≥64 AES rounds ≈ 0.3 s/derivation in
    pure Python, so the corpus keeps its share at ~0.3% like a real
    crawl's PDF-2.0 tail).  `user_pw` forces a real password (tests use
    it to pin that wrong-password documents still error)."""
    url = f"https://www.{source}.example.com/pdf/{doc_id}"
    body_lines = _wrap(text, WRAP_CHARS)
    page_chunks = [
        body_lines[i : i + LINES_PER_PAGE]
        for i in range(0, len(body_lines), LINES_PER_PAGE)
    ] or [[""]]
    n_pages = len(page_chunks)
    compress = doc_id % 3 != 1
    xref_stream = doc_id % 2 == 1

    # --- fixed object numbers -------------------------------------------
    # 1 catalog, 2 pages, 3 F1, 4 F2, 5 descendant CID font, 6 ToUnicode,
    # 7 Info, then per page: page dict, content stream.
    first_page_obj = 8
    page_objs = [first_page_obj + 2 * i for i in range(n_pages)]
    content_objs = [first_page_obj + 2 * i + 1 for i in range(n_pages)]

    objects: dict[int, object] = {}
    objects[1] = {"Type": "Catalog", "Pages": _ref(2)}
    objects[2] = {
        "Type": "Pages",
        "Kids": [_ref(p) for p in page_objs],
        "Count": n_pages,
        "MediaBox": [0, 0, PAGE_W, PAGE_H],
        # resources on the Pages node: pages inherit them
        "Resources": {"Font": {"F1": _ref(3), "F2": _ref(4)}},
    }
    objects[3] = {
        "Type": "Font",
        "Subtype": "Type1",
        "BaseFont": "Helvetica",
        "Encoding": "WinAnsiEncoding",
    }
    objects[4] = {
        "Type": "Font",
        "Subtype": "Type0",
        "BaseFont": "UniDoc",
        "Encoding": "Identity-H",
        "DescendantFonts": [_ref(5)],
        "ToUnicode": _ref(6),
    }
    objects[5] = {
        "Type": "Font",
        "Subtype": "CIDFontType2",
        "BaseFont": "UniDoc",
        "CIDSystemInfo": {
            "Registry": b"(Adobe)",
            "Ordering": b"(Identity)",
            "Supplement": 0,
        },
        "DW": 500,
    }
    objects[7] = {
        "Title": b"(" + _esc(f"Doc {doc_id}: {source} corpus") + b")",
        "Author": b"(" + _esc(f"The {source} journal") + b")",
        "Producer": b"(rust_html2text_spark pdfcorpus)",
    }
    streams: dict[int, tuple[dict, bytes]] = {6: ({}, _TOUNICODE)}

    # link annotations: every page links to the doc url; the first page
    # also carries a next-doc edge (the crawl-frontier shape)
    annot_base = first_page_obj + 2 * n_pages
    for i in range(n_pages):
        objects[annot_base + i] = {
            "Type": "Annot",
            "Subtype": "Link",
            "Rect": [330, 750, 580, 762],
            "A": {"Type": "Action", "S": "URI", "URI": b"(" + _esc(url) + b")"},
        }
    next_url = f"https://www.{source}.example.com/pdf/{doc_id + 1}"
    objects[annot_base + n_pages] = {
        "Type": "Annot",
        "Subtype": "Link",
        "Rect": [72, 30, 200, 44],
        "A": {"Type": "Action", "S": "URI", "URI": b"(" + _esc(next_url) + b")"},
    }

    for i, chunk in enumerate(page_chunks):
        ops = []
        # footer FIRST in the stream — reading order must still put it last
        footer = f"Page {i + 1} of {n_pages} - doc {doc_id}"
        ops.append(
            b"BT /F1 8 Tf 1 0 0 1 %d 36 Tm (%s) Tj ET"
            % (MARGIN + 180, _esc(footer))
        )
        # header: two runs on one baseline (left + right)
        ops.append(b"BT /F1 8 Tf %d 756 Td (%s) Tj ET" % (MARGIN, _esc(f"The {source} journal")))
        ops.append(b"BT /F1 8 Tf 330 756 Td (%s) Tj ET" % _esc(url))
        # kerned title via TJ (the -600 moves +9.6pt right at 16pt)
        ops.append(
            b"BT /F1 16 Tf %d 720 Td [(%s) -600 (%s)] TJ ET"
            % (MARGIN, _esc(f"Doc {doc_id}"), _esc(f"[{source}]"))
        )
        # body block: TL/T* stepping, font switch per line when needed
        body_ops = [b"BT /F1 %d Tf %d TL %d 696 Td" % (BODY_SIZE, BODY_LEADING, MARGIN)]
        for line in chunk:
            if _cp1252able(line):
                body_ops.append(b"/F1 %d Tf (%s) Tj T*" % (BODY_SIZE, _esc(line)))
            else:
                body_ops.append(b"/F2 %d Tf %s Tj T*" % (BODY_SIZE, _hex_utf16(line)))
        body_ops.append(b"ET")
        ops.append(b"\n".join(body_ops))
        content = b"\n".join(ops)
        if compress:
            streams[content_objs[i]] = (
                {"Filter": "FlateDecode"},
                zlib.compress(content),
            )
        else:
            streams[content_objs[i]] = ({}, content)
        annots = [_ref(annot_base + i)]
        if i == 0:
            annots.append(_ref(annot_base + n_pages))
        objects[page_objs[i]] = {
            "Type": "Page",
            "Parent": _ref(2),
            "Contents": _ref(content_objs[i]),
            "Annots": annots,
        }

    crypt = None
    if user_pw or doc_id % 9 == 4 or doc_id % 18 in (7, 11, 16):
        import hashlib

        from rust_html2text_spark.engine.pdfcrypt import WriterCrypt

        id0 = hashlib.md5(f"id|{doc_id}|{source}".encode()).digest()
        if doc_id % 18 == 7 and not user_pw:
            crypt = WriterCrypt(id0, user_pw=user_pw, r=4, cfm="AESV2")
        elif doc_id % 18 == 11 and not user_pw:
            r56 = 6 if doc_id % 360 == 11 else 5
            crypt = WriterCrypt(id0, user_pw=user_pw, r=r56, cfm="AESV3")
        elif doc_id % 18 == 16 and not user_pw:
            crypt = WriterCrypt(id0, user_pw=user_pw, r=2, length_bits=40)
        else:
            crypt = WriterCrypt(id0, user_pw=user_pw, r=3, length_bits=128)

    if xref_stream:
        return _emit_xref_stream(objects, streams, crypt)
    return _emit_classic(objects, streams, crypt)


def _emit_classic(
    objects: dict[int, object],
    streams: dict[int, tuple[dict, bytes]],
    crypt=None,
) -> bytes:
    buf = bytearray(b"%PDF-1.7\n%\xc2\xa5\xc2\xb1\n")
    offsets: dict[int, int] = {}
    enc_num = max(set(objects) | set(streams)) + 1 if crypt else None
    for num in sorted(set(objects) | set(streams)):
        offsets[num] = len(buf)
        buf += f"{num} 0 obj\n".encode()
        if num in streams:
            d, raw = streams[num]
            d = dict(d)
            if crypt:
                raw = crypt.encrypt(raw, num)
            d["Length"] = len(raw)
            buf += _ser(d) + b"\nstream\n" + raw + b"\nendstream"
        else:
            obj = objects[num]
            if crypt:
                obj = _crypt_obj(obj, crypt, num)
            buf += _ser(obj)
        buf += b"\nendobj\n"
    if crypt:
        offsets[enc_num] = len(buf)
        buf += f"{enc_num} 0 obj\n".encode() + _ser_encrypt_dict(crypt)
        buf += b"\nendobj\n"
    size = max(offsets) + 1
    xref_pos = len(buf)
    buf += f"xref\n0 {size}\n".encode()
    buf += b"0000000000 65535 f \n"
    for num in range(1, size):
        buf += f"{offsets[num]:010d} 00000 n \n".encode()
    trailer = {"Size": size, "Root": _ref(1), "Info": _ref(7)}
    if crypt:
        trailer["Encrypt"] = _ref(enc_num)
        trailer["ID"] = [_hexstr(crypt.id0), _hexstr(crypt.id0)]
    buf += b"trailer\n" + _ser(trailer) + b"\n"
    buf += f"startxref\n{xref_pos}\n".encode() + b"%%EOF\n"
    return bytes(buf)


def _emit_xref_stream(
    objects: dict[int, object],
    streams: dict[int, tuple[dict, bytes]],
    crypt=None,
) -> bytes:
    """PDF 1.5+ flavour: non-stream objects packed into an /ObjStm,
    cross-reference as a FlateDecode'd xref stream.  When encrypting:
    the ObjStm STREAM is the encrypted unit (strings inside it are not
    individually encrypted, §7.6.2), the /Encrypt dictionary lives
    outside any object stream, and the XRef stream is never encrypted."""
    buf = bytearray(b"%PDF-1.7\n%\xc2\xa5\xc2\xb1\n")
    extra = 4 if crypt else 3
    size = max(set(objects) | set(streams)) + extra
    enc_num = size - 3 if crypt else None
    objstm_num = size - 2
    xref_num = size - 1

    # pack plain objects into the object stream
    packed = sorted(objects)
    header = bytearray()
    body = bytearray()
    inner_off: dict[int, int] = {}
    for num in packed:
        inner_off[num] = len(body)
        body += _ser(objects[num]) + b"\n"
    for num in packed:
        header += f"{num} {inner_off[num]} ".encode()
    objstm_payload = bytes(header) + bytes(body)
    objstm_dict = {
        "Type": "ObjStm",
        "N": len(packed),
        "First": len(header),
        "Filter": "FlateDecode",
    }
    objstm_raw = zlib.compress(objstm_payload)
    if crypt:
        objstm_raw = crypt.encrypt(objstm_raw, objstm_num)

    offsets: dict[int, int] = {}
    for num in sorted(streams):
        offsets[num] = len(buf)
        d, raw = streams[num]
        d = dict(d)
        if crypt:
            raw = crypt.encrypt(raw, num)
        d["Length"] = len(raw)
        buf += f"{num} 0 obj\n".encode() + _ser(d)
        buf += b"\nstream\n" + raw + b"\nendstream\nendobj\n"
    if crypt:
        offsets[enc_num] = len(buf)
        buf += f"{enc_num} 0 obj\n".encode() + _ser_encrypt_dict(crypt)
        buf += b"\nendobj\n"
    offsets[objstm_num] = len(buf)
    od = dict(objstm_dict)
    od["Length"] = len(objstm_raw)
    buf += f"{objstm_num} 0 obj\n".encode() + _ser(od)
    buf += b"\nstream\n" + objstm_raw + b"\nendstream\nendobj\n"

    # xref stream, W [1 3 2]: type 1 (offset) for streams + objstm + the
    # xref stream itself, type 2 (in objstm) for the packed objects
    xref_pos = len(buf)
    rows = bytearray()
    rows += bytes([0]) + (0).to_bytes(3, "big") + (0).to_bytes(2, "big")
    for num in range(1, size):
        if num in offsets:
            rows += bytes([1]) + offsets[num].to_bytes(3, "big") + (0).to_bytes(2, "big")
        elif num == xref_num:
            rows += bytes([1]) + xref_pos.to_bytes(3, "big") + (0).to_bytes(2, "big")
        elif num in inner_off:
            rows += bytes([2]) + objstm_num.to_bytes(3, "big") + packed.index(num).to_bytes(2, "big")
        else:
            rows += bytes([0]) + (0).to_bytes(3, "big") + (0).to_bytes(2, "big")
    xref_raw = zlib.compress(bytes(rows))
    xref_dict = {
        "Type": "XRef",
        "Size": size,
        "W": [1, 3, 2],
        "Root": _ref(1),
        "Info": _ref(7),
        "Filter": "FlateDecode",
        "Length": len(xref_raw),
    }
    if crypt:
        xref_dict["Encrypt"] = _ref(enc_num)
        xref_dict["ID"] = [_hexstr(crypt.id0), _hexstr(crypt.id0)]
    buf += f"{xref_num} 0 obj\n".encode() + _ser(xref_dict)
    buf += b"\nstream\n" + xref_raw + b"\nendstream\nendobj\n"
    buf += f"startxref\n{xref_pos}\n".encode() + b"%%EOF\n"
    return bytes(buf)


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------


def mixed_pages_from_documents(docs: DataFrame) -> DataFrame:
    """Crawl-realistic mixed-payload pages table: ONE binary payload
    column carrying HTML for even doc_ids and PDF bytes for odd ones
    (real Common Crawl response sets are mostly HTML with a PDF tail).
    Input for operators/pdf.extract_mixed_pages' magic-byte routing."""
    from rust_html2text_spark.sources.corpus import pages_from_documents

    html_part = pages_from_documents(docs.filter(F.col("doc_id") % 2 == 0))
    pdf_part = pdf_pages_from_documents(
        docs.filter(F.col("doc_id") % 2 == 1)
    ).withColumnRenamed("pdf", "html")
    return html_part.unionByName(pdf_part)


def pdf_pages_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, ...) → PDF pages table
    (url, warc_ts, pdf:binary, text:string(null), lang) — the input-table
    shape of the north rule with the html column replaced by pdf bytes.
    Corpus synthesis is input materialization (bench/tests write it to
    parquet first), so the Arrow-batched UDF here is not a hot path."""

    @F.pandas_udf("binary")
    def _build(doc_id: pd.Series, text: pd.Series, source: pd.Series) -> pd.Series:
        return pd.Series(
            [
                build_pdf(int(i), t or "", s or "src")
                for i, t, s in zip(doc_id, text, source)
            ]
        )

    return docs.select(
        F.concat(
            F.lit("https://www."),
            F.col("source"),
            F.lit(".example.com/pdf/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_id").cast("double"))
        ).alias("warc_ts"),
        _build(F.col("doc_id"), F.col("text"), F.col("source")).alias("pdf"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang").alias("lang"),
    )
