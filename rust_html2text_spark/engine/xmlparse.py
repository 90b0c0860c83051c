"""XML document parser with xml5ever-equivalent fidelity.

The reference's `parse_xml` (/root/reference/src/lib.rs:3025-3033) drives
xml5ever, whose observable differences from the HTML tree builder are:

- tag and attribute NAMES KEEP THEIR CASE (XML is case-sensitive), so
  `<P>` does not match the HTML `p` semantics downstream;
- elements are namespace-resolved via `xmlns` / `xmlns:prefix` scoping;
  only elements in the XHTML namespace get HTML rendering semantics
  (lib.rs:1934 matches `expanded_name!(html ...)`), everything else falls
  to the unknown-element Container arm (lib.rs:2148);
- no HTML tree-builder magic: no implied <html>/<head>/<body>, no foster
  parenting, no <p> auto-closing, no void elements — a self-closing tag
  closes, anything else stays open until its end tag;
- only the five predefined entities and numeric character references are
  expanded (no HTML named-entity table);
- CDATA sections are literal text.

Error recovery (mismatched / stray end tags, EOF with open elements)
follows xml5ever's lenient tree builder: an end tag pops to the nearest
matching open element (by qname, case-sensitively) or is ignored, and EOF
closes everything.
"""

from __future__ import annotations

import re

from .htmlparse import DomNode

XHTML_NS = "http://www.w3.org/1999/xhtml"

_NAME = r"[^\s/>=]+"
_ATTR_RE = re.compile(
    # unquoted values must not swallow '/': in '<a b=c/>' the trailing '/'
    # is the self-closing marker (xml5ever recovery), not value content
    rf"({_NAME})\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s/>]*))?\s*", re.S
)
_TAG_OPEN_RE = re.compile(rf"<({_NAME})", re.S)

_PREDEFINED = {"lt": "<", "gt": ">", "amp": "&", "apos": "'", "quot": '"'}
_ENTITY_RE = re.compile(r"&(#x[0-9a-fA-F]+|#[0-9]+|[A-Za-z][A-Za-z0-9]*);")


def _expand_entities(text: str) -> str:
    def sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            try:
                return chr(int(body[2:], 16))
            except (ValueError, OverflowError):
                return m.group(0)
        if body.startswith("#"):
            try:
                return chr(int(body[1:]))
            except (ValueError, OverflowError):
                return m.group(0)
        if body in _PREDEFINED:
            return _PREDEFINED[body]
        return m.group(0)  # unknown entity: recover by leaving it literal

    return _ENTITY_RE.sub(sub, text)


class _NsFrame:
    __slots__ = ("default", "prefixes")

    def __init__(self, default: str, prefixes: dict[str, str]):
        self.default = default
        self.prefixes = prefixes


def parse_xml(data: str) -> DomNode:
    """Parse XML text into a DomNode document tree (case-preserved names,
    resolved `ns` per element)."""
    doc = DomNode("document")
    # stack entries: (node, qname_as_written, ns_frame)
    stack: list[tuple[DomNode, str | None, _NsFrame]] = [
        (doc, None, _NsFrame("", {"xml": "http://www.w3.org/XML/1998/namespace"}))
    ]

    def append_text(text: str) -> None:
        if text:
            node = DomNode("text", text=text)
            stack[-1][0].append(node)

    i = 0
    n = len(data)
    while i < n:
        lt = data.find("<", i)
        if lt < 0:
            append_text(_expand_entities(data[i:]))
            break
        if lt > i:
            append_text(_expand_entities(data[i:lt]))
        if data.startswith("<!--", lt):
            end = data.find("-->", lt + 4)
            end = n if end < 0 else end + 3
            comment = DomNode("comment", text=data[lt + 4 : max(lt + 4, end - 3)])
            stack[-1][0].append(comment)
            i = end
            continue
        if data.startswith("<![CDATA[", lt):
            end = data.find("]]>", lt + 9)
            text_end = n if end < 0 else end
            append_text(data[lt + 9 : text_end])
            i = n if end < 0 else end + 3
            continue
        if data.startswith("<?", lt):
            end = data.find("?>", lt + 2)
            i = n if end < 0 else end + 2
            continue
        if data.startswith("<!", lt):
            end = data.find(">", lt + 2)
            i = n if end < 0 else end + 1
            continue
        if data.startswith("</", lt):
            end = data.find(">", lt + 2)
            qname = data[lt + 2 : (n if end < 0 else end)].strip()
            # pop to nearest matching open element; ignore a stray end tag
            for depth in range(len(stack) - 1, 0, -1):
                if stack[depth][1] == qname:
                    del stack[depth:]
                    break
            i = n if end < 0 else end + 1
            continue
        m = _TAG_OPEN_RE.match(data, lt)
        if m is None:
            # lone '<' — literal text, like a recovering tokenizer
            append_text("<")
            i = lt + 1
            continue
        qname = m.group(1)
        j = m.end()
        attrs: dict[str, str] = {}
        raw_attrs: list[tuple[str, str]] = []
        self_closing = False
        while j < n:
            while j < n and data[j] in " \t\r\n\f":
                j += 1
            if j < n and data.startswith("/>", j):
                self_closing = True
                j += 2
                break
            if j < n and data[j] == ">":
                j += 1
                break
            am = _ATTR_RE.match(data, j)
            if am is None or am.end() == j:
                j += 1
                continue
            aname = am.group(1)
            aval = am.group(2)
            if aval is None:
                aval = ""
            elif aval[:1] in "\"'":
                aval = aval[1:-1]
            aval = _expand_entities(aval)
            raw_attrs.append((aname, aval))
            j = am.end()

        parent_frame = stack[-1][2]
        default_ns = parent_frame.default
        prefixes = parent_frame.prefixes
        new_prefixes = None
        for aname, aval in raw_attrs:
            if aname == "xmlns":
                default_ns = aval
            elif aname.startswith("xmlns:"):
                if new_prefixes is None:
                    new_prefixes = dict(prefixes)
                new_prefixes[aname[6:]] = aval
        if new_prefixes is not None:
            prefixes = new_prefixes
        frame = _NsFrame(default_ns, prefixes)

        if ":" in qname:
            prefix, local = qname.split(":", 1)
            ns = prefixes.get(prefix, "")
        else:
            local, ns = qname, default_ns
        # attrs keyed by local name (xml5ever attr.name.local), case kept
        for aname, aval in raw_attrs:
            if aname == "xmlns" or aname.startswith("xmlns:"):
                continue
            alocal = aname.split(":", 1)[1] if ":" in aname else aname
            attrs.setdefault(alocal, aval)

        node = DomNode("element", local, attrs, ns=ns)
        stack[-1][0].append(node)
        if not self_closing:
            stack.append((node, qname, frame))
        i = j
    return doc
