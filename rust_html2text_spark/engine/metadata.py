"""Page-metadata extraction: the <head> signals a crawl pipeline keys on.

The renderer deliberately ignores <head> content (reference analogue:
dom_to_render_tree skips it, src/lib.rs:1652-1678); a curation pipeline
needs exactly that dropped half — title, description, declared language,
canonical url — for dedup keys (canonical), language routing (the lang
attribute is the *claim* to check lang_id's *measurement* against), and
snippet indexes.  Pure DOM walk, same parser as the render path.
"""

from __future__ import annotations

from .htmlparse import DomNode, parse_html


def _collapse_ws(s: str) -> str:
    return " ".join(s.split())


def _text_of(node: DomNode) -> str:
    if node.kind == "text":
        return node.text or ""
    return "".join(_text_of(c) for c in node.children)


def metadata_from_dom(dom: DomNode) -> dict:
    """{title, description, lang_attr, canonical, og_title, robots} —
    first occurrence wins for each (document order), None when absent;
    robots is the normalized lowercase directive list."""
    out = {
        "title": None,
        "description": None,
        "lang_attr": None,
        "canonical": None,
        "og_title": None,
        "robots": None,
    }

    def walk(n: DomNode) -> None:
        if n.kind == "element":
            name = (n.name or "").lower()
            if name == "html" and out["lang_attr"] is None:
                lang = n.attrs.get("lang")
                if lang is not None and lang.strip():
                    out["lang_attr"] = lang.strip()
            elif name == "title" and out["title"] is None:
                out["title"] = _collapse_ws(_text_of(n))
            elif name == "meta":
                key = (n.attrs.get("name") or n.attrs.get("property") or "").lower()
                content = n.attrs.get("content")
                if content is None:
                    pass
                elif key == "description" and out["description"] is None:
                    out["description"] = _collapse_ws(content)
                elif key == "og:title" and out["og_title"] is None:
                    out["og_title"] = _collapse_ws(content)
                elif key == "robots" and out["robots"] is None:
                    # normalized lowercase token list — a curation
                    # pipeline must honor noindex before publishing
                    out["robots"] = ",".join(
                        t.strip().lower()
                        for t in content.split(",")
                        if t.strip()
                    ) or None
            elif name == "link":
                rels = (n.attrs.get("rel") or "").lower().split()
                href = n.attrs.get("href")
                if "canonical" in rels and href and out["canonical"] is None:
                    out["canonical"] = href.strip()
        for c in n.children:
            walk(c)

    walk(dom)
    return out


def page_metadata(html: bytes | str, xml_mode=None) -> dict:
    """Parse + extract head metadata.  `xml_mode` matches Config.xml."""
    from .api import _free_dom

    dom = parse_html(html, xml_mode=xml_mode)
    try:
        return metadata_from_dom(dom)
    finally:
        _free_dom(dom)
