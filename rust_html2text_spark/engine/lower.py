"""DOM → render-tree lowering.

Re-derives `process_dom_node` and the table lowering helpers
(/root/reference/src/lib.rs:1193-1345, 1823-2296): one dispatch rule per
HTML element family, computed styles via the CSS cascade, `display:none`
pruning, empty-element pruning, colspan-0 expansion, and `id`/`a name`
fragment markers plus CSS ::before/::after content insertion.
"""

from __future__ import annotations

from . import nodes as N
from .fold import Finished, NOTHING_SENTINEL, Pending, tree_map_reduce
from .nodes import RenderNode, RenderTableCell, RenderTableRow, RenderTable
from .styles import (
    DISPLAY_NONE,
    DISPLAY_RAW_DOM,
    ORIGIN_AGENT,
    SPEC_DEFAULT,
    ComputedStyle,
    WithSpec,
)
from .wrapped import WS_PRE


def _pending(node, cons):
    return Pending(list(node.children), cons)


def _pending_noempty(node, cons):
    def wrapped(ctx, children):
        if not children:
            return NOTHING_SENTINEL
        return cons(ctx, children)

    return Pending(list(node.children), wrapped)


CHILD_START = 0
CHILD_END = 1

import re as _re

_INT_RE = _re.compile(r"[+-]?[0-9]+\Z")


def _parse_usize(s, default):
    """Rust str::parse::<usize>().unwrap_or(default)."""
    if s is None or not _INT_RE.match(s) or s.lstrip("+").startswith("-"):
        return default
    return int(s)


def _parse_int(s, default):
    """Rust str::parse::<i64>().ok().unwrap_or(default)."""
    if s is None or not _INT_RE.match(s):
        return default
    return int(s)

_INSERTABLE = frozenset(
    {N.BLOCK, N.LIST_ITEM, N.DD, N.DT, N.DL, N.DIV, N.BLOCKQUOTE, N.CONTAINER}
)


def insert_child(new_child: RenderNode, orig: RenderNode, position: int) -> RenderNode:
    """lib.rs:1746-1821."""
    k = orig.kind
    if k in _INSERTABLE:
        if position == CHILD_START:
            orig.children.insert(0, new_child)
        else:
            orig.children.append(new_child)
        return orig
    if k == N.TABLE_CELL:
        cell = orig.extra
        if position == CHILD_START:
            cell.content.insert(0, new_child)
        else:
            cell.content.append(new_child)
        return orig
    if k == N.TABLE_ROW:
        rrow = orig.extra[0]
        if rrow.cells:
            cell = rrow.cells[0]
            if position == CHILD_START:
                cell.content.insert(0, new_child)
            else:
                cell.content.append(new_child)
        return orig
    if k in (N.TABLE_BODY, N.TABLE):
        rows = orig.extra.rows if k == N.TABLE else orig.extra
        if rows and rows[0].cells:
            cell = rows[0].cells[0]
            if position == CHILD_START:
                cell.content.insert(0, new_child)
            else:
                cell.content.append(new_child)
        return orig
    if position == CHILD_START:
        return RenderNode(N.CONTAINER, [new_child, orig])
    return RenderNode(N.CONTAINER, [orig, new_child])


_DROPPED = frozenset("link meta hr script style head".split())
_EM_TAGS = frozenset(("em", "i", "ins"))
_STRONG_TAGS = frozenset(("strong", "b"))
_STRIKE_TAGS = frozenset(("s", "del"))
_HEADERS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))


def _extract_raw_text(node) -> str:
    """Concatenated text of a subtree in document order (lib.rs:1602-1646)."""
    out = []
    stack = [node]
    while stack:
        n = stack.pop()
        if n.kind == "text":
            out.append(n.text)
        else:
            stack.extend(reversed(n.children))
    return "".join(out)


def _subtree_text_len(node) -> int:
    total = 0
    stack = [node]
    while stack:
        n = stack.pop()
        if n.kind == "text":
            total += len(n.text)
        else:
            stack.extend(n.children)
    return total


def _distribute_extra_styles(node) -> None:
    """Split a node's syntax-highlight overlays among its children by
    cumulative text offset (RenderInput::children, lib.rs:1552-1600)."""
    extra = node.extra_styles
    offset = 0
    start_idx = 0
    for child in node.children:
        end_offset = offset + (
            len(child.text) if child.kind == "text" else _subtree_text_len(child)
        )
        child_styles = []
        for es_idx in range(start_idx, len(extra)):
            (s, e), style = extra[es_idx]
            if s >= end_offset:
                break
            if e <= offset:
                start_idx = es_idx
            else:
                child_styles.append(
                    ((max(s, offset) - offset, min(e, end_offset) - offset), style)
                )
        if child_styles:
            child.extra_styles = child_styles
        offset = end_offset


def process_dom_node(context, node):
    """lib.rs:1823-2296."""
    kind = node.kind
    if kind == "document":
        return _pending(node, lambda _, cs: RenderNode(N.CONTAINER, cs))
    if kind == "comment":
        return None
    if kind == "text":
        if node.extra_styles:
            # styled sub-spans from syntax highlighting
            tstr = node.text
            nodes = []
            offset = 0
            parent_syntax = context.parent_style.syntax
            for (start, end), style in node.extra_styles:
                if start > offset:
                    nodes.append(RenderNode(N.TEXT, text=tstr[offset:start]))
                cstyle = context.parent_style.inherit()
                fg, bg = style
                cstyle.colour.maybe_update(
                    parent_syntax.important,
                    parent_syntax.origin,
                    parent_syntax.specificity,
                    fg,
                )
                if bg is not None:
                    cstyle.bg_colour.maybe_update(
                        parent_syntax.important,
                        parent_syntax.origin,
                        parent_syntax.specificity,
                        bg,
                    )
                nodes.append(
                    RenderNode(N.TEXT, text=tstr[start:end], style=cstyle)
                )
                offset = end
            if offset < len(tstr):
                nodes.append(RenderNode(N.TEXT, text=tstr[offset:]))
            if len(nodes) == 1:
                return Finished(nodes[0])
            return Finished(RenderNode(N.CONTAINER, nodes))
        return Finished(RenderNode(N.TEXT, text=node.text))
    if kind != "element":
        return None

    if node.extra_styles:
        _distribute_extra_styles(node)

    name = node.name
    if node.ns is not None and node.ns != "http://www.w3.org/1999/xhtml":
        # xml5ever parity: only XHTML-namespace elements match the HTML
        # dispatch arms (lib.rs:1934 expanded_name!(html ...)); foreign
        # elements fall to the unknown-element Container arm.  Tag-name
        # case is preserved by xmlparse.py, so `<P>` likewise falls
        # through (the dispatch below is exact-match on lowercase names).
        name = ""
    use_doc_css = context.use_doc_css
    computed = context.style_data.computed_style(
        context.parent_style, node, use_doc_css
    )
    if computed.display.val == DISPLAY_NONE:
        return None
    if computed.display.val == DISPLAY_RAW_DOM:
        # css_ext: serialize the subtree as HTML inside a pre container
        # (lib.rs:1860-1914)
        from .htmlparse import DomNode, serialize_html

        html_string = serialize_html(node)
        pre_style = computed.inherit()
        pre_style.display = WithSpec()
        pre_style.white_space.maybe_update(False, ORIGIN_AGENT, SPEC_DEFAULT, WS_PRE)
        pre_style.internal_pre = True
        text_node = DomNode("text", text=html_string)
        return Pending(
            [text_node],
            lambda _, cs: RenderNode(N.CONTAINER, cs, style=pre_style),
        )

    # css_ext: syntax highlighting (lib.rs:1917-1926)
    syntax_lang = computed.syntax.val
    if syntax_lang is not None and node.extra_styles is None:
        highlighter = context.syntax_highlighters.get(syntax_lang)
        if highlighter is not None:
            raw_text = _extract_raw_text(node)
            spans = []
            for start, end, fg, bg in highlighter(raw_text):
                spans.append(((start, end), (fg, bg)))
            spans.sort(key=lambda r: (r[0][0], r[0][1]))
            if spans:
                node.extra_styles = spans
                _distribute_extra_styles(node)

    computed_before = computed.content_before
    computed_after = computed.content_after

    frag_from_name_attr = False

    def styled(kind_, children=None, **kw):
        return RenderNode(kind_, children, style=computed, **kw)

    # dispatch arms ordered by measured tag frequency over the bench
    # corpora (a > p > headers > td > div > li > html/body > dropped
    # head/chrome tags > tr ...); the tag sets are mutually disjoint, so
    # the order is semantics-free (r07 third pass)
    if name == "a":
        frag_from_name_attr = True
        href = node.attrs.get("href")
        if href is not None:

            def cons_a(_, cs):
                if any(not c.is_shallow_empty() for c in cs):
                    return RenderNode(N.LINK, cs, text=href, style=computed)
                return NOTHING_SENTINEL

            result = _pending(node, cons_a)
        else:
            result = _pending(node, lambda _, cs: styled(N.CONTAINER, cs))
    elif name == "p":
        result = _pending_noempty(node, lambda _, cs: styled(N.BLOCK, cs))
    elif name in _HEADERS:
        level = int(name[1:])
        result = _pending(node, lambda _, cs: styled(N.HEADER, cs, value=level))
    elif name in ("th", "td"):
        result = _td_to_render_tree(node, computed)
    elif name == "div":
        result = _pending_noempty(node, lambda _, cs: styled(N.DIV, cs))
    elif name == "li":
        result = _pending(node, lambda _, cs: styled(N.LIST_ITEM, cs))
    elif name in ("html", "body"):
        result = _pending(node, lambda _, cs: styled(N.CONTAINER, cs))
    elif name in _DROPPED:
        result = None
    elif name == "tr":
        result = _tr_to_render_tree(node, computed)
    elif name == "span":
        result = _pending_noempty(node, lambda _, cs: styled(N.CONTAINER, cs))
    elif name in _EM_TAGS:
        result = _pending(node, lambda _, cs: styled(N.EM, cs))
    elif name in _STRONG_TAGS:
        result = _pending(node, lambda _, cs: styled(N.STRONG, cs))
    elif name in _STRIKE_TAGS:
        result = _pending(node, lambda _, cs: styled(N.STRIKEOUT, cs))
    elif name == "code":
        result = _pending(node, lambda _, cs: styled(N.CODE, cs))
    elif name == "img":
        title = node.attrs.get("alt") or None
        src = node.attrs.get("src") or None
        if src is not None:
            result = Finished(
                RenderNode(N.IMG, text=src, extra=title or "", style=computed)
            )
        else:
            result = None
    elif name == "svg":
        title = None
        for child in node.children:
            if child.kind == "element":
                if child.name == "title":
                    title_str = "".join(
                        sub.text for sub in child.children if sub.kind == "text"
                    )
                    title = title_str
                else:
                    break
        result = Finished(RenderNode(N.SVG, extra=title or "", style=computed))
    elif name == "sup":
        result = _pending(node, lambda _, cs: styled(N.SUP, cs))
    elif name == "pre":

        def cons_pre(_, cs):
            pre_style = computed.inherit()
            pre_style.white_space.maybe_update(False, ORIGIN_AGENT, SPEC_DEFAULT, WS_PRE)
            pre_style.internal_pre = True
            return RenderNode(N.BLOCK, cs, style=pre_style)

        result = _pending(node, cons_pre)
    elif name == "br":
        result = Finished(styled(N.BREAK))
    elif name == "wbr":
        result = Finished(RenderNode(N.TEXT, text="\u200b", style=computed))
    elif name == "table":
        result = _table_to_render_tree(node, computed)
    elif name in ("thead", "tbody"):
        result = _tbody_to_render_tree(node, computed)
    elif name == "blockquote":
        result = _pending_noempty(node, lambda _, cs: styled(N.BLOCKQUOTE, cs))
    elif name == "ul":
        result = _pending_noempty(node, lambda _, cs: styled(N.UL, cs))
    elif name == "ol":
        start = _parse_int(node.attrs.get("start"), 1)

        def cons_ol(_, cs):
            items = [n for n in cs if n.kind == N.LIST_ITEM]
            return RenderNode(N.OL, items, value=start, style=computed)

        result = _pending_noempty(node, cons_ol)
    elif name == "dl":

        def cons_dl(_, cs):
            items = [n for n in cs if n.kind in (N.DT, N.DD)]
            return RenderNode(N.DL, items, style=computed)

        result = _pending_noempty(node, cons_dl)
    elif name == "dt":
        result = _pending(node, lambda _, cs: styled(N.DT, cs))
    elif name == "dd":
        result = _pending(node, lambda _, cs: styled(N.DD, cs))
    elif name == "template":
        # html5ever stores template contents out-of-tree (template_contents,
        # not children), so the reference sees an empty unknown element and
        # drops it (pending_noempty with no children).
        result = Pending([], lambda _, cs: NOTHING_SENTINEL)
    else:
        result = _pending_noempty(node, lambda _, cs: styled(N.CONTAINER, cs))

    # ::before/::after content insertion (lib.rs:2165-2209)
    if computed_before is not None or computed_after is not None:

        def wrap_nodes(n):
            if computed_before is not None and computed_before.content.val is not None:
                n = insert_child(
                    RenderNode(N.TEXT, text=computed_before.content.val),
                    n,
                    CHILD_START,
                )
            if computed_after is not None and computed_after.content.val is not None:
                n = insert_child(
                    RenderNode(N.TEXT, text=computed_after.content.val),
                    n,
                    CHILD_END,
                )
            return n

        result = _map_result(result, wrap_nodes, none_passthrough=True)

    # fragment start markers (lib.rs:2211-2240)
    fragment = node.attrs.get("id")
    if fragment is None and frag_from_name_attr:
        fragment = node.attrs.get("name")
    if fragment is not None:
        fragname = fragment
        if result is None:
            return Finished(RenderNode(N.FRAG_START, text=fragname))
        if isinstance(result, Finished):
            return Finished(
                insert_child(
                    RenderNode(N.FRAG_START, text=fragname), result.result, CHILD_START
                )
            )

        old_cons = result.cons

        def frag_cons(ctx, ch):
            fragnode = RenderNode(N.FRAG_START, text=fragname)
            out = old_cons(ctx, ch)
            if out is NOTHING_SENTINEL:
                return fragnode
            return insert_child(fragnode, out, CHILD_START)

        result.cons = frag_cons
    return result


def _map_result(result, f, none_passthrough=False):
    if result is None:
        return None
    if isinstance(result, Finished):
        return Finished(f(result.result))
    old_cons = result.cons

    def new_cons(ctx, ch):
        out = old_cons(ctx, ch)
        if out is NOTHING_SENTINEL:
            return NOTHING_SENTINEL
        return f(out)

    result.cons = new_cons
    return result


def _table_to_render_tree(node, computed):
    """lib.rs:1193-1216."""

    def cons(_, rowset):
        rows = []
        for bodynode in rowset:
            if bodynode.kind == N.TABLE_BODY:
                rows.extend(bodynode.extra)
        if not rows:
            return NOTHING_SENTINEL
        return RenderNode(N.TABLE, extra=RenderTable(rows), style=computed)

    return _pending(node, cons)


def _tbody_to_render_tree(node, computed):
    """lib.rs:1219-1269 (incl. colspan=0 expansion)."""

    def cons(_, rowchildren):
        rows = [rn.extra[0] for rn in rowchildren if rn.kind == N.TABLE_ROW]
        num_columns = []
        for row in rows:
            has_zero = False
            span_sum = 0
            for cell in row.cells:
                has_zero = has_zero or cell.colspan == 0
                span_sum += max(cell.colspan, 1)
            num_columns.append((has_zero, span_sum))
        max_columns = max((s for _, s in num_columns), default=1)
        for i, (has_zero, num_cols) in enumerate(num_columns):
            if has_zero:
                for cell in rows[i].cells:
                    if cell.colspan == 0:
                        cell.colspan = max_columns - num_cols + 1
        return RenderNode(N.TABLE_BODY, extra=rows, style=computed)

    def wrapped(ctx, children):
        if not children:
            return NOTHING_SENTINEL
        return cons(ctx, children)

    return Pending(list(node.children), wrapped)


def _tr_to_render_tree(node, computed):
    """lib.rs:1272-1302."""

    def cons(_, cellnodes):
        cells = [cn.extra for cn in cellnodes if cn.kind == N.TABLE_CELL]
        row = RenderTableRow(cells, computed)
        return RenderNode(N.TABLE_ROW, extra=(row, False), style=computed)

    return _pending(node, cons)


def _td_to_render_tree(node, computed):
    """lib.rs:1305-1340."""
    colspan = _parse_usize(node.attrs.get("colspan"), 1)
    rowspan = _parse_usize(node.attrs.get("rowspan"), 1)

    def cons(_, children):
        cell = RenderTableCell(colspan, rowspan, children, computed)
        return RenderNode(N.TABLE_CELL, extra=cell, style=computed)

    return _pending(node, cons)


def dom_to_render_tree(dom, context):
    """lib.rs:1662-1684."""
    if context.use_doc_css:
        from . import cssparse

        doc_style = _extract_doc_styles(dom)
        doc_style.merge(context.style_data)
        context.style_data = doc_style

    return tree_map_reduce(context, dom, process_dom_node)


def _extract_doc_styles(dom):
    """css.rs:717-812 — collect <style> text into author rules."""
    from . import cssparse
    from .styles import StyleData

    texts: list[str] = []
    stack = [dom]
    while stack:
        node = stack.pop()
        if (
            node.kind == "element"
            and node.name == "style"
            and (node.ns is None or node.ns == "http://www.w3.org/1999/xhtml")
        ):
            texts.append(
                "".join(c.text for c in node.children if c.kind == "text")
            )
            continue
        stack.extend(reversed(node.children))
    result = StyleData()
    for css in texts:
        try:
            cssparse.add_css(result.author_rules, css, allow_extensions=False)
        except Exception:
            pass
    return result
