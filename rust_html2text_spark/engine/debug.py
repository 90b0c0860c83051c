"""Debug dumps of the intermediate representations.

Mirrors the reference's render-tree Display format
(/root/reference/src/lib.rs:1068-1128 write_self / RenderTree Display at
lib.rs:3346-3352) and the CLI `--show-dom` / `--show-render` debug outputs
(html2text-cli/src/main.rs:202-212)."""

from __future__ import annotations

from . import nodes as N


def _dq(s: str) -> str:
    """Rust-style {:?} debug quoting (subset)."""
    out = ['"']
    for c in s:
        if c == '"':
            out.append('\\"')
        elif c == "\\":
            out.append("\\\\")
        elif c == "\n":
            out.append("\\n")
        elif c == "\r":
            out.append("\\r")
        elif c == "\t":
            out.append("\\t")
        else:
            out.append(c)
    out.append('"')
    return "".join(out)


def _style_str(style) -> str:
    parts = []
    if style.colour.val is not None:
        parts.append(f" colour={style.colour.val}")
    if style.bg_colour.val is not None:
        parts.append(f" bg_colour={style.bg_colour.val}")
    if style.display.val is not None:
        parts.append(f" disp={style.display.val}")
    if style.white_space.val is not None:
        ws = {0: "Normal", 1: "Pre", 2: "PreWrap"}[style.white_space.val]
        parts.append(f" white_space={ws}")
    if style.internal_pre:
        parts.append(" internal_pre")
    return "".join(parts)


def _write(node, out: list[str], indent: int) -> None:
    pad = " " * indent
    ss = _style_str(node.style)
    if ss:
        out.append(f"{pad}[Style:{ss}")
    k = node.kind
    if k == N.TEXT:
        out.append(f"{pad}{_dq(node.text)}")
        return
    if k == N.IMG:
        out.append(f"{pad}Img src={_dq(node.text)} title={_dq(node.extra)}:")
        return
    if k == N.SVG:
        out.append(f"{pad}Svg title={_dq(node.extra)}:")
        return
    if k == N.BREAK:
        out.append(f"{pad}Break")
        return
    if k == N.FRAG_START:
        out.append(f"{pad}FragStart({node.text}):")
        return
    if k == N.TABLE:
        table = node.extra
        out.append(f"{pad}Table ({table.num_columns} cols):")
        for row in table.rows:
            rss = _style_str(row.style)
            if rss:
                out.append(f"{pad} [Style:{rss}")
            out.append(f"{pad} Row ({len(row.cells)} cells):")
            for cell in row.cells:
                css_ = _style_str(cell.style)
                if css_:
                    out.append(f"{pad}  [Style:{css_}")
                out.append(
                    f"{pad}  Cell colspan={cell.colspan} width={cell.col_width}:"
                )
                for child in cell.content:
                    _write(child, out, indent + 3)
        return
    if k == N.LINK:
        label = f"Link({node.text})"
    elif k == N.HEADER:
        label = f"Header({node.value})"
    elif k == N.OL:
        label = f"Ol({node.value})"
    else:
        label = k
    out.append(f"{pad}{label}:")
    for child in node.children:
        _write(child, out, indent + 1)


def dump_render_tree(tree) -> str:
    """RenderTree Display (lib.rs:3346-3352)."""
    out = ["Render tree:"]
    _write(tree, out, 1)
    return "\n".join(out) + "\n"


def dump_dom(node, indent: int = 0) -> str:
    out = []

    def walk(n, ind):
        pad = " " * ind
        if n.kind == "text":
            out.append(f"{pad}#text {_dq(n.text)}")
        elif n.kind == "comment":
            out.append(f"{pad}#comment {_dq(n.text or '')}")
        else:
            attrs = "".join(f' {k}="{v}"' for k, v in n.attrs.items())
            out.append(f"{pad}{n.name or '#document'}{attrs}")
        for c in n.children:
            walk(c, ind + 1)

    walk(node, indent)
    return "\n".join(out) + "\n"


def _selector_component_str(comp) -> str:
    """css.rs:63-85 (Display for SelectorComponent)."""
    from .styles import (
        C_ATTR,
        C_CLASS,
        C_COMB_CHILD,
        C_COMB_DESC,
        C_ELEMENT,
        C_HASH,
        C_NTH_CHILD,
        C_STAR,
    )

    k = comp.kind
    if k == C_CLASS:
        return f".{comp.name}"
    if k == C_ELEMENT:
        return f"{comp.name}"
    if k == C_HASH:
        return f"#{comp.name or comp.value}"
    if k == C_STAR:
        return " * "
    if k == C_COMB_CHILD:
        return " > "
    if k == C_COMB_DESC:
        return " "
    if k == C_NTH_CHILD:
        return f":nth-child({comp.a}n+{comp.b})"
    if k == C_ATTR:
        if comp.op_equal:
            return f'[{comp.name} = "{comp.value}"]'
        return f"[{comp.name}]"
    return "?"


def _selector_str(sel) -> str:
    """css.rs:94-107: components print right-to-left (stored leaf-first)."""
    s = "".join(_selector_component_str(c) for c in reversed(sel.components))
    if sel.pseudo_element == "before":
        s += "::before"
    elif sel.pseudo_element == "after":
        s += "::after"
    return s


def _style_decl_str(decl) -> str:
    """css.rs:308-341 (Display for StyleDecl)."""
    from .styles import (
        DISPLAY_NONE,
        DISPLAY_RAW_DOM,
        S_BG_COLOUR,
        S_COLOUR,
        S_CONTENT,
        S_DISPLAY,
        S_SYNTAX,
        S_WHITE_SPACE,
        WS_NORMAL,
        WS_PRE,
        WS_PRE_WRAP,
    )

    k = decl.kind
    if k == S_COLOUR:
        r, g, b = decl.value
        s = f"color: #{r:02x}{g:02x}{b:02x}"
    elif k == S_BG_COLOUR:
        r, g, b = decl.value
        s = f"background-color: #{r:02x}{g:02x}{b:02x}"
    elif k == S_DISPLAY:
        s = (
            "display: none"
            if decl.value == DISPLAY_NONE
            else "display: x-raw-dom"
            if decl.value == DISPLAY_RAW_DOM
            else f"display: {decl.value}"
        )
    elif k == S_WHITE_SPACE:
        ws = {WS_NORMAL: "normal", WS_PRE: "pre", WS_PRE_WRAP: "pre-wrap"}
        s = f"white-space: {ws.get(decl.value, decl.value)}"
    elif k == S_CONTENT:
        s = f'content: "{decl.value}"'
    elif k == S_SYNTAX:
        s = f"x-syntax: {decl.value}"
    else:
        s = "?"
    if decl.important:
        s += " !important"
    return s


def dump_parsed_style(html, config=None) -> str:
    """CLI --show-css: the document's parsed stylesheet, formatted like the
    reference's `dom_to_parsed_style` (lib.rs:1687-1693) / StyleData
    Display (css.rs:693-715) — agent, then user, then author rules."""
    from .api import Config, _HtmlContext
    from .htmlparse import parse_html
    from .lower import _extract_doc_styles

    if config is None:
        from .api import plain_config

        config = plain_config()
    context = _HtmlContext(config)
    dom = parse_html(html, xml_mode=config.xml)
    style_data = _extract_doc_styles(dom)
    style_data.merge(context.style_data)

    out: list[str] = []
    for title, rules in (
        ("Agent rules:", style_data.agent_rules),
        ("User rules:", style_data.user_rules),
        ("Author rules:", style_data.author_rules),
    ):
        if not rules:
            continue
        out.append(title)
        for rule in rules:
            out.append(f"  {_selector_str(rule.selector)} {{")
            for decl in rule.styles:
                out.append(f"    {_style_decl_str(decl)}")
            out.append("  }")
    return "\n".join(out) + ("\n" if out else "")


def show_render_tree(html, config=None) -> str:
    """Parse + lower and return the render-tree dump (CLI --show-render)."""
    from .api import Config, _HtmlContext
    from .htmlparse import parse_html
    from .lower import dom_to_render_tree

    if config is None:
        from .api import plain_config

        config = plain_config()
    context = _HtmlContext(config)
    dom = parse_html(html, xml_mode=config.xml)
    tree = dom_to_render_tree(dom, context)
    if tree is None:
        return "Render tree:\n"
    return dump_render_tree(tree)
