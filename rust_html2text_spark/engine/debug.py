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
