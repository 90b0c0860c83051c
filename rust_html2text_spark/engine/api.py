"""Public engine API.

Re-derives the reference's `Config` builder and entry points
(/root/reference/src/lib.rs:2917-3343, 3413-3446): `html_to_text` is
`from_read`/`Config::string_from_read`, `html_to_lines` is
`from_read_rich`/`lines_from_read`, and `html_to_coloured` is
`from_read_coloured` (/root/reference/src/ansi_colours.rs:19-29).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .decorators import DECORATORS, PlainDecorator
from .errors import Fail, TooNarrow  # noqa: F401  (re-export)
from .htmlparse import parse_html
from .lower import dom_to_render_tree
from .render import render_tree_to_string
from .styles import StyleData, DEFAULT_STYLE, do_decorate_rules
from .subrender import IMG_IGNORE_EMPTY, RenderOptions, SubRenderer

MIN_WIDTH = 3  # lib.rs:419


@dataclass
class Config:
    """Mirror of the reference Config (lib.rs:2917-2944)."""

    decorator: str = "plain"
    max_wrap_width: int | None = None
    use_doc_css: bool = False
    pad_block_width: bool = False
    allow_width_overflow: bool = False
    min_wrap_width: int = MIN_WIDTH
    raw: bool = False
    draw_borders: bool = True
    fence_tables: bool = False
    wrap_links: bool = True
    link_footnotes: bool = False
    unicode_strikeout: bool = True
    image_mode: str = IMG_IGNORE_EMPTY
    image_replace: str = ""
    do_decorate: bool = False
    xml: bool | None = None  # None = auto-sniff
    add_css: list = field(default_factory=list)
    add_agent_css: list = field(default_factory=list)
    # css_ext: name → highlighter(text) -> list[(start, end, fg, bg|None)]
    syntax_highlighters: dict = field(default_factory=dict)

    def build_style_data(self) -> StyleData:
        # cached: a Config is reused across a whole Arrow batch of documents
        cached = getattr(self, "_style_cache", None)
        if cached is not None:
            return cached
        from . import cssparse

        sd = StyleData()
        if self.do_decorate:
            sd.agent_rules.extend(do_decorate_rules())
        for css in self.add_agent_css:
            cssparse.add_css(sd.agent_rules, css, allow_extensions=True)
        for css in self.add_css:
            cssparse.add_css(sd.user_rules, css, allow_extensions=True)
        object.__setattr__(self, "_style_cache", sd)
        return sd

    def make_decorator(self):
        return DECORATORS[self.decorator]()

    def render_options(self) -> RenderOptions:
        return RenderOptions(
            wrap_width=self.max_wrap_width,
            allow_width_overflow=self.allow_width_overflow,
            pad_block_width=self.pad_block_width,
            raw=self.raw,
            draw_borders=self.draw_borders,
            fence_tables=self.fence_tables,
            wrap_links=self.wrap_links,
            include_link_footnotes=self.link_footnotes,
            use_unicode_strikeout=self.unicode_strikeout,
            img_mode=self.image_mode,
            img_replace=self.image_replace,
        )


def plain_config() -> Config:
    """config::plain() (lib.rs:3308-3313)."""
    return Config(decorator="plain", do_decorate=True, link_footnotes=True)


def plain_no_decorate_config() -> Config:
    return Config(decorator="plain")


def rich_config() -> Config:
    return Config(decorator="rich")


class _HtmlContext:
    """HtmlContext (lib.rs:1486-1509)."""

    __slots__ = (
        "style_data",
        "use_doc_css",
        "max_wrap_width",
        "pad_block_width",
        "allow_width_overflow",
        "min_wrap_width",
        "raw",
        "draw_borders",
        "fence_tables",
        "wrap_links",
        "include_link_footnotes",
        "use_unicode_strikeout",
        "image_mode",
        "parent_style",
        "syntax_highlighters",
    )

    def __init__(self, config: Config):
        self.style_data = config.build_style_data()
        self.use_doc_css = config.use_doc_css
        self.max_wrap_width = config.max_wrap_width
        self.pad_block_width = config.pad_block_width
        self.allow_width_overflow = config.allow_width_overflow
        self.min_wrap_width = config.min_wrap_width
        self.raw = config.raw
        self.draw_borders = config.draw_borders
        self.fence_tables = config.fence_tables
        self.wrap_links = config.wrap_links
        self.include_link_footnotes = config.link_footnotes
        self.use_unicode_strikeout = config.unicode_strikeout
        self.image_mode = config.image_mode
        self.parent_style = DEFAULT_STYLE
        self.syntax_highlighters = config.syntax_highlighters


def _free_dom(dom) -> None:
    """Break the DOM's parent back-pointers so the tree dies by refcount
    instead of waiting for the cyclic GC (hot-path allocation tax)."""
    stack = [dom]
    while stack:
        node = stack.pop()
        node.parent = None
        stack.extend(node.children)


def _render(html: bytes | str, width: int, config: Config) -> SubRenderer:
    context = _HtmlContext(config)
    dom = parse_html(html, xml_mode=config.xml)
    try:
        render_tree = dom_to_render_tree(dom, context)
    finally:
        _free_dom(dom)
    if render_tree is None:
        raise Fail("no render tree")
    if width == 0:
        raise TooNarrow()
    decorator = config.make_decorator()
    test_decorator = decorator.make_subblock_decorator()
    builder = SubRenderer(width, config.render_options(), decorator)
    return render_tree_to_string(context, builder, test_decorator, render_tree)


def html_to_text(html: bytes | str, width: int, config: Config | None = None) -> str:
    """from_read (lib.rs:3430-3435): plain config unless overridden."""
    if config is None:
        config = plain_config()
    return _render(html, width, config).into_string()


def parse(html: bytes | str, config: Config | None = None):
    """Config::parse_html (lib.rs:3011-3034): parse once, render many.

    Returns the DOM; pass it to `dom_to_tree` + `render_to_string` /
    `render_to_lines` to render at several widths or with several
    decorators without re-parsing (the reference's RenderTree is consumed
    by rendering, so per-render lowering is the reference contract too)."""
    if config is None:
        config = plain_config()
    return parse_html(html, xml_mode=config.xml)


def dom_to_tree(dom, config: Config | None = None):
    """Config::dom_to_render_tree (lib.rs:3036-3045)."""
    if config is None:
        config = plain_config()
    tree = dom_to_render_tree(dom, _HtmlContext(config))
    if tree is None:
        raise Fail("no render tree")
    return tree


def _render_tree(tree, width: int, config: Config) -> SubRenderer:
    if width == 0:
        raise TooNarrow()
    decorator = config.make_decorator()
    builder = SubRenderer(width, config.render_options(), decorator)
    return render_tree_to_string(
        _HtmlContext(config), builder, decorator.make_subblock_decorator(), tree
    )


def render_to_string(tree, width: int, config: Config | None = None) -> str:
    """Config::render_to_string (lib.rs:3047-3057).  Like the reference
    (which takes the RenderTree by value), the tree is consumed — build a
    fresh one per render via `dom_to_tree`."""
    if config is None:
        config = plain_config()
    return _render_tree(tree, width, config).into_string()


def render_to_lines(tree, width: int, config: Config | None = None):
    """Config::render_to_lines (lib.rs:3059-3075)."""
    if config is None:
        config = rich_config()
    renderer = _render_tree(tree, width, config)
    return [line.into_tagged_line() for line in renderer.into_lines()]


def html_to_lines(html: bytes | str, width: int, config: Config | None = None):
    """lines_from_read (lib.rs:3092-3101): list of TaggedLine."""
    if config is None:
        config = rich_config()
    renderer = _render(html, width, config)
    return [line.into_tagged_line() for line in renderer.into_lines()]


def html_to_coloured(html, width, colour_map, config: Config | None = None) -> str:
    """Config::coloured (lib.rs:3268-3300)."""
    if config is None:
        config = rich_config()
    lines = html_to_lines(html, width, config)
    out = []
    for line in lines:
        for ts in line.tagged_strings():
            out.append(colour_map(ts.tag, ts.s))
        out.append("\n")
    return "".join(out)
