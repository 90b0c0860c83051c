"""Text decorators: Plain, Trivial, Rich.

Re-derives the three reference decorators
(/root/reference/src/render/text_renderer.rs:2296-2596).  Annotations are
plain tuples so that lists of them compare exactly like the Rust
`Vec<Annotation>` (for the plain/trivial decorators the annotation is the
unit value `()`, so tag equality degenerates to stack depth — preserved
here).
"""

from __future__ import annotations

from .taggedline import TaggedLine

# Rich annotation constructors (tuples): ("Default",), ("Link", url),
# ("Image", src), ("Emphasis",), ("Strong",), ("Strikeout",), ("Code",),
# ("Preformat", cont: bool), ("Colour", (r,g,b)), ("BgColour", (r,g,b)).
RICH_DEFAULT = ("Default",)
UNIT = ()


class PlainDecorator:
    annotation_default = UNIT

    def decorate_link_start(self, url):
        return ("[", UNIT)

    def decorate_link_end(self):
        return "]"

    def decorate_em_start(self):
        return ("", UNIT)

    def decorate_em_end(self):
        return ""

    def decorate_strong_start(self):
        return ("", UNIT)

    def decorate_strong_end(self):
        return ""

    def decorate_strikeout_start(self):
        return ("", UNIT)

    def decorate_strikeout_end(self):
        return ""

    def decorate_code_start(self):
        return ("", UNIT)

    def decorate_code_end(self):
        return ""

    def decorate_preformat_first(self):
        return UNIT

    def decorate_preformat_cont(self):
        return UNIT

    def decorate_image(self, src, title):
        return (f"[{title}]", UNIT)

    def header_prefix(self, level):
        return "#" * level + " "

    def quote_prefix(self):
        return "> "

    def unordered_item_prefix(self):
        return "* "

    def ordered_item_prefix(self, i):
        return f"{i}. "

    def decorate_superscript_start(self):
        return ("^{", self.annotation_default)

    def decorate_superscript_end(self):
        return "}"

    def make_subblock_decorator(self):
        return self.__class__()

    def push_colour(self, colour):
        return None

    def pop_colour(self):
        return False

    def push_bgcolour(self, colour):
        return None

    def pop_bgcolour(self):
        return False

    def finalise(self, urls):
        return [
            TaggedLine.from_string(f"[{idx + 1}]: {s}", self.annotation_default)
            for idx, s in enumerate(urls)
        ]


class TrivialDecorator(PlainDecorator):
    def decorate_link_start(self, url):
        return ("", UNIT)

    def decorate_link_end(self):
        return ""

    def decorate_image(self, src, title):
        return (title, UNIT)

    def header_prefix(self, level):
        return ""

    def quote_prefix(self):
        return ""

    def unordered_item_prefix(self):
        return ""

    def ordered_item_prefix(self, i):
        return ""


class RichDecorator(PlainDecorator):
    annotation_default = RICH_DEFAULT

    def decorate_link_start(self, url):
        return ("", ("Link", url))

    def decorate_link_end(self):
        return ""

    def decorate_em_start(self):
        return ("", ("Emphasis",))

    def decorate_strong_start(self):
        return ("", ("Strong",))

    def decorate_strikeout_start(self):
        return ("", ("Strikeout",))

    def decorate_code_start(self):
        return ("", ("Code",))

    def decorate_preformat_first(self):
        return ("Preformat", False)

    def decorate_preformat_cont(self):
        return ("Preformat", True)

    def decorate_image(self, src, title):
        return (title, ("Image", src))

    def push_colour(self, colour):
        return ("Colour", colour)

    def pop_colour(self):
        return True

    def push_bgcolour(self, colour):
        return ("BgColour", colour)

    def pop_bgcolour(self):
        return True


DECORATORS = {
    "plain": PlainDecorator,
    "trivial": TrivialDecorator,
    "rich": RichDecorator,
}
