"""ANSI terminal colour map for `--colour` output.

Mirror of the reference CLI's `default_colour_map`
(/root/reference/html2text-cli/src/main.rs:13-92): rich annotations become
ANSI escape sequences; explicit CSS colours (when enabled) suppress the
default per-annotation foreground colours.  The escape sequences are the
ones termion emits (`\\x1b[38;5;Nm` for named colours, `\\x1b[38;2;r;g;bm`
for RGB), so output matches the reference byte-for-byte on common inputs.
"""

from __future__ import annotations

# termion::style
_UNDERLINE = "\x1b[4m"
_BOLD = "\x1b[1m"
_STYLE_RESET = "\x1b[m"
# termion::color::Fg / Bg
_FG_BLUE = "\x1b[38;5;4m"
_FG_LIGHT_YELLOW = "\x1b[38;5;11m"
_FG_LIGHT_BLACK = "\x1b[38;5;8m"
_FG_RESET = "\x1b[39m"
_BG_RESET = "\x1b[49m"


def _fg_rgb(c) -> str:
    r, g, b = c
    return f"\x1b[38;2;{r};{g};{b}m"


def _bg_rgb(c) -> str:
    r, g, b = c
    return f"\x1b[48;2;{r};{g};{b}m"


def default_colour_map(
    annotations,
    s: str,
    use_css_colours: bool = True,
    no_default_colours: bool = False,
) -> str:
    """main.rs:13-92.  `use_css_colours` is `not --ignore-css-colour`;
    `no_default_colours` is `--only-css`."""
    have_explicit_colour = no_default_colours
    start: list[str] = []
    finish: list[str] = []
    for ann in annotations:
        kind = ann[0]
        if kind == "Default":
            pass
        elif kind == "Link":
            start.append(_UNDERLINE)
            finish.append(_STYLE_RESET)
        elif kind == "Image":
            if not have_explicit_colour:
                start.append(_FG_BLUE)
                finish.append(_FG_RESET)
        elif kind == "Emphasis":
            start.append(_BOLD)
            finish.append(_STYLE_RESET)
        elif kind == "Strong":
            if not have_explicit_colour:
                start.append(_FG_LIGHT_YELLOW)
                finish.append(_FG_RESET)
        elif kind == "Strikeout":
            if not have_explicit_colour:
                start.append(_FG_LIGHT_BLACK)
                finish.append(_FG_RESET)
        elif kind == "Code":
            if not have_explicit_colour:
                start.append(_FG_BLUE)
                finish.append(_FG_RESET)
        elif kind == "Preformat":
            if not have_explicit_colour:
                start.append(_FG_BLUE)
                finish.append(_FG_RESET)
        elif kind == "Colour":
            if use_css_colours:
                start.append(_fg_rgb(ann[1]))
                finish.append(_FG_RESET)
                have_explicit_colour = True
        elif kind == "BgColour":
            if use_css_colours:
                start.append(_bg_rgb(ann[1]))
                finish.append(_BG_RESET)
    finish.reverse()
    return "".join(start) + s + "".join(finish)
