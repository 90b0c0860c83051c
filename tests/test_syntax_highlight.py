"""css_ext syntax highlighting: `x-syntax` + registered highlighter
(reference css_ext_tests::syntax_pre_em, tests.rs:3698-3720; machinery at
lib.rs:1533-1659, 1917-1926, 2242-2289)."""

from __future__ import annotations

from rust_html2text_spark.engine.api import Config, html_to_coloured, html_to_lines


def all_blue(text):
    return [(0, len(text), (0, 0, 255), None)]


def first_word_red(text):
    end = text.find(" ")
    if end < 0:
        end = len(text)
    return [(0, end, (255, 0, 0), None)]


def colour_map(tags, s):
    for ann in tags:
        if ann[0] == "Colour":
            r, g, b = ann[1]
            return f"<{r:02x}{g:02x}{b:02x}>{s}</>"
    return s


def cfg(highlighter):
    return Config(
        decorator="rich",
        use_doc_css=True,
        add_agent_css=["pre { x-syntax: syn; }"],
        syntax_highlighters={"syn": highlighter},
    )


def test_syntax_pre_em_all_blue():
    """Mirror of syntax_pre_em: both the plain text and the text inside the
    nested <em> get the highlight colour."""
    out = html_to_coloured(
        b"<pre>Hi <em>there</em></pre>", 80, colour_map, cfg(all_blue)
    )
    assert out == "<0000ff>Hi </><0000ff>there</>\n"


def test_syntax_partial_span_split():
    """A highlight covering only part of a text node splits it into styled
    and unstyled sub-spans."""
    out = html_to_coloured(
        b"<pre>red rest of line</pre>", 80, colour_map, cfg(first_word_red)
    )
    assert out == "<ff0000>red</> rest of line\n"


def test_syntax_spans_cross_elements():
    """Offsets are distributed through nested elements by text position."""

    def mid(text):
        # highlight "b <em>c" region: chars 2..5 of "a b c d"
        return [(2, 5, (0, 255, 0), None)]

    out = html_to_coloured(
        b"<pre>a <em>b c</em> d</pre>", 80, colour_map, cfg(mid)
    )
    assert out == "a <00ff00>b c</> d\n"


def test_syntax_unregistered_language_ignored():
    lines = html_to_lines(
        b"<pre>plain</pre>",
        80,
        Config(decorator="rich", add_agent_css=["pre { x-syntax: nosuch; }"]),
    )
    spans = [(ts.s, ts.tag) for l in lines for ts in l.tagged_strings()]
    assert spans == [("plain", (("Preformat", False),))]


def test_syntax_not_from_doc_css():
    """x-syntax in document <style> is ignored (author CSS parses without
    extensions, css.rs:509 add_author_css allow_extensions=false)."""
    out = html_to_coloured(
        b"<style>pre { x-syntax: syn; }</style><pre>Hi</pre>",
        80,
        colour_map,
        Config(
            decorator="rich",
            use_doc_css=True,
            syntax_highlighters={"syn": all_blue},
        ),
    )
    assert out == "Hi\n"


def test_x_raw_dom():
    """display: x-raw-dom serializes the subtree as HTML in a pre block
    (lib.rs:1860-1914); extensions honoured from user CSS only."""
    from rust_html2text_spark.engine.api import html_to_text

    config = Config(add_css=["div.raw { display: x-raw-dom; }"])
    out = html_to_text(
        b'<p>before</p><div class="raw"><b title="x&y">hi</b> &amp; bye</div>',
        80,
        config,
    )
    assert out == 'before\n\n<div class="raw"><b title="x&amp;y">hi</b> &amp; bye</div>\n'

    # from document CSS it is ignored (author CSS parses without extensions)
    config2 = Config(use_doc_css=True)
    out2 = html_to_text(
        b'<style>div { display: x-raw-dom; }</style><div><b>hi</b></div>',
        80,
        config2,
    )
    assert out2 == "**hi**\n" or out2 == "hi\n"
