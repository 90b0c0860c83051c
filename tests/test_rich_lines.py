"""Rich-line output tests: fragment markers and annotated spans
(reference tests.rs frag_simple/frag_list at 2768-2816, plus rich
annotation spot checks)."""

from __future__ import annotations

from rust_html2text_spark.engine.api import html_to_lines, plain_config, rich_config
from rust_html2text_spark.engine.taggedline import FragmentStart, TaggedString


def line_elements(line):
    out = []
    for e in line.v:
        if isinstance(e, TaggedString):
            out.append(("str", e.s, e.tag))
        elif isinstance(e, FragmentStart):
            out.append(("frag", e.name))
    return out


def test_frag_simple():
    lines = html_to_lines(b'<p id="my_id">Hi</p>', 10, plain_config())
    assert [line_elements(l) for l in lines] == [
        [("frag", "my_id"), ("str", "Hi", ())]
    ]


def test_frag_list():
    html = b"""<ul id="my_id">
            <li>One</li>
            <li>Two</li>
        </ul>"""
    lines = html_to_lines(html, 10, plain_config())
    assert [line_elements(l) for l in lines] == [
        [("frag", "my_id"), ("str", "* One", ())],
        [("str", "* Two", ())],
    ]


def test_rich_annotations_link():
    lines = html_to_lines(b'<p>go <a href="http://x/">there</a></p>', 80, rich_config())
    spans = [(ts.s, ts.tag) for l in lines for ts in l.tagged_strings()]
    assert spans == [("go ", ()), ("there", (("Link", "http://x/"),))]


def test_rich_annotations_nested():
    lines = html_to_lines(b"<p><em>a<strong>b</strong></em></p>", 80, rich_config())
    spans = [(ts.s, ts.tag) for l in lines for ts in l.tagged_strings()]
    assert spans == [
        ("a", (("Emphasis",),)),
        ("b", (("Emphasis",), ("Strong",))),
    ]


def test_render_tree_dump_shape():
    """Dump format mirrors the reference Display (css_ext_tests::render_1:
    Container(Container(Container(Block[Text])))."""
    from rust_html2text_spark.engine.debug import show_render_tree
    from rust_html2text_spark.engine.api import Config

    dump = show_render_tree(
        b'<p style="color: red">Hi</p>', Config(decorator="rich", use_doc_css=True)
    )
    assert dump == (
        "Render tree:\n"
        " Container:\n"
        "  Container:\n"
        "   Container:\n"
        "    [Style: colour=(255, 0, 0)\n"
        "    Block:\n"
        '     "Hi"\n'
    )


def test_rich_lines_whole_corpus_no_crash():
    """The annotated-lines path must handle every golden fixture: line text
    joined must equal the plain rendering of the rich config."""
    import json
    from pathlib import Path

    from rust_html2text_spark.engine.api import _render
    from rust_html2text_spark.engine.errors import RenderError

    fixtures = json.loads(
        (Path(__file__).parent / "fixtures/goldens.json").read_text()
    )["fixtures"]
    checked = 0
    for f in fixtures:
        if "expected" not in f:
            continue
        html = f["html"].encode("utf-8")
        try:
            lines = html_to_lines(html, f["width"], rich_config())
        except RenderError:
            continue
        # border lines squash to box-drawing strings; text joins losslessly
        rendered = "".join(l.to_string() + "\n" for l in lines)
        plain = _render(html, f["width"], rich_config()).into_string()
        assert rendered == plain, f["name"]
        checked += 1
    assert checked > 180
