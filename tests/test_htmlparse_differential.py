"""Differential test: the fast single-pass tokenizer must build the exact
same DOM as the stdlib HTMLParser driver over randomized tag soup."""

from __future__ import annotations

import random

from rust_html2text_spark.engine.htmlparse import parse_html


def dump(node):
    if node.kind == "text":
        return ("text", node.text)
    if node.kind == "comment":
        return ("comment", node.text)
    return (
        node.kind,
        node.name,
        tuple(sorted(node.attrs.items())),
        tuple(dump(c) for c in node.children),
    )


PIECES = [
    "<p>", "</p>", "<div class='a b'>", "</div>", "<a href=\"x&amp;y\">",
    "</a>", "<br>", "<br/>", "<img src=u alt='A &lt;B'>", "text & more ",
    "&amp; &lt; &#65; &#x41; &nbsp; &unknown; &unknown ", "<table><tr><td>",
    "</td></tr></table>", "<ul><li>item", "</ul>", "<!-- comment -->",
    "<!-- unterminated", "<!DOCTYPE html>", "<?pi data?>", "<![CDATA[x]]>",
    "<script>if (a<b && c>d) {}</script>", "<style>p>a { }</style>",
    "<em a=1 b = '2' c>", "</em>", "< notatag", "<>", "</>", "<3",
    "plain text", "<span title='q\"r'>", "</span>", "<h1>", "</h2>",
    "<input type=text value=>", "<b", "<foo bar", "tail",
    "<svg><title>t</title></svg>", "<pre>  sp  </pre>",
]


def test_fast_tokenizer_differential():
    rng = random.Random(99)
    for trial in range(500):
        html = "".join(rng.choice(PIECES) for _ in range(rng.randint(1, 25)))
        fast = dump(parse_html(html, fast=True))
        slow = dump(parse_html(html, fast=False))
        assert fast == slow, html


def test_fast_tokenizer_fixture_corpus():
    import json
    from pathlib import Path

    fixtures = json.loads(
        (Path(__file__).parent / "fixtures/goldens.json").read_text()
    )["fixtures"]
    for f in fixtures:
        html = f["html"]
        assert dump(parse_html(html, fast=True)) == dump(
            parse_html(html, fast=False)
        ), f["name"]
