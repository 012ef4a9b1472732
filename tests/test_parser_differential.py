"""Differential test: the regex tokenizer in extract.parse_blocks must
produce the same block list as stdlib html.parser driving the same
_BlockParser handlers, over generated well-formed HTML and the fixture
pages.  (The stdlib path is the slow reference; production uses the
tokenizer.)"""

from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from doclayout_yolo_spark.extract import _BlockParser, parse_blocks
from doclayout_yolo_spark.fixtures import make_page


class _StdlibDriver(HTMLParser):
    """html.parser front-end feeding the same block builder."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.b = _BlockParser()

    def handle_starttag(self, tag, attrs):
        self.b.handle_starttag(tag, attrs)

    def handle_startendtag(self, tag, attrs):
        self.b.handle_starttag(tag, attrs)
        self.b.handle_endtag(tag)

    def handle_endtag(self, tag):
        self.b.handle_endtag(tag)

    def handle_data(self, data):
        self.b.handle_data(data)


def stdlib_blocks(html: bytes):
    d = _StdlibDriver()
    d.feed(html.decode("utf-8", errors="replace"))
    d.close()
    d.b.close()
    return d.b.blocks


def _assert_same(html: bytes):
    got = parse_blocks(html)
    want = stdlib_blocks(html)
    assert [(b.tag, b.text, b.tag_path, b.depth, b.in_boiler,
             b.link_chars, b.total_chars) for b in got] == [
        (b.tag, b.text, b.tag_path, b.depth, b.in_boiler,
         b.link_chars, b.total_chars) for b in want
    ]


def test_fixture_pages_match_stdlib():
    for i in range(25):
        html, _, _ = make_page(f"https://host00.example.org/article/{i:08d}")
        _assert_same(html)


_SAFE_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="<>&", categories=("L", "N", "P", "Zs")
    ),
    max_size=60,
)


@st.composite
def well_formed_html(draw, depth=0):
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    parts = ["<body>"]

    def emit(d):
        for _ in range(rng.randint(1, 4)):
            choice = rng.randint(0, 7)
            txt = draw(_SAFE_TEXT)
            if choice == 0:
                parts.append(f"<h{rng.randint(1, 7)}>{txt}</h{1}>")
            elif choice == 1:
                parts.append(f"<p>{txt} &amp; {txt}</p>")
            elif choice == 2:
                parts.append(f"<ul><li>{txt}</li><li><a href='/x'>{txt}</a></li></ul>")
            elif choice == 3:
                parts.append(
                    f"<figure><img src='x' alt='{txt}'/><figcaption>{txt}</figcaption></figure>"
                )
            elif choice == 4:
                parts.append(f"<table><tr><td>{txt}</td><td>{txt}</td></tr></table>")
            elif choice == 5 and d < 2:
                parts.append("<nav><ul>")
                emit(d + 1)
                parts.append("</ul></nav>")
            else:
                parts.append(f"<div><p>{txt}</p></div>")

    emit(0)
    parts.append("</body>")
    return "".join(parts).encode()


@given(well_formed_html())
@settings(max_examples=60, deadline=None)
def test_generated_html_matches_stdlib(html):
    _assert_same(html)
