"""Unit tests for the Boilerpipe-style HTML main-content extractor (M3)."""

from __future__ import annotations

from work_order_pdf_extractor_spark.core import htmlextract as H

PAGE = (
    "<html><head><script>var x=1;</script><style>p{}</style></head><body>"
    '<nav><ul><li><a href="/a">home</a></li><li><a href="/b">docs</a></li></ul></nav>'
    "<article><p>This long paragraph carries the actual main content of the "
    "page with plenty of words to pass the density rule.</p>"
    '<p>Short <a href="/x">linky linky linky linky linky linky</a> row</p></article>'
    "<footer>tiny footer</footer></body></html>"
)


def test_script_style_skipped():
    blocks = H.segment_blocks(PAGE)
    assert not any("var x" in b["text"] or "p{}" in b["text"] for b in blocks)


def test_link_density_flags_nav():
    blocks = H.segment_blocks(PAGE)
    nav_blocks = [b for b in blocks if "home" in b["text"] or "docs" in b["text"]]
    assert nav_blocks and all(b["link_density"] > 0.5 for b in nav_blocks)


def test_main_text_recovers_content_only():
    main = H.extract_main_text(PAGE)
    assert main.startswith("This long paragraph carries")
    assert "home" not in main and "footer" not in main
    # the link-heavy paragraph is boilerplate despite its word count
    assert "linky" not in main


def test_short_blocks_dropped():
    assert H.extract_main_text("<p>too short</p>") == ""


def test_whitespace_canonicalized():
    html = "<p>spaced   out\n\n   words here now indeed truly verily and more</p>"
    assert H.extract_main_text(html) == "spaced out words here now indeed truly verily and more"


def test_fast_scanner_matches_htmlparser_on_fixtures():
    """Differential test: the regex scanner and the stdlib-HTMLParser twin
    must segment identically on the whole fixture HTML corpus."""
    import random

    from work_order_pdf_extractor_spark import fixtures

    rng = random.Random(7)
    pages = [
        fixtures.build_html_payload(
            rng, "Work Order No. : 22809891" if i % 3 == 0 else None
        )
        for i in range(120)
    ] + [PAGE, "<p>plain &amp; simple entity test with enough words here</p>"]
    for pg in pages:
        assert H.segment_blocks(pg) == H.segment_blocks_htmlparser(pg)
