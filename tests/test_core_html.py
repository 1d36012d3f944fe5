"""Unit tests for the HTML boilerplate-strip core (north rule heuristics)."""

from pdf_to_text_spark.core.htmlextract import extract_main_content

ARTICLE = """<!DOCTYPE html><html><head><title>t</title>
<script>var x = "should never appear";</script><style>.a{color:red}</style></head>
<body>
<nav><ul><li><a href="/a">home</a></li><li><a href="/b">products and things</a></li></ul></nav>
<article>
<h2>A Real Heading</h2>
<p>This paragraph has plenty of real sentence content to keep, well above threshold.</p>
<p>tiny</p>
<p>Another long enough paragraph with <a href="/x">one link</a> but mostly prose text here.</p>
</article>
<aside><a href="/p">promo promo promo</a> <a href="/q">more links more links</a></aside>
<footer><a href="/about">about</a></footer>
</body></html>"""


def test_keeps_content_drops_chrome():
    out = extract_main_content(ARTICLE)
    assert "A Real Heading" in out
    assert "plenty of real sentence content" in out
    assert "mostly prose text" in out
    assert "should never appear" not in out  # script
    assert "color:red" not in out  # style
    assert "promo" not in out  # link-dense aside
    assert "about" not in out  # footer link
    assert "home" not in out  # nav
    assert "tiny" not in out  # below min length


def test_blocks_joined_by_blank_lines():
    out = extract_main_content(ARTICLE)
    assert out.index("A Real Heading") < out.index("plenty")
    assert "\n\n" in out


def test_empty_and_menu_pages():
    assert extract_main_content("<html><body></body></html>") == ""
    menu = "<html><body><ul>" + "".join(
        f'<li><a href="/{i}">item number {i}</a></li>' for i in range(20)
    ) + "</ul></body></html>"
    assert extract_main_content(menu) == ""


def test_br_is_newline_inside_block():
    html = "<p>first part of a sufficiently long block<br>second line of the same block</p>"
    out = extract_main_content(html)
    assert "first part of a sufficiently long block\nsecond line" in out


# ------------------------------------------------ round-5: charsets


def test_charset_utf8_fast_path_unchanged():
    from pdf_to_text_spark.core.htmlextract import extract_main_content_bytes

    body = "<p>" + "déjà vu café naïve straße — plenty of words here now" * 2 + "</p>"
    data = ("<html><body>" + body + "</body></html>").encode("utf-8")
    assert "déjà vu café" in extract_main_content_bytes(data)


def test_charset_meta_declared_latin1_means_cp1252():
    from pdf_to_text_spark.core.htmlextract import extract_main_content_bytes

    text = "Résumé of the café’s naïve décor — a sufficiently long block"
    page = (
        '<html><head><meta charset="iso-8859-1"></head><body><p>'
        + text + "</p></body></html>"
    )
    # windows-1252 superset: the ’ (U+2019) encodes as 0x92
    data = page.encode("windows-1252")
    out = extract_main_content_bytes(data)
    assert "Résumé" in out and "café’s" in out


def test_charset_http_equiv_and_shift_jis():
    from pdf_to_text_spark.core.htmlextract import extract_main_content_bytes

    text = "日本語のページ本文がここに入ります。十分に長いブロックです。"
    page = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=shift_jis"></head><body><p>'
        + text + "</p></body></html>"
    )
    assert text in extract_main_content_bytes(page.encode("shift_jis"))


def test_charset_undeclared_falls_back_cp1252():
    from pdf_to_text_spark.core.htmlextract import extract_main_content_bytes

    text = "Fallback décor — no meta declaration on this long enough page"
    data = ("<html><body><p>" + text + "</p></body></html>").encode("windows-1252")
    assert "décor" in extract_main_content_bytes(data)


def test_charset_bogus_label_never_raises():
    from pdf_to_text_spark.core.htmlextract import extract_main_content_bytes

    data = (
        b'<html><head><meta charset="not-a-charset"></head><body><p>'
        b"enough words to keep this block around for the test \xe9\xff"
        b"</p></body></html>"
    )
    out = extract_main_content_bytes(data)
    assert "enough words" in out
