"""Vendored pure-Python PDF extractor (sources/minipdf.py) + the S1 loader
path over real PDF bytes — generated in-test, so the parse is exercised in
this container without pypdf (VERDICT r2 stretch #8)."""

import zlib

import pytest

from oaim_sandbox_spark.sources import minipdf
from oaim_sandbox_spark.sources.loaders import _parse_pdf_bytes, load_binary_documents


def _obj(num: int, body: bytes) -> bytes:
    return b"%d 0 obj\n" % num + body + b"\nendobj\n"


def _stream_obj(num: int, content: bytes, flate: bool = True) -> bytes:
    data = zlib.compress(content) if flate else content
    filt = b"/Filter /FlateDecode " if flate else b""
    return _obj(
        num,
        b"<< " + filt + b"/Length %d >>\nstream\n" % len(data) + data + b"\nendstream",
    )


def make_pdf(page_contents: list[bytes], flate: bool = True, extra: bytes = b"") -> bytes:
    """A scannable two-level PDF: catalog, pages node, one /Page + one
    content stream per entry. The xref table is omitted — minipdf locates
    objects by scanning, and pypdf (when present) rebuilds missing xrefs."""
    n = len(page_contents)
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n))
    out = [b"%PDF-1.4\n"]
    out.append(_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    out.append(_obj(2, b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n))
    for i in range(n):
        out.append(
            _obj(3 + i, b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>" % (3 + n + i))
        )
    for i, content in enumerate(page_contents):
        out.append(_stream_obj(3 + n + i, content, flate=flate))
    out.append(extra)
    out.append(b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    return b"".join(out)


PAGE1 = b"BT /F1 12 Tf 72 720 Td (Hello, PDF world.) Tj 0 -14 Td (Second line.) Tj ET"
PAGE2 = b"BT [(Kerned ) -250 (array ) -250 (text.)] TJ ET BT <48657821> Tj ET"


def test_extract_pages_two_pages_flate():
    pages = minipdf.extract_pages(make_pdf([PAGE1, PAGE2]))
    assert len(pages) == 2
    assert "Hello, PDF world." in pages[0]
    assert "Second line." in pages[0]
    assert pages[0].index("Hello") < pages[0].index("Second")
    assert "\n" in pages[0]  # Td line advance becomes a newline
    assert "Kerned array text." in pages[1]
    assert "Hex!" in pages[1]  # hex-string decode


def test_extract_pages_plain_streams():
    pages = minipdf.extract_pages(make_pdf([PAGE1], flate=False))
    assert "Hello, PDF world." in pages[0]


def test_literal_escapes_and_octal():
    content = rb"BT (paren \( close \) slash \\ tab\there octal \101) Tj ET"
    pages = minipdf.extract_pages(make_pdf([content]))
    assert "paren ( close ) slash \\ tab\there octal A" in pages[0]


def test_encrypted_raises():
    pdf = make_pdf([PAGE1], extra=_obj(9, b"<< /V 2 >>"))
    pdf = pdf.replace(b"trailer\n<<", b"trailer\n<< /Encrypt 9 0 R")
    with pytest.raises(NotImplementedError):
        minipdf.extract_pages(pdf)


def test_not_a_pdf_raises():
    with pytest.raises(ValueError):
        minipdf.extract_pages(b"PK\x03\x04 this is a zip")


def test_no_page_tree_falls_back_to_blob():
    # content streams but no /Type /Page objects -> one pseudo-page
    raw = b"%PDF-1.4\n" + _stream_obj(1, PAGE1) + b"%%EOF\n"
    pages = minipdf.extract_pages(raw)
    assert len(pages) == 1 and "Hello, PDF world." in pages[0]


def test_parse_pdf_bytes_dispatch():
    # whichever backend is installed, the loader-level helper parses for real
    pages = _parse_pdf_bytes(make_pdf([PAGE1, PAGE2]))
    assert len(pages) == 2 and "Hello, PDF world." in pages[0]


def test_s1_spark_loader_roundtrip(spark, tmp_path):
    """S1 end-to-end: PDF bytes on disk -> binaryFile scan -> mapInPandas
    parse -> one row per page with the document schema."""
    (tmp_path / "a.pdf").write_bytes(make_pdf([PAGE1, PAGE2]))
    (tmp_path / "b.pdf").write_bytes(make_pdf([b"BT (Solo page.) Tj ET"]))
    df = load_binary_documents(spark, str(tmp_path / "*.pdf"), "pdf")
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == {"a.pdf_p1", "a.pdf_p2", "b.pdf_p1"}
    assert "Hello, PDF world." in rows["a.pdf_p1"]["text"]
    assert rows["a.pdf_p2"]["page"] == 2 and rows["b.pdf_p1"]["ext"] == "pdf"


# -- property: build -> extract roundtrip ------------------------------------

from hypothesis import given, settings, strategies as st

# chars that survive PDF literal-string encoding untouched and are printable
_pdf_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=1, max_size=80,
).map(lambda s: s.strip()).filter(bool)


def _escape_literal(s: str) -> bytes:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)").encode("latin-1")


@settings(max_examples=30, deadline=None)
@given(st.lists(_pdf_text, min_size=1, max_size=4))
def test_roundtrip_property(lines):
    """Any printable-ASCII lines drawn as one Tj per line come back out, in
    order, page-aligned — for both Flate and plain streams."""
    content = b"BT " + b" ".join(
        b"(" + _escape_literal(ln) + b") Tj 0 -14 Td" for ln in lines
    ) + b" ET"
    for flate in (True, False):
        pages = minipdf.extract_pages(make_pdf([content], flate=flate))
        assert len(pages) == 1
        # exact reconstruction: one extracted line per drawn line, in order
        # (an index()-based order check is wrong when one line is a
        # substring of another)
        got = [seg for seg in pages[0].split("\n") if seg]
        assert got == lines


def test_compact_contents_no_space():
    """'/Contents[5 0 R]' (no whitespace, legal and emitted by compact
    writers) must still resolve — regression for the \\s+ regex."""
    content_obj = _stream_obj(3, PAGE1)
    page = _obj(2, b"<< /Type /Page /Contents[3 0 R] >>")
    pdf = (b"%PDF-1.4\n" + _obj(1, b"<< /Type /Catalog >>") + page + content_obj
           + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    pages = minipdf.extract_pages(pdf)
    assert len(pages) == 1 and "Hello, PDF world." in pages[0]


CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /AAAAAA+F1 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0001> <0048>
<0002> <00E9>
endbfchar
1 beginbfrange
<0010> <0012> <006C>
endbfrange
2 beginbfrange
<0020> <0021> [<0057 006F> <0072>]
<0030> <0030> <0064 0021>
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""


def make_subset_font_pdf(content: bytes, flate: bool = True) -> bytes:
    """A one-page PDF whose /F1 is a subsetted Type0 font with a ToUnicode
    CMap — the class the latin-1 fallback used to garble."""
    out = [b"%PDF-1.4\n"]
    out.append(_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    out.append(_obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    out.append(_obj(
        3,
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R /F2 7 0 R >> >> >>",
    ))
    out.append(_stream_obj(4, content, flate=flate))
    out.append(_obj(5, b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Sub /ToUnicode 6 0 R >>"))
    out.append(_stream_obj(6, CMAP, flate=flate))
    out.append(_obj(7, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    out.append(b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    return b"".join(out)


def test_tounicode_cmap_hex_strings():
    """bfchar, contiguous bfrange, array bfrange, and multi-unit
    destinations all decode; an unmapped wide code drops instead of
    emitting a garbage byte."""
    #            H     e-acute  l     m     n       Wo    r     d!
    content = b"BT /F1 12 Tf <00010002 0010 0011 0012> Tj <0020 0021 0030> Tj ET"
    pages = minipdf.extract_pages(make_subset_font_pdf(content))
    assert len(pages) == 1
    assert "Hélmn" in pages[0]
    assert "Word!" in pages[0]


def test_tounicode_cmap_literal_strings_and_font_switch():
    """Literal strings decode through the active CMap; Tf back to a
    plain font restores latin-1; unmapped wide codes are dropped."""
    content = (
        b"BT /F1 12 Tf (\\000\\001\\000\\002) Tj "  # 0x0001 0x0002 -> H, e-acute
        b"/F2 12 Tf (plain latin) Tj "
        b"/F1 12 Tf <7FFF> Tj ET"                   # unmapped wide code -> dropped
    )
    pages = minipdf.extract_pages(make_subset_font_pdf(content))
    text = pages[0]
    assert "Hé" in text
    assert "plain latin" in text
    assert "\x7f" not in text and "￿" not in text


def test_cmap_absent_falls_back_to_latin1():
    content = b"BT /F2 12 Tf (No cmap here.) Tj ET"
    pages = minipdf.extract_pages(make_subset_font_pdf(content))
    assert "No cmap here." in pages[0]
