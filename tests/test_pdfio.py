import numpy as np
import pytest

from ocr_spark.extract.glyph import extract_text, render_page
from ocr_spark.pdfio import encode_pdf, is_pdf, pdf_metadata, render_pages


def _pages():
    return [
        render_page([f"pg{i} abc"], 220, 120, margin=10) for i in range(3)
    ]


def test_roundtrip_order_and_zoom():
    data = encode_pdf(_pages(), {"title": "t", "author": "a"})
    assert is_pdf(data)
    pages = render_pages(data, dpi=300)
    assert len(pages) == 3
    # zoom = 300/72 (pdf_service.py:106-109)
    assert pages[0].shape == (int(120 * 300 / 72), int(220 * 300 / 72))
    for i, p in enumerate(pages):
        text, conf = extract_text(p)
        assert text == f"pg{i} abc" and conf == 1.0


def test_metadata_probe():
    data = encode_pdf(_pages(), {"title": "report"})
    meta = pdf_metadata(data)
    assert meta["page_count"] == 3 and meta["title"] == "report"


def test_dpi_72_identity():
    data = encode_pdf(_pages())
    pages = render_pages(data, dpi=72)
    assert pages[0].shape == (120, 220)


def test_reject_garbage():
    assert not is_pdf(b"junk")
    with pytest.raises(ValueError):
        render_pages(b"junk")
