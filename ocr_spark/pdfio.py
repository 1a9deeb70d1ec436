"""Deterministic multi-page document container + page renderer (S2/S3).

The reference renders PDFs to per-page PNGs with PyMuPDF at a zoom of
dpi/72 (/root/reference/app/services/pdf_service.py:61-143, zoom matrix
:106-109) and probes metadata (:182-214).  PyMuPDF/reportlab are absent in
this container, so the *container format* is a stand-in: a simple
length-prefixed bundle of page PNGs plus a JSON metadata blob ("SPDF").
The Spark-side semantics are the real thing and are what we test:

* a pdf-kind span fans out to one image per page, in page order;
* pages render at dpi=300 via zoom = dpi/72 (here: bilinear upscale of the
  stored base-resolution page, deterministic);
* page markers and fan-in follow app/worker/tasks.py:182-213.
"""

from __future__ import annotations

import json
import struct

import numpy as np

from ocr_spark.imaging import kernels as K
from ocr_spark.imaging.png import decode_png, encode_png

_MAGIC = b"SPDF1\n"
BASE_DPI = 72.0


def encode_pdf(pages: list[np.ndarray], metadata: dict | None = None) -> bytes:
    """Bundle page images (stored at 72 dpi base resolution) into SPDF bytes."""
    meta = json.dumps(metadata or {}, sort_keys=True).encode("utf-8")
    out = [_MAGIC, struct.pack(">I", len(pages))]
    for page in pages:
        png = encode_png(page)
        out.append(struct.pack(">I", len(png)))
        out.append(png)
    out.append(struct.pack(">I", len(meta)))
    out.append(meta)
    return b"".join(out)


def is_pdf(data: bytes) -> bool:
    return data[:6] == _MAGIC


def pdf_metadata(data: bytes) -> dict:
    """Metadata probe: page_count + stored metadata (pdf_service.py:182-214)."""
    pages, meta = _parse(data, decode_pages=False)
    meta = dict(meta)
    meta["page_count"] = pages
    return meta


def _parse(data: bytes, decode_pages: bool = True):
    if not is_pdf(data):
        raise ValueError("not an SPDF document")
    pos = len(_MAGIC)
    (n_pages,) = struct.unpack(">I", data[pos : pos + 4])
    pos += 4
    pages = []
    for _ in range(n_pages):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        if decode_pages:
            pages.append(data[pos : pos + ln])
        pos += ln
    (mln,) = struct.unpack(">I", data[pos : pos + 4])
    pos += 4
    meta = json.loads(data[pos : pos + mln].decode("utf-8")) if mln else {}
    if decode_pages:
        return pages, meta
    return n_pages, meta


def render_pages(data: bytes, dpi: int = 300) -> list[np.ndarray]:
    """Render every page at the requested DPI, zoom = dpi/72
    (pdf_service.py:102-113).  Page order is the stored order; the caller
    assigns span offsets from it (tasks.py:182-204)."""
    page_blobs, _meta = _parse(data)
    zoom = dpi / BASE_DPI
    out = []
    for blob in page_blobs:
        img = decode_png(blob)
        if zoom != 1.0:
            h, w = img.shape[:2]
            img = K.resize_bilinear(img, int(w * zoom), int(h * zoom))
        out.append(img)
    return out
