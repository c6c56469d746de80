"""Per-turn extraction: the single pure function both harnesses call.

``extract_turn(text, tool)`` is invoked by the pandas oracle (``oracle.py``)
and, batched over Arrow record batches, by the Spark pandas UDF
(``operators/extract.py``). One implementation ⇒ per-turn equality between
the distributed job and the goldens is a property of the plumbing, which the
test suite then exercises (ordering, partitioning, skew, resume).

Routing mirrors the fixture payload families (FIXTURES.md §2):

- ``tool == 'pdf_reader'`` → base64 PDF → content-stream tokenizer → page-1
  region filter (the reference processes page 1 only,
  ``work_order_extractor.py:1125``, and crops the configured region,
  ``:1378-1388``) → canonical line assembly → anchored-regex fields with
  line bboxes.
- ``tool == 'browser'`` → Boilerpipe-style main-content extraction → fields.
- otherwise → plain text: fenced-JSON fields if present (``:1663-1677``),
  else regex fields.
"""

from __future__ import annotations

import base64
import binascii
import datetime as _dt

from . import fields as F
from . import htmlextract, pdfparse, textnorm

STATUS_OK = "ok"
STATUS_FAILED = "extraction_failed"


def _span_bbox(span: dict, lines: list[dict], line_ranges: list[tuple[int, int]]) -> dict:
    """Attach the bbox of the line containing the span's start offset."""
    for (s, e), ln in zip(line_ranges, lines):
        if s <= span["start"] < e:
            return {**span, "x0": ln["x0"], "y0": ln["y0"], "x1": ln["x1"], "y1": ln["y1"]}
    return {**span, "x0": None, "y0": None, "x1": None, "y1": None}


def _parse_date(s: str | None) -> _dt.date | None:
    if not s:
        return None
    try:
        return _dt.date.fromisoformat(s)
    except ValueError:
        return None


def extract_turn(
    text: str | None,
    tool: str | None,
    crop: tuple[float, float, float, float] = pdfparse.DEFAULT_CROP,
) -> dict:
    """Extract one turn. Never raises; failures become status rows
    (the reference's null-result fallback, ``work_order_extractor.py:1677``)."""
    if text is None:
        return _result(None, [], {}, STATUS_FAILED)

    if tool == "pdf_reader":
        try:
            data = base64.b64decode(text.strip(), validate=True)
            pages = pdfparse.parse_pdf(data)
        except (binascii.Error, ValueError, pdfparse.PdfParseError):
            return _result(None, [], {}, STATUS_FAILED)
        page = pages[0]  # first-page-only, like the reference (:1125)
        toks = pdfparse.tokens_in_region(
            page["tokens"], page["width"], page["height"], crop
        )
        lines = textnorm.assemble_lines(toks)
        extracted = textnorm.join_lines(lines)
        flds, spans = F.extract_fields(extracted)
        # char ranges of each line inside the joined text, for bbox lookup
        ranges: list[tuple[int, int]] = []
        off = 0
        for ln in lines:
            ranges.append((off, off + len(ln["text"])))
            off += len(ln["text"]) + 1  # '\n'
        spans = [_span_bbox(sp, lines, ranges) for sp in spans]
        return _result(extracted, spans, flds, STATUS_OK)

    if tool == "browser":
        extracted = htmlextract.extract_main_text(text)
        flds, spans = F.extract_fields(extracted)
        spans = [
            {**sp, "x0": None, "y0": None, "x1": None, "y1": None} for sp in spans
        ]
        return _result(extracted, spans, flds, STATUS_OK)

    # plain text
    extracted = textnorm.normalize_plain_text(text)
    json_fields = F.parse_json_fields(extracted)
    if json_fields is not None:
        flds, spans = json_fields, []
    else:
        flds, spans = F.extract_fields(extracted)
        spans = [
            {**sp, "x0": None, "y0": None, "x1": None, "y1": None} for sp in spans
        ]
    return _result(extracted, spans, flds, STATUS_OK)


def _result(extracted, spans, flds, status) -> dict:
    return {
        "extracted_text": extracted,
        "spans": spans,
        "work_order_number": flds.get("work_order_number"),
        "equipment_number": flds.get("equipment_number"),
        "customer": flds.get("customer"),
        "order_date": _parse_date(flds.get("order_date")),
        "status": status,
    }
