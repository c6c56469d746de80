"""Rule-based field extraction (the deterministic replacement for GPT-4V).

The reference's prompt (``work_order_extractor.py:1615-1624``) specifies the
semantics: "8 digits after 'Work Order No.'" plus an equipment number; its
response handling defines the edge behavior we pin here:

- markdown-fence stripping of ``\\`\\`\\`json ... \\`\\`\\``` responses
  (``:1663-1668``),
- invalid JSON → null fields, not an error (``:1675-1677``),
- dual str/int key normalization before the membership probe
  (``:1752-1767`` → :func:`core.textnorm.normalize_key`),
- ``NoEquip`` substitution in the output name (``:1771-1774``).

Extended per the north rule with customer, date, and line-item spans.
"""

from __future__ import annotations

import json
import re

WORK_ORDER_RE = re.compile(r"Work\s+Order\s+No\.?\s*:?\s*(\d{8})", re.IGNORECASE)
EQUIPMENT_RE = re.compile(r"Equipment\s*(?:No\.?|Number)?\s*:?\s*([A-Za-z0-9][A-Za-z0-9\-]*)", re.IGNORECASE)
CUSTOMER_RE = re.compile(r"Customer\s*:?\s*([^\n]+?)(?=\s{2,}|\n|$)", re.IGNORECASE)
DATE_RE = re.compile(r"Date\s*:?\s*(\d{4}-\d{2}-\d{2})", re.IGNORECASE)
LINE_ITEM_RE = re.compile(r"Item\s+\d+\s*:\s*[^\n]+", re.IGNORECASE)
JSON_FENCE_RE = re.compile(r"^```(?:json)?\s*\n(.*?)\n?```\s*$", re.DOTALL)

FIELD_NAMES = ("work_order_number", "equipment_number", "customer", "order_date")


def strip_markdown_fence(text: str) -> str:
    """Reproduce the reference's fence stripping (``:1663-1668``): if the
    trimmed text is one fenced block, return its body, else the trimmed text."""
    t = text.strip()
    m = JSON_FENCE_RE.match(t)
    return m.group(1) if m else t


def parse_json_fields(text: str) -> dict | None:
    """Try the reference's JSON-response path: fence-strip then ``json.loads``.

    Returns the field dict if the payload is a JSON object, else ``None``
    (the caller falls through to regex extraction). Invalid JSON inside a
    fence maps to null fields like the reference (``:1675-1677``).
    """
    t = strip_markdown_fence(text)
    looks_fenced = t != text.strip() or t.lstrip().startswith("{")
    if not looks_fenced:
        return None
    try:
        obj = json.loads(t)
    except (ValueError, TypeError):
        # fenced-but-invalid → the reference returns null fields
        if t != text.strip():
            return {k: None for k in FIELD_NAMES}
        return None
    if not isinstance(obj, dict):
        return {k: None for k in FIELD_NAMES}
    out: dict = {}
    for k in FIELD_NAMES:
        v = obj.get(k)
        out[k] = str(v) if v is not None else None
    return out


def extract_fields(text: str) -> tuple[dict, list[dict]]:
    """Anchored-regex extraction over canonical extracted text.

    Returns ``(fields, spans)`` where fields maps
    work_order_number/equipment_number/customer/order_date → str|None and
    spans is a list of ``{"field", "start", "end"}`` character ranges into
    ``text`` (line-item rows get field ``line_item``).
    """
    fields: dict = {k: None for k in FIELD_NAMES}
    spans: list[dict] = []
    for name, rx in (
        ("work_order_number", WORK_ORDER_RE),
        ("equipment_number", EQUIPMENT_RE),
        ("customer", CUSTOMER_RE),
        ("order_date", DATE_RE),
    ):
        m = rx.search(text)
        if m:
            fields[name] = m.group(1).strip()
            spans.append({"field": name, "start": m.start(1), "end": m.end(1)})
    for m in LINE_ITEM_RE.finditer(text):
        spans.append({"field": "line_item", "start": m.start(), "end": m.end()})
    return fields, spans


def output_name(work_order: str | None, equipment: str | None) -> str | None:
    """The reference's rename pattern ``CS-{wo}-{equip}.pdf`` with
    ``NoEquip`` substitution (``:1771-1774``); None when no work order."""
    if not work_order:
        return None
    return f"CS-{work_order}-{equipment or 'NoEquip'}.pdf"
