"""Reference-semantics regression corpus (FIXTURES.md §6; SURVEY §5 item 4).

Each case pins a behavior observed in the reference
(`work_order_extractor.py` lines cited per test).
"""

from __future__ import annotations

from work_order_pdf_extractor_spark.core import fields as F
from work_order_pdf_extractor_spark.core.extractor import extract_turn
from work_order_pdf_extractor_spark.core.textnorm import normalize_key


def test_markdown_fence_stripping():  # :1663-1668
    text = '```json\n{"work_order_number":"22809891","equipment_number":"EQ-1"}\n```'
    res = F.parse_json_fields(text)
    assert res["work_order_number"] == "22809891"
    assert res["equipment_number"] == "EQ-1"


def test_plain_fence_without_json_tag():
    text = '```\n{"work_order_number":"22809891"}\n```'
    assert F.parse_json_fields(text)["work_order_number"] == "22809891"


def test_invalid_json_in_fence_gives_null_fields():  # :1675-1677
    res = F.parse_json_fields("```json\n{not valid json}\n```")
    assert res == {k: None for k in F.FIELD_NAMES}


def test_non_json_text_falls_through_to_regex():
    assert F.parse_json_fields("just words") is None


def test_key_normalization_str_int_duality():  # :1752-1767
    assert normalize_key("22809891") == "22809891"
    assert normalize_key("022809891") == "22809891"
    assert normalize_key(" 22809891 ") == "22809891"
    assert normalize_key("EQ-12") == "EQ-12"
    assert normalize_key("") is None
    assert normalize_key(None) is None


def test_noequip_substitution():  # :1771-1774
    assert F.output_name("22809891", None) == "CS-22809891-NoEquip.pdf"
    assert F.output_name("22809891", "EQ-7") == "CS-22809891-EQ-7.pdf"
    assert F.output_name(None, "EQ-7") is None


def test_anchored_work_order_regex():  # prompt spec :1615-1624
    f, spans = F.extract_fields("Work Order No. : 22809891 Equipment: EQ-9")
    assert f["work_order_number"] == "22809891"
    assert f["equipment_number"] == "EQ-9"
    assert {s["field"] for s in spans} == {"work_order_number", "equipment_number"}
    # span offsets index into the text
    wo = next(s for s in spans if s["field"] == "work_order_number")
    assert "Work Order No. : 22809891 Equipment: EQ-9"[wo["start"]:wo["end"]] == "22809891"


def test_work_order_requires_8_digits():
    f, _ = F.extract_fields("Work Order No. : 1234")
    assert f["work_order_number"] is None


def test_line_item_spans():
    text = "Item 1: replace seal 4h\nItem 2: align shaft 2h"
    _, spans = F.extract_fields(text)
    items = [s for s in spans if s["field"] == "line_item"]
    assert len(items) == 2


def test_extract_turn_null_text_fails_safe():
    res = extract_turn(None, "")
    assert res["status"] == "extraction_failed"
    assert res["extracted_text"] is None


def test_extract_turn_bad_base64_fails_safe():  # :1677 null fallback
    res = extract_turn("!!!not-base64!!!", "pdf_reader")
    assert res["status"] == "extraction_failed"
