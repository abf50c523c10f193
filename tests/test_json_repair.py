"""Property tests for the JSON repair chain (SURVEY §5: the repair
UDF itself gets property tests — idempotence, valid-JSON fixpoint,
recovery of the known mangle classes)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from data_ingestion_task_spark.functions.json_repair import (
    parse_repaired,
    repair_json_text,
    safe_parse_list,
)

# Benign payload alphabet: repair is regex-based, so string values
# containing '}' / ',' sequences may be rewritten (a known, documented
# trade-off of the reference's own regex chain) — the guarantee we
# test is over realistic field values.
_KEY = st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=8)
_VAL = st.one_of(
    st.integers(-10**6, 10**6),
    st.booleans(),
    st.none(),
    st.text(
        st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" .-$#"),
        max_size=20,
    ),
)
_OBJ = st.dictionaries(_KEY, _VAL, min_size=1, max_size=6)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_repair_idempotent(s: str) -> None:
    r = repair_json_text(s)
    if r is not None:
        assert repair_json_text(r) == r


@given(_OBJ)
@settings(max_examples=200, deadline=None)
def test_valid_json_fixpoint(obj: dict) -> None:
    s = json.dumps(obj)
    assert parse_repaired(s) == obj


@given(_OBJ)
@settings(max_examples=200, deadline=None)
def test_mangle_classes_recovered(obj: dict) -> None:
    s = json.dumps(obj)
    mangles = [
        f"Sure, here you go:\n```json\n{s}\n```",   # fence + prose
        f"```\n{s}\n```",                            # bare fence
        s.replace("}", ",}"),                        # trailing comma (last })
        f"Answer: {s} -- end of response",           # noise around
        s[:-1],                                      # truncated: closing brace lost
    ]
    for m in mangles:
        assert parse_repaired(m) == obj, m


def test_duplicate_keys_suffixed() -> None:
    assert parse_repaired('{"a": 1, "a": 2, "a": 3}') == {"a": 1, "a_2": 2, "a_3": 3}


def test_unrecoverable_returns_none() -> None:
    assert repair_json_text("no braces at all") is None
    assert repair_json_text(None) is None


@given(st.lists(st.text(st.characters(min_codepoint=97, max_codepoint=122), max_size=10)))
@settings(max_examples=100, deadline=None)
def test_safe_parse_list_roundtrip(xs: list[str]) -> None:
    assert safe_parse_list(repr(xs)) == xs


def test_safe_parse_list_truncated_and_fallback() -> None:
    assert safe_parse_list("['a', 'b'") == ["a", "b"]   # ']' lost → retry
    assert safe_parse_list("plain text") == ["plain text"]  # wrap fallback
    assert safe_parse_list("") == []
    assert safe_parse_list(None) == []
