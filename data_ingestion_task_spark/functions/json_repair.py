"""Multi-stage JSON repair for model output (SURVEY §2.8): the
reference repairs LLM responses with a chain of fixes — code-fence
strip (full_test_run.py:33-41), brace-trim
(confirmation_service.py:36-43), trailing commas / single quotes /
unclosed braces / duplicate keys (json_error.py:5-160) — before
``json.loads``. We re-express the chain as a pure Python function
(property-tested) plus an Arrow-batched ``pandas_udf`` for the hot
path; the clean-JSON majority path should instead stay JVM-side via
``regexp_extract`` + ``from_json`` (see plans/events_plans.py
json_repair_extract).

Also ``safe_parse_list`` (safe_parser.py:3-23): tolerant list parsing
with a close-bracket retry and a wrap-single-item fallback.
"""

import ast
import json
import re
from typing import Any

_FENCE_RE = re.compile(r"```(?:json)?\s*(.*?)\s*```", re.S)
_OBJ_RE = re.compile(r"\{.*\}", re.S)
_TRAILING_COMMA_RE = re.compile(r",\s*([}\]])")


def _dedupe_pairs(pairs: list[tuple[str, Any]]) -> dict[str, Any]:
    """Duplicate keys get _2, _3... suffixes (json_error.py:58-85)."""
    out: dict[str, Any] = {}
    for k, v in pairs:
        key, n = k, 1
        while key in out:
            n += 1
            key = f"{k}_{n}"
        out[key] = v
    return out


def repair_json_text(s: str | None) -> str | None:
    """Repair a raw model response into a parseable JSON object string,
    or None when unrecoverable. Idempotent: the output of a successful
    repair passes through unchanged."""
    if s is None:
        return None
    t = s.strip()
    m = _FENCE_RE.search(t)
    if m:
        t = m.group(1)
    m = _OBJ_RE.search(t)
    if m:
        t = m.group(0)
    elif "{" in t:
        # unclosed object: keep from the first brace, balance below
        t = t[t.index("{"):]
    else:
        return None
    t = _TRAILING_COMMA_RE.sub(r"\1", t)
    for candidate in (t, t + "}" * max(0, t.count("{") - t.count("}"))):
        for variant in (candidate, candidate.replace("'", '"')):
            try:
                json.loads(variant, object_pairs_hook=_dedupe_pairs)
                return variant
            except (json.JSONDecodeError, ValueError):
                continue
    return None


def parse_repaired(s: str | None) -> dict[str, Any] | None:
    """repair → parse with duplicate-key suffixing; None on failure."""
    fixed = repair_json_text(s)
    if fixed is None:
        return None
    try:
        return json.loads(fixed, object_pairs_hook=_dedupe_pairs)
    except (json.JSONDecodeError, ValueError):
        return None


def safe_parse_list(s: str | None) -> list[str]:
    """Tolerant list parse (safe_parser.py:3-23): literal_eval, retry
    with a ']' appended (truncated output), else wrap as one item."""
    if s is None:
        return []
    t = s.strip()
    if not t:
        return []
    for candidate in (t, t + "]"):
        try:
            v = ast.literal_eval(candidate)
            if isinstance(v, (list, tuple)):
                return [str(x) for x in v]
            return [str(v)]
        except (ValueError, SyntaxError):
            continue
    return [t]


def repair_json_udf():
    """Arrow-batched pandas UDF wrapping repair_json_text — the Python
    fallback stage for rows the JVM-side regex path could not parse."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _repair(s: pd.Series) -> pd.Series:
        return s.map(repair_json_text, na_action="ignore")

    return _repair
