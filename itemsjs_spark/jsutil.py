"""JavaScript-semantics helpers.

The reference engine (stereobooster/itemsjs, /root/reference) runs in a JS
runtime, so several observable behaviors depend on JS coercion rules:

* facet keys are JS object keys => always strings (helpers.ts:293-315)
* ``facet_stats`` uses ``isNaN(key)`` + ``parseInt(key)`` (helpers.ts:487-497)
* bucket ``selected`` uses strict ``indexOf`` on raw input values
  (helpers.ts:426-445)
* ``humanize`` title-cases facet names (helpers.ts:37-44)

These pure functions reproduce those rules so both the in-memory oracle and
the Spark engine agree with the reference bit-for-bit on string keys.
"""

from __future__ import annotations

import math
import re
from typing import Any

_INT_RE = re.compile(r"^\s*[+-]?\d+")
_FLOAT_PREFIX_RE = re.compile(r"^\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")
_WS_ONLY_RE = re.compile(r"^\s*$")


def js_number_to_string(x: float | int) -> str:
    """JS ``String(number)`` for the value range seen in facet data.

    Integral doubles print without the trailing ``.0`` (JS has no int/float
    distinction); other doubles use the shortest round-trip repr, which
    matches JS for the non-exotic range (|x| < 1e21).
    """
    if isinstance(x, bool):  # bool is int subclass; JS String(true)='true'
        return "true" if x else "false"
    if isinstance(x, int):
        return str(x)
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == int(x) and abs(x) < 1e21:
        return str(int(x))
    return repr(x)


def js_key(v: Any) -> str | None:
    """JS object-key coercion applied when a facet value is indexed.

    Returns None for values the indexer skips (missing). ``null`` in JS
    would stringify to 'null', but via parquet a null cell is
    indistinguishable from an absent field, so we treat null as absent.
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return js_number_to_string(v)
    return str(v)


def js_parse_int(s: Any) -> float:
    """JS ``parseInt`` (radix 10 behavior for ordinary strings).

    Returns NaN (float) when no leading integer can be parsed.
    """
    if isinstance(s, bool):
        return float("nan")
    if isinstance(s, int):
        return s
    if isinstance(s, float):
        return math.trunc(s) if math.isfinite(s) else float("nan")
    m = _INT_RE.match(str(s))
    if not m:
        return float("nan")
    return int(m.group(0).strip())


def js_is_nan_str(s: Any) -> bool:
    """JS ``isNaN(value)`` (Number coercion then NaN check)."""
    if s is None:
        return True  # isNaN(undefined) -> true
    if isinstance(s, bool) or isinstance(s, (int, float)):
        return isinstance(s, float) and math.isnan(s)
    text = str(s)
    if _WS_ONLY_RE.match(text):
        return False  # Number('') == 0
    t = text.strip()
    if t in ("Infinity", "-Infinity", "+Infinity"):
        return False
    try:
        float(t)
        return False
    except ValueError:
        pass
    # hex / octal / binary literals Number() accepts
    try:
        int(t, 0)
        return False
    except ValueError:
        return True


def js_loose_eq(a: Any, b: Any) -> bool:
    """JS ``==`` for the scalar types appearing as item ids."""
    if type(a) is type(b) or (
        isinstance(a, (int, float))
        and isinstance(b, (int, float))
        and not isinstance(a, bool)
        and not isinstance(b, bool)
    ):
        return a == b
    if a is None or b is None:
        return a is None and b is None
    # string <-> number coercion
    if isinstance(a, str) and isinstance(b, (int, float)):
        try:
            return float(a) == b
        except ValueError:
            return False
    if isinstance(b, str) and isinstance(a, (int, float)):
        return js_loose_eq(b, a)
    return a == b


def humanize(s: str) -> str:
    """reference helpers.ts:37-44 — trim _/space, squash to single space,
    upcase a leading ascii-lowercase letter."""
    s = re.sub(r"^[\s_]+|[\s_]+$", "", s)
    s = re.sub(r"[_\s]+", " ", s)
    return re.sub(r"^[a-z]", lambda m: m.group(0).upper(), s, count=1)


def is_array_index_key(key: str) -> bool:
    """Whether a string key enumerates first in JS objects (canonical
    non-negative integer below 2^32-1)."""
    if not key.isdigit():
        return False
    if len(key) > 1 and key[0] == "0":
        return False
    return int(key) < 2**32 - 1
