"""Facet-query semantic core: compiles an itemsjs search input into a
backend-neutral predicate IR.

The reference evaluates facet queries as eager bitmap algebra over a cloned
index (/root/reference/src/facets.ts:99-153, src/helpers.ts:46-253). This
module re-derives those semantics as *predicates over documents*, preserving
every observable quirk:

* conjunctive fold over (field, value) filters in input order, where a
  missing value empties the result only if a previous value existed;
  leading missing values are skipped (helpers.ts:176-192);
* negative filters subtract from every bucket and from the result
  (helpers.ts:212-233, facets.ts:109);
* disjunctive per-field unions are intersected into every *other* field's
  buckets only (self-exclusion, helpers.ts:240-247);
* ``filters_query`` DNF paths fold with the same missing-value quirk over
  the ALREADY-crossed buckets, and the result-id set is the union of all
  indexed buckets — documents with no indexed facet value cannot match
  (helpers.ts:74-142, 346-358; facets.ts:141-150);
* unknown facet *field* in a DNF raises the verbatim panic message
  (helpers.ts:102-104).

IR nodes (plain tuples so both backends pattern-match cheaply):
  ('true',) ('false',) ('and', [..]) ('or', [..]) ('not', x)
  ('contains', field, key)   # document has facet value with string key
  ('hasvalue', field)        # document has >=1 indexed value for field
  ('query',)                 # document is in the full-text hit set

Backends: the in-memory oracle evaluates IR over per-document key sets; the
Spark engine compiles IR to Column expressions over normalized
``array<string>`` facet-key columns (JVM-side, predicate-pushdown friendly).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

from ..jsutil import js_key

TRUE = ("true",)
FALSE = ("false",)
QUERY = ("query",)


class FacetPanicError(Exception):
    """Reference-verbatim panic for unknown DNF facet key."""


class UnknownFacetFieldError(Exception):
    """Mirrors the reference's uncaught TypeError when a filter references a
    field absent from ``aggregations``."""


def AND(*parts: tuple) -> tuple:
    flat: List[tuple] = []
    for p in parts:
        if p == TRUE:
            continue
        if p == FALSE:
            return FALSE
        if p[0] == "and":
            flat.extend(p[1])
        else:
            flat.append(p)
    if not flat:
        return TRUE
    if len(flat) == 1:
        return flat[0]
    return ("and", flat)


def OR(*parts: tuple) -> tuple:
    flat: List[tuple] = []
    for p in parts:
        if p == FALSE:
            continue
        if p == TRUE:
            return TRUE
        if p[0] == "or":
            flat.extend(p[1])
        else:
            flat.append(p)
    if not flat:
        return FALSE
    if len(flat) == 1:
        return flat[0]
    return ("or", flat)


def NOT(p: tuple) -> tuple:
    if p == TRUE:
        return FALSE
    if p == FALSE:
        return TRUE
    return ("not", p)


def contains(fld: str, key: str) -> tuple:
    return ("contains", fld, key)


# ---------------------------------------------------------------------------
# input normalization (reference helpers.ts:560-593)
# ---------------------------------------------------------------------------

def input_to_facet_filters(
    input: Dict[str, Any], config: Dict[str, Dict[str, Any]]
) -> List[Any]:
    """Normalized FiltersArray, exactly as the reference builds it:
    conjunction fields -> flat [field, value] entries; disjunction fields ->
    one nested group; not_filters append [field, '-', value]."""
    filters: List[Any] = []
    for key, values in (input.get("filters") or {}).items():
        if values is None or len(values) == 0:
            continue
        agg = config.get(key)
        if agg is None:
            raise UnknownFacetFieldError(key)
        if agg.get("conjunction") is not False:
            for v in values:
                filters.append([key, v])
        else:
            filters.append([[key, v] for v in values])
    for key, values in (input.get("not_filters") or {}).items():
        if values is None or len(values) == 0:
            continue
        for v in values:
            filters.append([key, "-", v])
    return filters


def parse_boolean_query(query: str) -> List[List[List[str]]]:
    """DNF expansion equivalent to boolean-parser 0.0.2 +
    helpers.ts:595-615 term splitting on ':'.

    Grammar: terms | expr 'AND' expr | expr 'OR' expr | '(' expr ')'.
    Output: list of paths; each path a list of ['field', 'value'] terms.
    """
    tokens = _bp_tokenize(query)
    paths, pos = _bp_parse_or(tokens, 0)
    if pos != len(tokens):
        raise ValueError(f"unbalanced boolean query: {query!r}")
    return [[term.split(":") for term in path] for path in paths]


def _bp_tokenize(query: str) -> List[str]:
    out: List[str] = []
    buf = ""
    for ch in query:
        if ch in "()":
            if buf.strip():
                out.extend(buf.strip().split())
            buf = ""
            out.append(ch)
        else:
            buf += ch
    if buf.strip():
        out.extend(buf.strip().split())
    return out


def _bp_parse_or(tokens: List[str], pos: int) -> Tuple[List[List[str]], int]:
    left, pos = _bp_parse_and(tokens, pos)
    while pos < len(tokens) and tokens[pos] == "OR":
        right, pos = _bp_parse_and(tokens, pos + 1)
        left = left + right
    return left, pos


def _bp_parse_and(tokens: List[str], pos: int) -> Tuple[List[List[str]], int]:
    left, pos = _bp_parse_atom(tokens, pos)
    while pos < len(tokens) and tokens[pos] == "AND":
        right, pos = _bp_parse_atom(tokens, pos + 1)
        left = [lp + rp for lp in left for rp in right]
    return left, pos


def _bp_parse_atom(tokens: List[str], pos: int) -> Tuple[List[List[str]], int]:
    if pos >= len(tokens):
        return [[]], pos
    if tokens[pos] == "(":
        inner, pos = _bp_parse_or(tokens, pos + 1)
        if pos < len(tokens) and tokens[pos] == ")":
            pos += 1
        return inner, pos
    return [[tokens[pos]]], pos + 1


# ---------------------------------------------------------------------------
# the matrix compiler
# ---------------------------------------------------------------------------

class CompiledFacets:
    """Predicates for one search request.

    bucket_pred[field]: crossing applied to every bucket of ``field``
      (conjunctive fold ∧ ¬negatives ∧ other-field disjunctive unions ∧
      DNF union ∧ query membership).
    result_pred: docs in ``facet_result.ids`` (None = no facet constraint).
    not_pred: docs in ``facet_result.not_ids`` (union of ORIGINAL bitmaps of
      not_filters values, facets.ts:109) or None.
    final_pred: what lib.ts:51-89 materializes -> base(query) ∧ ids ∖ not_ids.
    """

    def __init__(self) -> None:
        self.bucket_pred: Dict[str, tuple] = {}
        self.result_pred: Optional[tuple] = None
        self.not_pred: Optional[tuple] = None
        self.final_pred: tuple = TRUE


def compile_matrix(
    filters_array: List[Any],
    fields: Sequence[str],
    exists: Callable[[str, str], bool],
) -> Tuple[Dict[str, tuple], Optional[tuple]]:
    """``matrix()`` (helpers.ts:147-253) as predicates.

    Returns (bucket_pred per field, neg_union or None). ``filters_array`` is
    the normalized FiltersArray: flat [f, v] conjunctive entries, nested
    [[f, v], ...] disjunctive groups, [f, '-', v] negatives.
    """
    fieldset = set(fields)

    conj_entries = [f for f in filters_array if not isinstance(f[0], list) and len(f) == 2]
    neg_entries = [f for f in filters_array if not isinstance(f[0], list) and len(f) == 3]
    disj_groups = [f for f in filters_array if f and isinstance(f[0], list)]

    def probe(fld: str, raw: Any) -> Tuple[str, bool]:
        if fld not in fieldset:
            raise UnknownFacetFieldError(fld)
        key = js_key(raw)
        return key, (key is not None and exists(fld, key))

    # combination_indexes (helpers.ts:46-72)
    disj_index: Dict[str, tuple] = {}
    for group in disj_groups:
        union = FALSE
        for fld, raw in group:
            key, ok = probe(fld, raw)
            union = OR(union, contains(fld, key) if ok else FALSE)
            disj_index[fld] = union

    # conjunctive fold (helpers.ts:171-194)
    conj_state: Optional[tuple] = None
    for fld, raw in conj_entries:
        key, ok = probe(fld, raw)
        if conj_state is not None and ok:
            conj_state = AND(conj_state, contains(fld, key))
        elif conj_state is not None and not ok:
            conj_state = FALSE
        elif ok:
            conj_state = contains(fld, key)
        # else: leading missing value -> fold state stays undefined

    # negative filters (helpers.ts:212-233)
    neg_parts: List[tuple] = []
    for fld, _, raw in neg_entries:
        key, ok = probe(fld, raw)
        if not ok:
            # reference dereferences the missing bitmap -> TypeError
            raise UnknownFacetFieldError(f"{fld}:{key}")
        neg_parts.append(contains(fld, key))

    common = AND(
        conj_state if conj_state is not None else TRUE,
        *[NOT(p) for p in neg_parts],
    )
    bucket_pred: Dict[str, tuple] = {}
    for fld in fields:
        others = [ix for g, ix in disj_index.items() if g != fld]
        bucket_pred[fld] = AND(common, *others)
    return bucket_pred, (OR(*neg_parts) if neg_parts else None)


def compile_filters_matrix(
    bucket_pred: Dict[str, tuple],
    dnf_paths: List[List[List[str]]],
    fields: Sequence[str],
    exists: Callable[[str, str], bool],
) -> Tuple[Dict[str, tuple], bool]:
    """``filters_matrix()`` (helpers.ts:74-142) applied over already-crossed
    buckets. Returns (new bucket_pred, whether a union was applied)."""
    fieldset = set(fields)
    path_preds: List[tuple] = []
    for path in dnf_paths:
        state: Optional[tuple] = None
        for term in path:
            fld, raw = term[0], term[1]
            if fld not in fieldset:
                raise FacetPanicError(
                    "Panic. The key does not exist in facets lists."
                )
            key = js_key(raw)
            ok = key is not None and exists(fld, key)
            atom = AND(contains(fld, key), bucket_pred[fld]) if ok else None
            if state is not None and atom is not None:
                state = AND(state, atom)
            elif state is not None and atom is None:
                state = FALSE
            elif atom is not None:
                state = atom
        path_preds.append(state if state is not None else FALSE)
    if not path_preds:
        return dict(bucket_pred), False
    dnf_union = OR(*path_preds)
    return {fld: AND(bucket_pred[fld], dnf_union) for fld in fields}, True


def compile_search(
    input: Dict[str, Any],
    aggregations: Dict[str, Dict[str, Any]],
    exists: Callable[[str, str], bool],
    has_query: bool,
) -> CompiledFacets:
    """``exists(field, key)`` probes the facet index for the string key.

    ``has_query`` marks that a full-text / _ids / ids candidate set is
    present; bucket predicates then include ('query',).
    """
    fields = list(aggregations.keys())
    fieldset = set(fields)
    out = CompiledFacets()

    filters_array = input_to_facet_filters(input, aggregations)
    out.bucket_pred, out.not_pred = compile_matrix(filters_array, fields, exists)

    def probe(fld: str, raw: Any) -> Tuple[str, bool]:
        if fld not in fieldset:
            raise UnknownFacetFieldError(fld)
        key = js_key(raw)
        return key, (key is not None and exists(fld, key))

    dnf_applied = False
    if input.get("filters_query"):
        paths = parse_boolean_query(input["filters_query"])
        out.bucket_pred, dnf_applied = compile_filters_matrix(
            out.bucket_pred, paths, fields, exists
        )

    # query_ids crossing (facets.ts:123-139)
    if has_query:
        for fld in fields:
            out.bucket_pred[fld] = AND(QUERY, out.bucket_pred[fld])

    # result ids (facets.ts:141-150)
    if dnf_applied or input.get("filters_query"):
        # filters_ids: union of ALL indexed buckets (helpers.ts:346-358)
        out.result_pred = OR(
            *[AND(("hasvalue", fld), out.bucket_pred[fld]) for fld in fields]
        )
    else:
        terms: List[tuple] = []
        n = 0
        for fld, values in (input.get("filters") or {}).items():
            for raw in values or []:
                n += 1
                key, ok = probe(fld, raw)
                terms.append(
                    AND(contains(fld, key), out.bucket_pred[fld]) if ok else FALSE
                )
        out.result_pred = OR(*terms) if n > 0 else None

    # lib.ts:51-89 combine
    out.final_pred = AND(
        QUERY if has_query else TRUE,
        out.result_pred if out.result_pred is not None else TRUE,
        NOT(out.not_pred) if out.not_pred is not None else TRUE,
    )
    return out


def evaluate(
    pred: tuple,
    doc_keys: Dict[str, Sequence[str]],
    in_query: bool,
) -> bool:
    """Oracle evaluator: ``doc_keys`` maps facet field -> string keys the
    document carries."""
    op = pred[0]
    if op == "true":
        return True
    if op == "false":
        return False
    if op == "and":
        return all(evaluate(p, doc_keys, in_query) for p in pred[1])
    if op == "or":
        return any(evaluate(p, doc_keys, in_query) for p in pred[1])
    if op == "not":
        return not evaluate(pred[1], doc_keys, in_query)
    if op == "contains":
        return pred[2] in doc_keys.get(pred[1], ())
    if op == "hasvalue":
        return len(doc_keys.get(pred[1], ())) > 0
    if op == "query":
        return in_query
    raise ValueError(f"unknown IR node {pred!r}")
