"""In-memory oracle with the reference's exact observable semantics.

This is NOT the product — the product is the Spark engine in
``itemsjs_spark.engine``. The oracle exists so that (a) every assertion in
/root/reference/tests/*.spec.ts can be ported and pinned cheaply, and (b)
randomized differential tests can compare the distributed engine against a
single-node executable spec (SURVEY.md §5 strategy).

It is built from the same semantic cores (``core.facetir``,
``core.scoring``, ``analysis``) the Spark engine compiles from, written
from the line-cited behavior spec in SURVEY.md — not translated source.
"""

from __future__ import annotations

import bisect
import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

from ..analysis.lunr_analysis import build_pipeline, tokenize
from ..core import facetir, scoring
from ..jsutil import (
    humanize,
    is_array_index_key,
    js_is_nan_str,
    js_key,
    js_loose_eq,
    js_parse_int,
)


def _js_truthy(v: Any) -> bool:
    return not (v is None or v is False or v == 0 or v == "" or
                (isinstance(v, float) and math.isnan(v)))


def _parse_paging(input: Dict[str, Any]) -> Tuple[int, int]:
    per_page = input.get("per_page")
    page = input.get("page")
    per_page = js_parse_int(per_page if _js_truthy(per_page) else 12)
    page = js_parse_int(page if _js_truthy(page) else 1)
    return int(per_page), int(page)


class FulltextOracle:
    """lunr-1.0.0-equivalent index over a list of dicts.

    Mirrors /root/reference/src/fulltext.ts: fields = hardcoded
    ('name', boost 10) + each searchableFields entry (boost 1, duplicates
    kept); ref = _id (1-based input order)."""

    def __init__(self, items: List[Dict[str, Any]], config: Optional[dict] = None):
        config = config or {}
        searchable = config.get("searchableFields") or []
        self.fields: List[Tuple[str, float]] = [("name", 10.0)] + [
            (f, 1.0) for f in searchable
        ]
        self.pipeline = build_pipeline(
            is_exact_search=bool(config.get("isExactSearch")),
            remove_stop_word_filter=bool(config.get("removeStopWordFilter")),
        )
        self.items = items
        self.store: Dict[int, Dict[str, Any]] = {}
        # postings: term -> {ref(str): tf}
        self.postings: Dict[str, Dict[str, float]] = {}
        self.doc_terms: Dict[str, Dict[str, float]] = {}
        self.n_docs = 0
        self._sorted_terms: List[str] = []

        i = 1
        for item in items:
            item["_id"] = i
            self.store[i] = item
            ref = str(i)
            field_tokens = [
                (self.pipeline(tokenize(item.get(name))), boost)
                for name, boost in self.fields
            ]
            tfs = scoring.doc_tf(field_tokens)
            self.doc_terms[ref] = tfs
            for term, tf in tfs.items():
                self.postings.setdefault(term, {})[ref] = tf
            self.n_docs += 1
            i += 1
        self._sorted_terms = sorted(self.postings.keys())

    # --- index accessors -------------------------------------------------
    def expand(self, token: str) -> List[str]:
        lo = bisect.bisect_left(self._sorted_terms, token)
        out = []
        for t in self._sorted_terms[lo:]:
            if not t.startswith(token):
                break
            out.append(t)
        return out

    def idf(self, term: str) -> float:
        return scoring.idf(self.n_docs, len(self.postings.get(term, {})))

    # --- query -----------------------------------------------------------
    def ranked_search(self, query: str) -> List[Tuple[str, float]]:
        """(ref, score) in lunr order: score desc, ref string asc."""
        tokens = self.pipeline(tokenize(query))
        qv = scoring.build_query_vector(
            tokens,
            n_fields=len(self.fields),
            boosts_sum=sum(b for _, b in self.fields),
            expand=self.expand,
            idf_of=self.idf,
        )
        if not qv.has_some_token:
            return []
        # candidate set: intersection over tokens of their expansions' docs
        cand: Optional[set] = None
        for i in range(qv.n_tokens):
            docs: set = set()
            for term, toks in qv.term_tokens.items():
                if i in toks:
                    docs.update(self.postings[term].keys())
            cand = docs if cand is None else (cand & docs)
        refs = sorted(cand or set())  # SortedSet of string refs
        scored = [
            (ref, scoring.score_doc(qv, self.doc_terms[ref], self.idf))
            for ref in refs
        ]
        scored.sort(key=lambda rs: -rs[1])  # stable: ties stay ref-str asc
        return scored

    def search(self, query: Optional[str] = None,
               filter: Optional[Callable] = None) -> List[int]:
        if not query and not filter:
            return [it["_id"] for it in self.items]
        items: Optional[List[Dict[str, Any]]] = None
        if query:
            items = [self.store[int(ref)] for ref, _ in self.ranked_search(query)]
        if callable(filter):
            items = [it for it in (items if items is not None else self.items)
                     if filter(it)]
        return [it["_id"] for it in items or []]


class FacetsOracle:
    """Facet index + matrix semantics over list-of-dicts (facets.ts)."""

    def __init__(self, items: List[Dict[str, Any]], configuration: Optional[dict] = None):
        configuration = configuration or {}
        self.config: Dict[str, dict] = configuration.get("aggregations") or {}
        self.items = items
        self.fields = list(self.config.keys())

        i = 1
        for item in items:
            item["_id"] = i
            i += 1
        self._ids = list(range(1, len(items) + 1))
        self._items_map = {it["_id"]: it for it in items}

        self.ids_map: Dict[Any, int] = {}
        id_field = configuration.get("custom_id_field", "id")
        for it in items:
            if _js_truthy(it.get(id_field)) and _js_truthy(it.get("_id")):
                self.ids_map[it[id_field]] = it["_id"]

        # doc_keys: _id -> field -> ordered list of string keys
        self.doc_keys: Dict[int, Dict[str, List[str]]] = {}
        # data: field -> key -> sorted posting list; key order = JS enum order
        self.data: Dict[str, Dict[str, List[int]]] = {f: {} for f in self.fields}
        for it in items:
            dk: Dict[str, List[str]] = {}
            for f in self.fields:
                v = it.get(f)
                keys: List[str] = []
                if isinstance(v, (list, tuple)):
                    for el in v:
                        k = js_key(el)
                        if k is not None:
                            keys.append(k)
                else:
                    k = js_key(v)
                    if k is not None:
                        keys.append(k)
                dk[f] = keys
                for k in keys:
                    self.data[f].setdefault(k, [])
                    if it["_id"] not in self.data[f][k]:
                        self.data[f][k].append(it["_id"])
            self.doc_keys[it["_id"]] = dk
        # JS object enumeration order: canonical array-index keys ascending
        # first, then string keys in insertion order
        for f in self.fields:
            entries = list(self.data[f].items())
            idx_keys = sorted(
                (k for k, _ in entries if is_array_index_key(k)), key=int
            )
            str_keys = [k for k, _ in entries if not is_array_index_key(k)]
            self.data[f] = {k: sorted(self.data[f][k]) for k in idx_keys + str_keys}

    def exists(self, fld: str, key: str) -> bool:
        return key in self.data.get(fld, {})

    def get_item(self, _id: int) -> Dict[str, Any]:
        return self._items_map[_id]

    def internal_ids_from_ids_map(self, ids: Sequence[Any]) -> List[int]:
        return [self.ids_map.get(v) for v in ids]

    def eval_pred(self, pred: tuple, _id: int, query_ids: Optional[set]) -> bool:
        in_query = query_ids is None or _id in query_ids
        return facetir.evaluate(pred, self.doc_keys[_id], in_query)

    def search(self, input: Dict[str, Any], query_ids: Optional[set] = None):
        compiled = facetir.compile_search(
            input, self.config, self.exists, has_query=query_ids is not None
        )
        return compiled

    # --- test helpers mirroring facets.search(..., {test: true}) ----------
    def _postings_for(self, pred_by_field, query_ids=None):
        out: Dict[str, Dict[str, List[int]]] = {}
        for fld, keyed in self.data.items():
            out[fld] = {}
            for key, postings in keyed.items():
                p = facetir.AND(pred_by_field[fld], facetir.contains(fld, key))
                out[fld][key] = [
                    _id for _id in postings if self.eval_pred(p, _id, query_ids)
                ]
        return out

    def matrix_postings(self, filters_array, query_ids=None):
        """Golden posting arrays after matrix() crossing (matrix.spec)."""
        bucket_pred, _ = facetir.compile_matrix(
            filters_array, self.fields or list(self.data.keys()), self.exists
        )
        return self._postings_for(bucket_pred, query_ids)

    def filters_matrix_postings(self, dnf_paths):
        """Goldens after filters_matrix() over fresh buckets
        (filtersMatrix.spec)."""
        fields = self.fields or list(self.data.keys())
        base = {f: facetir.TRUE for f in fields}
        bucket_pred, _ = facetir.compile_filters_matrix(
            base, dnf_paths, fields, self.exists
        )
        return self._postings_for(bucket_pred)

    def search_postings(self, input: Dict[str, Any], query_ids: Optional[set] = None):
        """Goldens for facets.search(input, {test: true}) (facets.spec)."""
        compiled = self.search(input, query_ids)
        return self._postings_for(compiled.bucket_pred, query_ids)

    def facets_ids_of(self, input: Dict[str, Any], query_ids: Optional[set] = None):
        """helpers.facets_ids over crossed buckets, as sorted id list or
        None."""
        compiled = self.search(input, query_ids)
        if compiled.result_pred is None:
            return None
        return [
            _id for _id in self._ids
            if self.eval_pred(compiled.result_pred, _id, query_ids)
        ]


class ItemsJSOracle:
    """Public API mirroring itemsjs(items, configuration)."""

    def __init__(self, items: List[Dict[str, Any]], configuration: Optional[dict] = None):
        self.items = items
        self.configuration = configuration or {}
        self.configuration.setdefault("aggregations", {})
        self.fulltext: Optional[FulltextOracle] = None
        if self.configuration.get("native_search_enabled") is not False:
            self.fulltext = FulltextOracle(items, self.configuration)
        self.facets = FacetsOracle(items, self.configuration)

    # -- search (lib.ts:19-169) -------------------------------------------
    def search(self, input: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        input = input or {}
        per_page, page = _parse_paging(input)

        if self.configuration.get("native_search_enabled") is False and (
            input.get("query") or input.get("filter")
        ):
            raise ValueError(
                '"query" and "filter" options are not working once native search is disabled'
            )

        query_ids: Optional[set] = None
        _ids: Optional[List[int]] = None
        # JS truthiness: an empty array is truthy, so presence of the key
        # (non-null) selects the branch even for []
        if input.get("_ids") is not None:
            _ids = list(input["_ids"])
            query_ids = set(_ids)
        elif input.get("ids") is not None:
            _ids = self.facets.internal_ids_from_ids_map(input["ids"])
            query_ids = set(_ids)
        elif self.fulltext and (input.get("query") or input.get("filter")):
            _ids = self.fulltext.search(input.get("query"), input.get("filter"))
            query_ids = set(_ids)

        compiled = self.facets.search(input, query_ids)

        filtered_indexes = [
            _id
            for _id in self.facets._ids
            if self.facets.eval_pred(compiled.final_pred, _id, query_ids)
        ]
        filtered_items = [self.facets.get_item(_id) for _id in filtered_indexes]

        pagination_applied = False
        if input.get("sort"):
            filtered_items = sorted_items(
                filtered_items, input["sort"], self.configuration.get("sortings")
            )
        elif _ids is not None:
            member = set(filtered_indexes)
            filtered_indexes = [v for v in _ids if v in member]
            page_ids = filtered_indexes[(page - 1) * per_page : page * per_page]
            filtered_items = [self.facets.get_item(v) for v in page_ids]
            pagination_applied = True

        all_filtered_items = None
        if not pagination_applied:
            if input.get("is_all_filtered_items"):
                all_filtered_items = list(filtered_items)
            filtered_items = filtered_items[(page - 1) * per_page : page * per_page]

        return {
            "pagination": {
                "per_page": per_page,
                "page": page,
                "total": len(filtered_indexes),
            },
            "timings": {"total": 0, "facets": 0, "search": 0, "sorting": 0},
            "data": {
                "items": filtered_items,
                "allFilteredItems": all_filtered_items,
                "aggregations": self._get_buckets(compiled, input, query_ids),
            },
        }

    # -- getBuckets (helpers.ts:388-520) ------------------------------------
    def _get_buckets(self, compiled, input, query_ids) -> Dict[str, Any]:
        aggregations = self.configuration["aggregations"]
        out: Dict[str, Any] = {}
        position = 1
        for fld in self.facets.fields:
            agg = aggregations.get(fld) or {}
            order = agg.get("order")
            sort = agg.get("sort")
            size = agg.get("size")
            title = agg.get("title")
            show_facet_stats = agg.get("show_facet_stats") or False
            chosen_on_top = agg.get("chosen_filters_on_top") is not False
            hide_zero = agg.get("hide_zero_doc_count") or False

            raw_filters = (input.get("filters") or {}).get(fld) or []
            pred = compiled.bucket_pred[fld]

            buckets = []
            counts: Dict[str, int] = {}
            for key, postings in self.facets.data[fld].items():
                doc_count = sum(
                    1
                    for _id in postings
                    if self.facets.eval_pred(
                        facetir.AND(pred, facetir.contains(fld, key)), _id, query_ids
                    )
                )
                counts[key] = doc_count
                selected = any(
                    isinstance(rv, str) and rv == key for rv in raw_filters
                )
                if hide_zero and doc_count == 0 and not selected:
                    continue
                buckets.append(
                    {"key": key, "doc_count": doc_count, "selected": selected}
                )

            if isinstance(sort, list):
                iteratees = list(sort) if sort else ["key"]
                sort_order = list(order) if order else ["asc"]
            else:
                if sort in ("term", "key"):
                    iteratees = ["key"]
                    sort_order = [order or "asc"]
                else:
                    iteratees = ["doc_count", "key"]
                    sort_order = [order or "desc", "asc"]
                if chosen_on_top:
                    iteratees.insert(0, "selected")
                    sort_order.insert(0, "desc")

            buckets = _order_by(buckets, iteratees, sort_order)
            buckets = buckets[: (size or 10)]

            entry: Dict[str, Any] = {
                "name": fld,
                "title": title or humanize(fld),
                "position": position,
                "buckets": buckets,
            }
            position += 1

            if show_facet_stats:
                vals: List[float] = []
                for key, postings in self.facets.data[fld].items():
                    if js_is_nan_str(key):
                        raise ValueError(
                            "You cant use chars to calculate the facet_stats."
                        )
                    c = counts[key]
                    if c > 0:
                        vals.extend([js_parse_int(key)] * c)
                entry["facet_stats"] = {
                    "min": min(vals) if vals else None,
                    "max": max(vals) if vals else None,
                    "avg": (sum(vals) / len(vals)) if vals else float("nan"),
                    "sum": sum(vals),
                }
            out[fld] = entry
        return out

    # -- aggregation endpoint (lib.ts:253-299) ------------------------------
    def aggregation(self, input: Dict[str, Any]) -> Dict[str, Any]:
        per_page = input.get("per_page") or 10
        page = input.get("page") or 1
        name = input.get("name")
        aggs = self.configuration.get("aggregations")
        if name and (not aggs or name not in aggs):
            raise ValueError(f'Please define aggregation "{name}" in config')
        if not name:
            raise ValueError("field name is required")
        search_input = dict(input)
        search_input["page"] = 1
        search_input["per_page"] = 0
        # reference mutates config permanently (lib.ts:283-284)
        aggs[name]["size"] = 10000
        result = self.search(search_input)
        buckets = result["data"]["aggregations"][name]["buckets"]
        return {
            "pagination": {
                "per_page": per_page,
                "page": page,
                "total": len(buckets),
            },
            "data": {"buckets": buckets[(page - 1) * per_page : page * per_page]},
        }

    # -- similar endpoint (lib.ts:198-247) -----------------------------------
    def similar(self, id: Any, options: Dict[str, Any]) -> Dict[str, Any]:
        per_page = options.get("per_page") or 10
        page = options.get("page") or 1
        minimum = options.get("minimum") or 0
        if not options.get("field"):
            raise ValueError("Please define field in options")
        field = options["field"]

        anchor = None
        for it in self.items:
            if js_loose_eq(it.get("id"), id):
                anchor = it
                break
        if anchor is None:
            raise TypeError("anchor item not found")

        anchor_vals = anchor.get(field)
        anchor_list = list(anchor_vals) if isinstance(anchor_vals, (list, tuple)) else []

        rows = []
        for it in self.items:
            if it.get("id") == id and type(it.get("id")) is type(id):
                continue  # strict !== exclusion
            vals = it.get(field)
            vlist = list(vals) if isinstance(vals, (list, tuple)) else []
            inter = [v for v in anchor_list if v in vlist]
            if len(inter) >= minimum:
                row = dict(it)
                row["intersection_length"] = len(inter)
                rows.append(row)
        rows = _order_by(rows, ["intersection_length"], ["desc"])
        return {
            "pagination": {
                "per_page": per_page,
                "page": page,
                "total": len(rows),
            },
            "data": {"items": rows[(page - 1) * per_page : page * per_page]},
        }


def sorted_items(items, sort, sortings=None):
    """lib.ts:174-192 — named sorting or inline {field, order} spec."""
    if sortings and isinstance(sort, str) and sort in sortings:
        sort = sortings[sort]
    if isinstance(sort, dict) and sort.get("field"):
        fields = sort["field"]
        orders = sort.get("order") or "asc"
        if not isinstance(fields, list):
            fields = [fields]
        if not isinstance(orders, list):
            orders = [orders]
        return _order_by(items, fields, orders)
    return items


from ..core.ordering import order_by as _order_by  # noqa: E402
