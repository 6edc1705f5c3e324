"""Ports of every golden assertion in /root/reference/tests/*.spec.ts,
run against the in-memory oracle (the executable spec the Spark engine is
differentially tested against).

File-by-file mapping noted per test class.
"""

import math

import pytest

from itemsjs_spark.core import facetir
from itemsjs_spark.oracle.itemsjs_oracle import (
    FacetsOracle,
    FulltextOracle,
    ItemsJSOracle,
    sorted_items,
)

import fixtures as fx


def build_facets(items, aggregations):
    return FacetsOracle(fx.fresh(items), {"aggregations": aggregations})


def build_items(items, configuration=None):
    return ItemsJSOracle(fx.fresh(items), configuration or {"aggregations": {}})


# ---------------------------------------------------------------------------
# fulltext.spec.ts
# ---------------------------------------------------------------------------
class TestFulltext:
    def test_checks_search(self):
        ft = FulltextOracle(fx.fresh(fx.FULLTEXT_ITEMS))
        assert len(ft.search("club")) == 1
        assert len(ft.search("gump")) == 1
        assert len(ft.search("forrest gump")) == 1
        assert len(ft.search("forrest GUMP")) == 1
        gump = ft.store[ft.search("gump")[0]]
        assert gump["name"] == "Forrest Gump"
        assert gump["_id"] == 3
        assert "id" not in gump
        assert len(ft.search("titanic")) == 0
        assert len(ft.search()) == 3

    def test_checks_search_with_defined_ids(self):
        ft = FulltextOracle(fx.fresh(fx.FULLTEXT_ITEMS_WITH_IDS))
        gump = ft.store[ft.search("gump")[0]]
        assert gump["name"] == "Forrest Gump"
        assert gump["_id"] == 3
        assert gump["id"] == 30
        assert len(ft.search("titanic")) == 0
        assert len(ft.search()) == 3

    def test_search_on_other_fields(self):
        ft = FulltextOracle(
            fx.fresh(fx.FULLTEXT_ITEMS), {"searchableFields": ["name", "tags"]}
        )
        assert len(ft.search("vietnam")) == 1
        assert len(ft.search("dark")) == 1
        assert len(ft.search("anti")) == 1

    def test_stepping_through_characters_exact(self):
        ft = FulltextOracle(
            fx.fresh(fx.SPECIAL_ITEMS),
            {"searchableFields": ["name"], "isExactSearch": True},
        )
        for q in ["e", "el", "ela", "elat", "elati", "elatio", "elation",
                  "s", "so", "sou", "sour", "sourc", "source"]:
            assert len(ft.search(q)) == 1, q

    def test_stepping_through_characters_stopwords(self):
        with_sw = FulltextOracle(
            fx.fresh(fx.SPECIAL_ITEMS), {"searchableFields": ["name"]}
        )
        without_sw = FulltextOracle(
            fx.fresh(fx.SPECIAL_ITEMS),
            {"searchableFields": ["name"], "removeStopWordFilter": True},
        )
        assert len(with_sw.search("h")) == 1
        assert len(with_sw.search("he")) == 0  # stopword
        assert len(with_sw.search("hea")) == 1
        assert len(with_sw.search("head")) == 1
        assert len(without_sw.search("h")) == 1
        assert len(without_sw.search("he")) == 1
        assert len(without_sw.search("hea")) == 1
        assert len(without_sw.search("head")) == 1


# ---------------------------------------------------------------------------
# facets.spec.ts
# ---------------------------------------------------------------------------
CONJ_AGG = {
    "tags": {"conjunction": True},
    "actors": {"title": "Stars", "conjunction": True},
    "category": {"title": "Category", "conjunction": True},
}


class TestFacetsConjunctive:
    def test_checks_index(self):
        f = build_facets(fx.FACETS_ITEMS, CONJ_AGG)
        assert f.data["tags"]["a"] == [1, 2, 3, 4]
        assert f.data["tags"]["b"] == [1]
        assert f.data["tags"]["c"] == [1, 3, 4]
        assert f.data["tags"]["d"] == [1]
        assert f.data["tags"]["e"] == [2]
        assert f.data["tags"]["z"] == [4]
        assert f.data["actors"]["jean"] == [4]
        assert f.data["actors"]["john"] == [1, 2]

    def test_facets_for_two_fields(self):
        f = build_facets(fx.FACETS_ITEMS, CONJ_AGG)
        input = {"filters": {"tags": ["c"]}}
        data = f.search_postings(input)
        assert data["tags"]["a"] == [1, 3, 4]
        assert data["tags"]["c"] == [1, 3, 4]
        assert data["tags"]["e"] == []
        assert data["actors"]["john"] == [1]
        assert data["category"]["comedy"] == [3]
        assert f.facets_ids_of(input) == [1, 3, 4]

        oracle = ItemsJSOracle(fx.fresh(fx.FACETS_ITEMS), {"aggregations": dict(CONJ_AGG)})
        res = oracle.search(input)
        assert res["pagination"]["total"] == 3
        aggs = res["data"]["aggregations"]
        assert aggs["tags"]["buckets"][0]["doc_count"] == 3
        assert aggs["tags"]["buckets"][0]["key"] == "c"
        assert aggs["tags"]["title"] == "Tags"
        assert aggs["actors"]["title"] == "Stars"
        assert aggs["category"]["title"] == "Category"

    def test_search_works_on_copy(self):
        f = build_facets(fx.FACETS_ITEMS, CONJ_AGG)
        data = f.search_postings({"filters": {"tags": ["e"]}})
        assert data["tags"]["a"] == [2]
        assert data["tags"]["e"] == [2]

    def test_facets_empty_input(self):
        f = build_facets(fx.FACETS_ITEMS, CONJ_AGG)
        data = f.search_postings({"filters": {}})
        assert data["tags"]["a"] == [1, 2, 3, 4]
        assert data["tags"]["e"] == [2]
        assert f.facets_ids_of({"filters": {}}) is None

        oracle = ItemsJSOracle(fx.fresh(fx.FACETS_ITEMS), {"aggregations": dict(CONJ_AGG)})
        res = oracle.search({"filters": {}})
        assert res["pagination"]["total"] == 4
        assert res["data"]["aggregations"]["tags"]["buckets"][0]["doc_count"] == 4
        assert res["data"]["aggregations"]["tags"]["buckets"][0]["key"] == "a"

        data = f.search_postings({"filters": {"tags": []}})
        assert data["tags"]["a"] == [1, 2, 3, 4]
        assert data["tags"]["e"] == [2]

    def test_facets_cross_filters(self):
        f = build_facets(fx.FACETS_ITEMS, CONJ_AGG)
        data = f.search_postings({"filters": {"tags": ["a"], "actors": ["john"]}})
        assert data["tags"]["a"] == [1, 2]
        assert data["tags"]["e"] == [2]
        assert data["actors"]["john"] == [1, 2]
        assert data["actors"]["jean"] == []


class TestFacetsDisjunctive:
    AGG = {
        "tags": {"conjunction": False},
        "actors": {"conjunction": False},
        "category": {"conjunction": False},
    }

    def test_returns_facets(self):
        f = build_facets(fx.FACETS_ITEMS, self.AGG)
        data = f.search_postings({"filters": {"tags": ["c"]}})
        assert data["tags"]["a"] == [1, 2, 3, 4]
        assert data["tags"]["c"] == [1, 3, 4]
        assert data["tags"]["e"] == [2]
        assert data["actors"]["john"] == [1]

    def test_two_filters(self):
        f = build_facets(fx.FACETS_ITEMS, self.AGG)
        data = f.search_postings({"filters": {"tags": ["z", "f"]}})
        assert data["tags"]["a"] == [1, 2, 3, 4]
        assert data["tags"]["c"] == [1, 3, 4]
        assert data["tags"]["f"] == [2]
        assert data["tags"]["z"] == [4]
        assert data["actors"]["brad"] == [2]
        assert data["actors"]["jean"] == [4]
        assert data["category"]["comedy"] == [2]
        assert data["category"]["drama"] == [4]


class TestFacetsMixed:
    AGG = {
        "tags": {"conjunction": True},
        "actors": {"conjunction": True},
        "category": {"conjunction": False},
    }

    def test_returns_facets(self):
        f = build_facets(fx.FACETS_ITEMS, self.AGG)
        data = f.search_postings({"filters": {"tags": ["c"]}})
        assert data["tags"]["a"] == [1, 3, 4]
        assert data["tags"]["e"] == []
        assert data["actors"]["john"] == [1]
        assert data["category"]["comedy"] == [3]

    def test_cross_filters(self):
        f = build_facets(fx.FACETS_ITEMS, self.AGG)
        input = {"filters": {"tags": ["c"], "category": ["drama"]}}
        data = f.search_postings(input)
        assert data["tags"]["a"] == [1, 4]
        assert data["tags"]["c"] == [1, 4]
        assert data["tags"]["e"] == []
        assert data["actors"]["john"] == [1]
        assert data["actors"]["alex"] == [1]
        assert data["category"]["comedy"] == [3]
        assert data["category"]["drama"] == [1, 4]
        assert f.facets_ids_of(input) == [1, 4]


class TestFacetsCrossedWithQuery:
    AGG = {
        "tags": {"conjunction": True},
        "actors": {"conjunction": True},
        "category": {"conjunction": False},
    }

    def test_query_ids_crossing(self):
        f = build_facets(fx.FACETS_ITEMS, self.AGG)
        data = f.search_postings({"filters": {"tags": ["c"]}})
        assert data["tags"]["a"] == [1, 3, 4]
        assert data["actors"]["john"] == [1]
        assert data["category"]["comedy"] == [3]

        data = f.search_postings({"filters": {"tags": ["c"]}}, query_ids={1})
        assert data["tags"]["a"] == [1]
        assert data["tags"]["e"] == []
        assert data["actors"]["john"] == [1]
        assert data["category"]["comedy"] == []

    def test_search_query_john(self):
        oracle = ItemsJSOracle(
            fx.fresh(fx.FACETS_ITEMS),
            {"aggregations": fx.fresh(self.AGG), "searchableFields": ["actors"]},
        )
        res = oracle.search({"query": "john"})
        b0 = res["data"]["aggregations"]["tags"]["buckets"][0]
        assert b0["key"] == "a"
        assert b0["doc_count"] == 2


class TestFacetsSymmetricDisjunctive:
    def test_sergeyre(self):
        items = [{"a": 1, "b": 3}, {"a": 1, "b": 4}, {"a": 2, "b": 3}, {"a": 2, "b": 4}]
        f = build_facets(items, {"a": {"conjunction": False}, "b": {"conjunction": False}})
        data = f.search_postings({"filters": {"b": [3], "a": [1]}})
        assert data["a"]["1"] == [1]
        assert data["a"]["2"] == [3]
        assert data["b"]["3"] == [1]
        assert data["b"]["4"] == [2]


# ---------------------------------------------------------------------------
# matrix.spec.ts (via compile_matrix)
# ---------------------------------------------------------------------------
class TestMatrix9:
    FIELDS = ["a", "b", "c"]

    def facets(self):
        return build_facets(fx.MATRIX_9, {f: {} for f in self.FIELDS})

    def test_no_argument(self):
        d = self.facets().matrix_postings([])
        assert d["a"]["1"] == [1, 2, 4, 6, 7]
        assert d["a"]["2"] == [3, 5, 8, 9]
        assert d["b"]["2"] == [1, 4, 6, 9]
        assert d["b"]["3"] == [2, 3, 5, 7, 8]
        assert d["c"]["3"] == [1, 2, 3, 4, 5, 6, 7, 8, 9]

    def test_some_values(self):
        d = self.facets().matrix_postings([["a", 2]])
        assert d["a"]["1"] == []
        assert d["a"]["2"] == [3, 5, 8, 9]
        assert d["b"]["2"] == [9]
        assert d["b"]["3"] == [3, 5, 8]
        assert d["c"]["3"] == [3, 5, 8, 9]

    def test_not_existing_value(self):
        d = self.facets().matrix_postings([["a", 2], ["c", 2]])
        for fld, key in [("a", "1"), ("a", "2"), ("b", "2"), ("b", "3"), ("c", "3")]:
            assert d[fld][key] == []

    def test_disjunctive_same_field(self):
        d = self.facets().matrix_postings([[["a", 1], ["a", 2]]])
        assert d["a"]["1"] == [1, 2, 4, 6, 7]
        assert d["a"]["2"] == [3, 5, 8, 9]
        assert d["b"]["2"] == [1, 4, 6, 9]
        assert d["b"]["3"] == [2, 3, 5, 7, 8]
        assert d["c"]["3"] == [1, 2, 3, 4, 5, 6, 7, 8, 9]

    def test_disjunctive_ittocean(self):
        d = self.facets().matrix_postings([[["a", 1]], [["b", 2]], [["c", 3]]])
        assert d["a"]["1"] == [1, 4, 6]
        assert d["a"]["2"] == [9]
        assert d["b"]["2"] == [1, 4, 6]
        assert d["b"]["3"] == [2, 7]
        assert d["c"]["3"] == [1, 4, 6]


class TestMatrix3:
    FIELDS = ["a", "b", "c"]

    def facets(self):
        return build_facets(fx.MATRIX_3, {f: {} for f in self.FIELDS})

    def test_disjunctive_two_values(self):
        d = self.facets().matrix_postings([[["a", 1], ["a", 2]]])
        assert d["a"]["1"] == [1]
        assert d["a"]["2"] == [2]
        assert d["a"]["3"] == [3]
        assert d["b"]["1"] == [1]
        assert d["b"]["2"] == [2]
        assert d["b"]["3"] == []
        assert d["c"]["3"] == [1, 2]

    def test_one_disjunctive_value(self):
        d = self.facets().matrix_postings([[["a", 1]]])
        assert d["a"]["1"] == [1]
        assert d["a"]["2"] == [2]
        assert d["a"]["3"] == [3]
        assert d["b"]["1"] == [1]
        assert d["b"]["2"] == []
        assert d["b"]["3"] == []
        assert d["c"]["3"] == [1]

    def test_many_disjunctive_values(self):
        d = self.facets().matrix_postings([[["a", 1]], [["b", 1]], [["c", 3]]])
        assert d["a"]["1"] == [1]
        assert d["a"]["2"] == []
        assert d["a"]["3"] == []
        assert d["b"]["1"] == [1]
        assert d["b"]["2"] == []
        assert d["b"]["3"] == []
        assert d["c"]["3"] == [1]

    def test_negative(self):
        d = self.facets().matrix_postings([["a", "-", 1]])
        assert d["a"]["1"] == []
        assert d["a"]["2"] == [2]
        assert d["a"]["3"] == [3]
        assert d["b"]["1"] == []
        assert d["b"]["2"] == [2]
        assert d["b"]["3"] == [3]
        assert d["c"]["3"] == [2, 3]

    def test_negative_two(self):
        d = self.facets().matrix_postings([["a", "-", 1], ["b", "-", 2]])
        assert d["a"]["1"] == []
        assert d["a"]["2"] == []
        assert d["a"]["3"] == [3]
        assert d["b"]["1"] == []
        assert d["b"]["2"] == []
        assert d["b"]["3"] == [3]
        assert d["c"]["3"] == [3]


class TestMatrix4:
    def facets(self):
        return build_facets(fx.MATRIX_4, {"a": {}, "b": {}})

    def test_no_filters(self):
        d = self.facets().matrix_postings([])
        assert d["a"]["1"] == [1, 2]
        assert d["a"]["2"] == [3, 4]
        assert d["b"]["3"] == [1, 3]
        assert d["b"]["4"] == [2, 4]

    def test_two_disjunctive_groups(self):
        d = self.facets().matrix_postings([[["b", 3]], [["a", 1]]])
        assert d["a"]["1"] == [1]
        assert d["a"]["2"] == [3]
        assert d["b"]["3"] == [1]
        assert d["b"]["4"] == [2]


# ---------------------------------------------------------------------------
# filtersMatrix.spec.ts
# ---------------------------------------------------------------------------
class TestFiltersMatrix:
    FIELDS = ["a", "b", "c"]

    def facets(self):
        return build_facets(fx.MATRIX_9, {f: {} for f in self.FIELDS})

    def all_ids(self, f, d):
        out = set()
        for keyed in d.values():
            for ids in keyed.values():
                out.update(ids)
        return sorted(out)

    def test_no_argument(self):
        f = self.facets()
        d = f.filters_matrix_postings([])
        assert d["a"]["1"] == [1, 2, 4, 6, 7]
        assert d["c"]["3"] == [1, 2, 3, 4, 5, 6, 7, 8, 9]
        assert self.all_ids(f, d) == [1, 2, 3, 4, 5, 6, 7, 8, 9]

    def test_one_value(self):
        f = self.facets()
        d = f.filters_matrix_postings(facetir.parse_boolean_query("(a:2)"))
        assert d["a"]["1"] == []
        assert d["a"]["2"] == [3, 5, 8, 9]
        assert d["b"]["2"] == [9]
        assert d["b"]["3"] == [3, 5, 8]
        assert d["c"]["3"] == [3, 5, 8, 9]
        assert self.all_ids(f, d) == [3, 5, 8, 9]

    def test_or_returns_all(self):
        f = self.facets()
        d = f.filters_matrix_postings(facetir.parse_boolean_query("(a:2) OR c:3"))
        assert d["a"]["1"] == [1, 2, 4, 6, 7]
        assert d["c"]["3"] == [1, 2, 3, 4, 5, 6, 7, 8, 9]
        assert self.all_ids(f, d) == [1, 2, 3, 4, 5, 6, 7, 8, 9]

    def test_and_contradiction(self):
        f = self.facets()
        d = f.filters_matrix_postings(facetir.parse_boolean_query("a:2 AND a:1"))
        for fld, key in [("a", "1"), ("a", "2"), ("b", "2"), ("b", "3"), ("c", "3")]:
            assert d[fld][key] == []
        assert self.all_ids(f, d) == []

    def test_and_not_existing_value(self):
        d = self.facets().filters_matrix_postings(
            facetir.parse_boolean_query("a:2 AND a:10")
        )
        for fld, key in [("a", "1"), ("a", "2"), ("b", "2"), ("b", "3"), ("c", "3")]:
            assert d[fld][key] == []

    def test_not_existing_value(self):
        d = self.facets().filters_matrix_postings(
            facetir.parse_boolean_query("a:10")
        )
        for fld, key in [("a", "1"), ("a", "2"), ("b", "2"), ("b", "3"), ("c", "3")]:
            assert d[fld][key] == []

    def test_not_existing_key_panics(self):
        with pytest.raises(facetir.FacetPanicError) as e:
            self.facets().filters_matrix_postings(
                facetir.parse_boolean_query("e:10")
            )
        assert str(e.value) == "Panic. The key does not exist in facets lists."


# ---------------------------------------------------------------------------
# parser.spec.ts
# ---------------------------------------------------------------------------
class TestParser:
    def test_conjunction(self):
        r = facetir.input_to_facet_filters(
            {"filters": {"tags": ["novel", "90s"]}}, {"tags": {"conjunction": True}}
        )
        assert r == [["tags", "novel"], ["tags", "90s"]]

    def test_disjunction(self):
        r = facetir.input_to_facet_filters(
            {"filters": {"tags": ["novel", "90s"]}}, {"tags": {"conjunction": False}}
        )
        assert r == [[["tags", "novel"], ["tags", "90s"]]]

    def test_conj_and_disj(self):
        r = facetir.input_to_facet_filters(
            {"filters": {"tags": ["novel"], "category": ["Western"]}},
            {"tags": {"conjunction": False}, "category": {"conjunction": True}},
        )
        assert r == [[["tags", "novel"]], ["category", "Western"]]

    def test_two_disjunctive_groups(self):
        r = facetir.input_to_facet_filters(
            {"filters": {"tags": ["novel"], "category": ["Western"]}},
            {"tags": {"conjunction": False}, "category": {"conjunction": False}},
        )
        assert r == [[["tags", "novel"]], [["category", "Western"]]]

    def test_negative(self):
        r = facetir.input_to_facet_filters(
            {"not_filters": {"tags": ["novel", "90s"]}},
            {"tags": {"conjunction": True}},
        )
        assert r == [["tags", "-", "novel"], ["tags", "-", "90s"]]

    def test_all_kinds(self):
        r = facetir.input_to_facet_filters(
            {
                "filters": {"tags": ["novel"], "category": ["Western"]},
                "not_filters": {"tags": ["80s"]},
            },
            {"tags": {"conjunction": False}, "category": {"conjunction": True}},
        )
        assert r == [[["tags", "novel"]], ["category", "Western"], ["tags", "-", "80s"]]

    def test_boolean_conjunction(self):
        r = facetir.parse_boolean_query("(tags:novel AND tags:90s)")
        assert r == [[["tags", "novel"], ["tags", "90s"]]]

    def test_boolean_disjunction(self):
        r = facetir.parse_boolean_query("(tags:novel OR tags:90s)")
        assert r == [[["tags", "novel"]], [["tags", "90s"]]]

    def test_boolean_mixed(self):
        r = facetir.parse_boolean_query("tags:novel OR category:Western")
        assert r == [[["tags", "novel"]], [["category", "Western"]]]

    def test_boolean_distribution(self):
        r = facetir.parse_boolean_query("(a:x OR b:y) AND c:z")
        assert r == [[["a", "x"], ["c", "z"]], [["b", "y"], ["c", "z"]]]


# ---------------------------------------------------------------------------
# search.spec.ts
# ---------------------------------------------------------------------------
SEARCH_CONFIG = {
    "searchableFields": ["name", "category", "actors", "name"],
    "aggregations": {
        "tags": {"title": "Tags", "conjunction": True},
        "actors": {"title": "Actors", "conjunction": True},
        "year": {"title": "Year", "conjunction": True},
        "in_cinema": {"title": "Is played in Cinema", "conjunction": True},
        "category": {"title": "Category", "conjunction": True},
    },
}


def search_oracle(config=None):
    import copy

    return build_items(fx.ITEMS, copy.deepcopy(config or SEARCH_CONFIG))


class TestSearch:
    def test_no_params(self):
        r = search_oracle().search({})
        assert len(r["data"]["items"]) == 4
        assert r["data"]["items"][0]["category"] == "drama"
        assert r["data"]["items"][0]["year"] == 1995
        assert r["data"]["items"][0]["in_cinema"] is False
        aggs = r["data"]["aggregations"]
        assert aggs["in_cinema"]["buckets"][0]["doc_count"] == 3
        assert aggs["in_cinema"]["buckets"][1]["doc_count"] == 1
        assert len(aggs["in_cinema"]["buckets"]) == 2

    def test_two_filters(self):
        r = search_oracle().search(
            {"filters": {"tags": ["a"], "category": ["drama"]}}
        )
        assert len(r["data"]["items"]) == 2
        assert r["data"]["aggregations"]["tags"]["buckets"][0]["doc_count"] == 2

    def test_filters_query(self):
        r = search_oracle().search({"filters_query": "tags:c"})
        assert len(r["data"]["items"]) == 3
        assert r["data"]["aggregations"]["tags"]["buckets"][0]["doc_count"] == 3

    def test_filters_query_and_filters(self):
        r = search_oracle().search(
            {"filters_query": "tags:c", "filters": {"tags": ["z"]}}
        )
        assert len(r["data"]["items"]) == 1
        assert r["data"]["aggregations"]["tags"]["buckets"][0]["doc_count"] == 1

    def test_filters_query_not_existing_value(self):
        r = search_oracle().search({"filters_query": "tags:not_existing"})
        assert len(r["data"]["items"]) == 0
        assert r["data"]["aggregations"]["tags"]["buckets"][0]["doc_count"] == 0

    def test_filter_and_query(self):
        r = search_oracle().search({"filters": {"tags": ["a"]}, "query": "comedy"})
        assert len(r["data"]["items"]) == 2
        aggs = r["data"]["aggregations"]
        assert aggs["tags"]["buckets"][0]["doc_count"] == 2
        assert aggs["category"]["buckets"][0]["key"] == "comedy"
        assert aggs["category"]["buckets"][0]["doc_count"] == 2

    def test_empty_filters(self):
        r = search_oracle().search({"filters": {}})
        assert len(r["data"]["items"]) == 4

    def test_not_filters(self):
        r = search_oracle().search({"not_filters": {"tags": ["c"]}})
        assert len(r["data"]["items"]) == 1

    def test_many_not_filters(self):
        r = search_oracle().search({"not_filters": {"tags": ["c", "e"]}})
        assert len(r["data"]["items"]) == 0

    def test_missing_conj_value_after_existing(self):
        r = search_oracle().search({"filters": {"category": ["drama", "thriller"]}})
        assert len(r["data"]["items"]) == 0
        assert r["data"]["aggregations"]["tags"]["buckets"][0]["doc_count"] == 0

    def test_missing_disj_value_with_existing(self):
        config = fx.fresh(SEARCH_CONFIG)
        config["aggregations"]["category"]["conjunction"] = False
        r = search_oracle(config).search(
            {"filters": {"category": ["drama", "thriller"]}}
        )
        assert len(r["data"]["items"]) == 2
        assert r["data"]["aggregations"]["tags"]["buckets"][0]["doc_count"] == 2

    def test_single_missing_disj_value(self):
        config = fx.fresh(SEARCH_CONFIG)
        config["aggregations"]["category"]["conjunction"] = False
        r = search_oracle(config).search({"filters": {"category": ["thriller"]}})
        assert len(r["data"]["items"]) == 0
        assert r["data"]["aggregations"]["tags"]["buckets"][0]["doc_count"] == 0

    def test_native_search_disabled_error(self):
        oracle = build_items(fx.ITEMS, {"native_search_enabled": False, "aggregations": {}})
        with pytest.raises(ValueError) as e:
            oracle.search({"query": "xxx"})
        assert (
            str(e.value)
            == '"query" and "filter" options are not working once native search is disabled'
        )

    def test_no_configuration(self):
        oracle = build_items(fx.ITEMS, {"aggregations": {}})
        assert len(oracle.search({})["data"]["items"]) == 4

    def test_callback_filter(self):
        oracle = build_items(fx.ITEMS, {"aggregations": {}})
        r = oracle.search({"filter": lambda item: False})
        assert len(r["data"]["items"]) == 0
        assert len(oracle.search({})["data"]["items"]) == 4

    def test_ids_variants(self):
        movies = fx.movies()
        config = {"aggregations": {"tags": {}, "year": {}}}
        oracle = build_items(movies, fx.fresh(config))
        r = oracle.search({"_ids": [1]})
        assert len(r["data"]["items"]) == 1

        temp = fx.movies()
        for i, m in enumerate(temp):
            m["id"] = (i + 1) * 10
        oracle = build_items(temp, fx.fresh(config))
        r = oracle.search({"ids": [10]})
        assert r["data"]["items"][0]["id"] == 10
        assert r["data"]["items"][0]["_id"] == 1
        assert len(r["data"]["items"]) == 1
        r = oracle.search({"ids": [50, 20]})
        assert r["data"]["items"][0]["id"] == 50
        assert r["data"]["items"][0]["_id"] == 5
        assert len(r["data"]["items"]) == 2

    def test_custom_id_field(self):
        temp = fx.movies()
        for i, m in enumerate(temp):
            m["uuid"] = (i + 1) * 10
            m.pop("id", None)
        config = {
            "aggregations": {"tags": {}, "year": {}},
            "custom_id_field": "uuid",
        }
        oracle = build_items(temp, config)
        r = oracle.search({"ids": [10]})
        assert r["data"]["items"][0]["uuid"] == 10
        assert r["data"]["items"][0]["_id"] == 1
        r = oracle.search({"ids": [50, 20]})
        assert r["data"]["items"][0]["uuid"] == 50
        assert r["data"]["items"][0]["_id"] == 5
        assert len(r["data"]["items"]) == 2


# ---------------------------------------------------------------------------
# browserify.spec.ts
# ---------------------------------------------------------------------------
class TestGeneral:
    def test_search(self):
        oracle = build_items(fx.BROWSERIFY_ITEMS)
        assert len(oracle.search()["data"]["items"]) == 3

    def test_pagination(self):
        oracle = build_items(fx.BROWSERIFY_ITEMS)
        assert len(oracle.search({"per_page": 1})["data"]["items"]) == 1
        assert len(oracle.search({"per_page": 1, "page": 4})["data"]["items"]) == 0
        assert len(oracle.search({"per_page": 1, "page": 3})["data"]["items"]) == 1

    def test_all_filtered_items(self):
        oracle = build_items(fx.BROWSERIFY_ITEMS)
        r = oracle.search({"per_page": 1, "is_all_filtered_items": True})
        assert len(r["data"]["items"]) == 1
        assert len(r["data"]["allFilteredItems"]) == 3
        r = oracle.search({"per_page": 1, "is_all_filtered_items": False})
        assert r["data"]["allFilteredItems"] is None
        r = oracle.search({"per_page": 1})
        assert r["data"]["allFilteredItems"] is None

    def test_pagination_and_filter(self):
        oracle = build_items(fx.BROWSERIFY_ITEMS)
        r = oracle.search(
            {"per_page": 1, "page": 3, "filter": lambda it: "a" in it["tags"]}
        )
        assert len(r["data"]["items"]) == 1

    def test_aggregation_filters(self):
        oracle = build_items(
            fx.BROWSERIFY_ITEMS, {"aggregations": {"tags": {}, "actors": {}}}
        )
        r = oracle.search({"filters": {"tags": ["e", "f"]}})
        assert len(r["data"]["items"]) == 1
        r = oracle.search({"filters": {"tags": ["e", "f"], "actors": ["a", "b"]}})
        assert len(r["data"]["items"]) == 1

    def test_string_facet_values(self):
        oracle = build_items(fx.SIMILAR_TAG_ITEMS, {"aggregations": {"tags": {}}})
        r = oracle.search()
        assert len(r["data"]["items"]) == 3
        assert r["data"]["aggregations"]["tags"]["buckets"][0]["doc_count"] == 2
        assert r["data"]["aggregations"]["tags"]["buckets"][1]["doc_count"] == 1

    def test_aggregations_with_config(self):
        oracle = build_items(
            fx.BROWSERIFY_ITEMS,
            {"aggregations": {"tags": {"size": 10, "title": "Tags"}}},
        )
        r = oracle.search({})
        assert len(r["data"]["items"]) == 3
        assert len(r["data"]["aggregations"]["tags"]["buckets"]) == 6

    def test_string_scalar_facets(self):
        items = [
            {"name": "movie1", "tags": "a"},
            {"name": "movie2", "tags": "a"},
            {"name": "movie3", "tags": "a"},
        ]
        oracle = build_items(items, {"aggregations": {"tags": {"size": 10, "title": "Tags"}}})
        r = oracle.search({})
        assert len(r["data"]["items"]) == 3
        assert len(r["data"]["aggregations"]["tags"]["buckets"]) == 1
        assert r["data"]["aggregations"]["tags"]["buckets"][0]["doc_count"] == 3

    def test_facet_stats(self):
        oracle = build_items(
            fx.PRICE_ITEMS,
            {"aggregations": {"price": {"title": "Price", "size": 3, "show_facet_stats": True}}},
        )
        r = oracle.search({"query": "Apple"})
        stats = r["data"]["aggregations"]["price"]["facet_stats"]
        assert stats["min"] == 1
        assert stats["max"] == 7
        assert stats["avg"] == 3
        assert stats["sum"] == 9

    def test_facet_stats_string_error(self):
        items = [
            {"name": "movie1", "tags": "€ 1 euro"},
            {"name": "movie2", "tags": "€ 1 euro"},
            {"name": "movie3", "tags": "€ 1 euro"},
        ]
        oracle = build_items(
            items,
            {"aggregations": {"tags": {"title": "Tags", "size": 1, "show_facet_stats": True}}},
        )
        with pytest.raises(ValueError) as e:
            oracle.search({"query": ""})
        assert str(e.value) == "You cant use chars to calculate the facet_stats."

    def test_search_by_tags(self):
        items = [
            {"name": "movie1", "tags": ["drama"]},
            {"name": "movie2", "tags": ["drama", "crime"]},
            {"name": "movie3"},
        ]
        oracle = build_items(items, {"searchableFields": ["name", "tags"], "aggregations": {}})
        assert len(oracle.search({"query": "drama"})["data"]["items"]) == 2
        assert len(oracle.search({"query": "crime"})["data"]["items"]) == 1


# ---------------------------------------------------------------------------
# facetSorting.spec.ts
# ---------------------------------------------------------------------------
class TestFacetSorting:
    def agg(self, genres_cfg, input=None):
        oracle = build_items(fx.GENRES_ITEMS, {"aggregations": {"genres": genres_cfg}})
        payload = {"name": "genres"}
        payload.update(input or {})
        return oracle.aggregation(payload)

    def keys(self, result):
        return [b["key"] for b in result["data"]["buckets"]]

    def test_sort_by_key(self):
        assert self.keys(self.agg({"sort": ["key"]})) == [
            "Comedy", "Drama", "Horror", "Romance", "Western",
        ]

    def test_sort_by_key_string_desc(self):
        assert self.keys(self.agg({"sort": "key", "order": "desc"})) == [
            "Western", "Romance", "Horror", "Drama", "Comedy",
        ]

    def test_sort_by_key_desc(self):
        assert self.keys(self.agg({"sort": ["key"], "order": ["desc"]})) == [
            "Western", "Romance", "Horror", "Drama", "Comedy",
        ]

    def test_sort_by_doc_count(self):
        assert self.keys(self.agg({"sort": ["doc_count"], "order": ["desc"]})) == [
            "Western", "Comedy", "Drama", "Horror", "Romance",
        ]

    def test_sort_by_count(self):
        assert self.keys(self.agg({"sort": "count", "order": "desc"})) == [
            "Western", "Comedy", "Drama", "Horror", "Romance",
        ]

    def test_sort_by_doc_count_key_desc(self):
        assert self.keys(
            self.agg({"sort": ["doc_count", "key"], "order": ["desc", "desc"]})
        ) == ["Western", "Romance", "Horror", "Drama", "Comedy"]

    def test_selected_key_equals_term(self):
        a = self.agg({"sort": ["selected", "key"], "order": ["desc", "asc"]})
        b = self.agg({"sort": "term"})
        assert a["data"]["buckets"] == b["data"]["buckets"]

    def test_selected_on_top(self):
        r = self.agg({"sort": "term"}, {"filters": {"genres": ["Drama", "Romance"]}})
        assert self.keys(r) == ["Drama", "Romance", "Comedy", "Horror", "Western"]

    def test_chosen_filters_on_top_false(self):
        r = self.agg(
            {"sort": "key", "chosen_filters_on_top": False},
            {"filters": {"genres": ["Drama", "Romance"]}},
        )
        assert self.keys(r) == ["Comedy", "Drama", "Horror", "Romance", "Western"]

    def test_hide_zero_doc_count(self):
        r = self.agg(
            {"hide_zero_doc_count": True}, {"filters": {"genres": ["Western"]}}
        )
        assert self.keys(r) == ["Western"]


# ---------------------------------------------------------------------------
# sorting.spec.ts
# ---------------------------------------------------------------------------
class TestSorting:
    def test_sorted_items(self):
        sortings = {
            "name_asc": {"field": "name", "order": "asc"},
            "name_desc": {"field": "name", "order": "desc"},
            "date_asc": {"field": ["date", "name"], "order": ["asc", "asc"]},
        }
        items = fx.fresh(fx.SORTING_ITEMS)
        r = sorted_items(items, "name_asc", sortings)
        assert [x["name"] for x in r] == ["movie1", "movie2", "movie3", "movie7"]
        r = sorted_items(items, "name_desc", sortings)
        assert [x["name"] for x in r] == ["movie7", "movie3", "movie2", "movie1"]
        r = sorted_items(items, "date_asc", sortings)
        assert [x["name"] for x in r] == ["movie2", "movie7", "movie3", "movie1"]
        r = sorted_items(items, {"field": ["date", "name"], "order": ["desc", "desc"]})
        assert [x["name"] for x in r] == ["movie1", "movie3", "movie7", "movie2"]


# ---------------------------------------------------------------------------
# facet.spec.ts
# ---------------------------------------------------------------------------
class TestAggregationEndpoint:
    CONFIG = {
        "aggregations": {
            "actors": {"conjunction": True},
            "genres": {"conjunction": True},
            "year": {"conjunction": True},
            "director": {"conjunction": True},
        }
    }

    def test_error_unknown_name(self):
        oracle = build_items(fx.movies(), fx.fresh(self.CONFIG))
        with pytest.raises(ValueError) as e:
            oracle.aggregation({"name": "category2"})
        assert str(e.value) == 'Please define aggregation "category2" in config'

    def test_single_facet(self):
        oracle = build_items(fx.movies(), fx.fresh(self.CONFIG))
        assert len(oracle.aggregation({"name": "genres"})["data"]["buckets"]) == 10

    def test_facet_pagination(self):
        oracle = build_items(fx.movies(), fx.fresh(self.CONFIG))
        r = oracle.aggregation({"name": "genres", "page": 1, "per_page": 1})
        assert len(r["data"]["buckets"]) == 1

    def test_facet_pagination_12(self):
        oracle = build_items(fx.movies(), fx.fresh(self.CONFIG))
        r = oracle.aggregation({"name": "genres", "page": 1, "per_page": 12})
        assert len(r["data"]["buckets"]) == 12
