"""Reference test fixtures re-expressed as Python data (FIXTURES.md F2-F5).

items.json is reproduced verbatim (golden posting lists depend on the exact
4 rows: /root/reference/tests/facets.spec.ts:65-79); movies.json is loaded
from the reference tree read-only.
"""

import copy
import json
import os

ITEMS = [
    {"id": 1, "name": "movie1", "tags": ["a", "b", "c", "d"],
     "actors": ["john", "alex"], "year": 1995, "in_cinema": False,
     "category": "drama"},
    {"id": 2, "name": "movie2", "tags": ["a", "e", "f"],
     "actors": ["john", "brad"], "year": 1996, "in_cinema": False,
     "category": "comedy"},
    {"id": 3, "name": "movie3", "tags": ["a", "c"],
     "actors": ["jeff"], "year": 1994, "in_cinema": False,
     "category": "comedy"},
    {"id": 4, "name": "movie4", "tags": ["c", "a", "z"],
     "actors": ["jean"], "year": 1993, "in_cinema": True,
     "category": "drama"},
]

FACETS_ITEMS = [
    {"id": 1, "name": "movie1", "tags": ["a", "b", "c", "d"],
     "actors": ["john", "alex"], "category": "drama"},
    {"id": 2, "name": "movie2", "tags": ["a", "e", "f"],
     "actors": ["john", "brad"], "category": "comedy"},
    {"id": 3, "name": "movie3", "tags": ["a", "c"],
     "actors": ["jeff"], "category": "comedy"},
    {"id": 4, "name": "movie4", "tags": ["c", "a", "z"],
     "actors": ["jean"], "category": "drama"},
]

MATRIX_9 = [
    {"a": 1, "b": 2, "c": 3, "d": 3},
    {"a": 1, "b": 3, "c": 3, "d": 3},
    {"a": 2, "b": 3, "c": 3, "d": 3},
    {"a": 1, "b": 2, "c": 3, "d": 3},
    {"a": 2, "b": 3, "c": 3, "d": 3},
    {"a": 1, "b": 2, "c": 3, "d": 3},
    {"a": 1, "b": 3, "c": 3, "d": 3},
    {"a": 2, "b": 3, "c": 3, "d": 3},
    {"a": 2, "b": 2, "c": 3, "d": 3},
]

MATRIX_3 = [
    {"a": 1, "b": 1, "c": 3},
    {"a": 2, "b": 2, "c": 3},
    {"a": 3, "b": 3, "c": 3},
]

MATRIX_4 = [
    {"a": 1, "b": 3},
    {"a": 1, "b": 4},
    {"a": 2, "b": 3},
    {"a": 2, "b": 4},
]

FULLTEXT_ITEMS = [
    {"name": "Godfather", "tags": ["mafia", "crime"]},
    {"name": "Fight club", "tags": ["dark humor", "anti establishment"]},
    {"name": "Forrest Gump", "tags": ["running", "vietnam"]},
]

FULLTEXT_ITEMS_WITH_IDS = [
    {"id": 10, "name": "Godfather", "tags": ["mafia", "crime"]},
    {"id": 20, "name": "Fight club", "tags": ["dark humor", "anti establishment"]},
    {"id": 30, "name": "Forrest Gump", "tags": ["running", "vietnam"]},
]

SPECIAL_ITEMS = [
    {"name": "elation"},
    {"name": "source"},
    {"name": "headless"},
]

GENRES_ITEMS = [
    {"genres": "Western"},
    {"genres": "Western"},
    {"genres": "Comedy"},
    {"genres": "Drama"},
    {"genres": "Horror"},
    {"genres": "Romance"},
    {"genres": "Western"},
]

PRICE_ITEMS = [
    {"name": "Apple 7", "price": 1},
    {"name": "Apple 8", "price": 1},
    {"name": "Apple 9", "price": "7"},
    {"name": "Samsung", "price": 7},
    {"name": "Apple 10"},
]

BROWSERIFY_ITEMS = [
    {"name": "movie1", "tags": ["a", "b", "c", "d"], "actors": ["a", "b"]},
    {"name": "movie2", "tags": ["a", "e", "f"], "actors": ["a", "b"]},
    {"name": "movie3", "tags": ["a", "c"], "actors": ["e"]},
]

SIMILAR_TAG_ITEMS = [
    {"name": "movie1", "tags": "Another tag"},
    {"name": "movie2", "tags": "Another"},
    {"name": "movie3", "tags": "Another tag"},
]

SORTING_ITEMS = [
    {"name": "movie1", "date": "2018-12-03"},
    {"name": "movie7", "date": "2018-12-01"},
    {"name": "movie3", "date": "2018-12-02"},
    {"name": "movie2", "date": "2018-12-01"},
]

_MOVIES_PATH = "/root/reference/tests/fixtures/movies.json"


def items():
    return copy.deepcopy(ITEMS)


def movies():
    if os.path.exists(_MOVIES_PATH):
        with open(_MOVIES_PATH) as f:
            return json.load(f)
    raise FileNotFoundError(_MOVIES_PATH)


def fresh(data):
    return copy.deepcopy(data)
