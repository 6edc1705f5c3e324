"""lunr 1.0.0 scoring model (the reference's ranking function).

itemsjs delegates ranking to lunr 1.0.0 (/root/reference/src/fulltext.ts:73-91
-> lunr ``Index.search``). Reconstructed semantics implemented here as pure
functions parameterized over index accessors, so the same math drives both
the in-memory oracle and the distributed Spark scorer:

* doc tf(token) = sum over registered fields of
  (count(token in field)/len(field_tokens)) * boost   [Index.add]
  Fields form a LIST (duplicates allowed and double-counted): itemsjs
  registers 'name' boost 10 plus every ``searchableFields`` entry boost 1
  (fulltext.ts:24-28), so ``searchableFields: ['name', ...]`` counts 'name'
  twice.
* idf(term) = df > 0 ? 1 + ln(N/df) : 1                [Index.idf]
* query: per token, qtf = (1/n_tokens) * n_fields * sum(boosts); expand the
  token to every corpus term with that prefix (lexicographic order, exact
  token first); similarityBoost = 1 if exact else 1/ln(max(3, len(key)-len(token)));
  insert qtf*idf*similarityBoost at the term's corpus position. Duplicate
  positions (two query tokens expanding to the same term) keep the FIRST
  value for the dot product but ALL values contribute to |q|
  (lunr.Vector linked-list insert/dot semantics).
* candidates = intersection over query tokens of (union of postings of the
  token's expansions); conjunctive multi-token AND is pinned by
  /root/reference/tests/fulltext.spec.ts:49,63.
* score(doc) = dot(q, d)/|q| with d[term] = tf*idf; ties broken by
  ascending *lexicographic string* docref ('10' < '2'), because lunr stores
  refs as JS object keys.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Sequence, Set, Tuple


def doc_tf(field_token_lists: Sequence[Tuple[List[str], float]]) -> Dict[str, float]:
    """Per-token tf for one document given [(tokens, boost)] in field
    registration order."""
    out: Dict[str, float] = {}
    all_tokens: Set[str] = set()
    # Counter instead of per-token list.count: O(len + distinct) per field
    # rather than O(distinct × len). Skipping c == 0 fields is bit-exact
    # (the old code added literal +0.0, an IEEE identity for the
    # non-negative partial sums here).
    counted = []
    for tokens, boost in field_token_lists:
        all_tokens.update(tokens)
        counted.append((Counter(tokens), len(tokens), boost))
    for token in sorted(all_tokens):  # SortedSet iteration order
        v = 0.0
        for cnt, n, boost in counted:
            c = cnt.get(token)
            if c:
                v += c / n * boost
        out[token] = v
    return out


def idf(n_docs: int, df: int) -> float:
    if df > 0:
        return 1.0 + math.log(n_docs / df)
    return 1.0


@dataclass
class QueryVector:
    """Driver-side query-vector state; small (|expanded terms| entries)."""

    n_tokens: int
    # term -> effective dot-product weight (first insertion wins)
    weights: Dict[str, float] = field(default_factory=dict)
    # term -> set of query-token indexes whose expansion produced it
    term_tokens: Dict[str, Set[int]] = field(default_factory=dict)
    magnitude: float = 0.0
    has_some_token: bool = False
    all_tokens_expandable: bool = False


def similarity_boost(key: str, token: str) -> float:
    if key == token:
        return 1.0
    return 1.0 / math.log(max(3, len(key) - len(token)))


def build_query_vector(
    query_tokens: Sequence[str],
    n_fields: int,
    boosts_sum: float,
    expand: Callable[[str], List[str]],
    idf_of: Callable[[str], float],
) -> QueryVector:
    """``expand(token)`` must return corpus terms having ``token`` as prefix,
    in ascending lexicographic order (lunr trie DFS order)."""
    qv = QueryVector(n_tokens=len(query_tokens))
    if not query_tokens:
        return qv
    sum_sq = 0.0
    qtf = (1.0 / len(query_tokens)) * n_fields * boosts_sum
    nonempty = 0
    for i, tok in enumerate(query_tokens):
        keys = expand(tok)
        if keys:
            nonempty += 1
        for key in keys:
            val = qtf * idf_of(key) * similarity_boost(key, tok)
            sum_sq += val * val
            if key not in qv.weights:
                qv.weights[key] = val
            qv.term_tokens.setdefault(key, set()).add(i)
    qv.magnitude = math.sqrt(sum_sq)
    qv.has_some_token = nonempty > 0
    qv.all_tokens_expandable = nonempty == len(query_tokens)
    return qv


def score_doc(
    qv: QueryVector,
    doc_terms_tf: Dict[str, float],
    idf_of: Callable[[str], float],
) -> float:
    """dot(q, d)/|q| summed in ascending term order (corpus-position order),
    matching lunr's linked-list dot walk for float-order equality."""
    dot = 0.0
    for term in sorted(qv.weights.keys()):
        tf = doc_terms_tf.get(term)
        if tf is not None:
            dot += qv.weights[term] * tf * idf_of(term)
    if qv.magnitude == 0.0:
        return 0.0
    return dot / qv.magnitude
