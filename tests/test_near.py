"""Unordered proximity ("near") queries vs the pure-Python oracle.

Lucene ``SpanNearQuery(inOrder=false)`` / Indri ``#uwN`` semantics:
all DISTINCT query terms occur within a window —
``(max - min) - (n-1) <= slop`` — in ANY order.  Same ``"a b"~N``
surface as phrase mode; candidates via the vectorized anchor kernel
(every occurrence anchors a window-min existence test, one
searchsorted per term over packed (doc, pos) keys); scoring stays BM25
over the distinct terms (the repo's phrase contract).
"""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_spark.config import BuildConfig
from search_engine_spark.corpus import generate_transcripts
from search_engine_spark.index.build import build_index
from search_engine_spark.index.multi import MultiIndex
from search_engine_spark.index.reader import CompressedIndex, parse_query
from search_engine_spark.oracle import (
    _near_match_docs,
    build_oracle_index,
    oracle_matches,
    oracle_topk,
)


@pytest.fixture(scope="module")
def xs_pdf():
    return generate_transcripts("xs")


@pytest.fixture(scope="module")
def xs_index(spark, xs_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("near") / "idx")
    build_index(spark, spark.createDataFrame(xs_pdf), out, BuildConfig(num_groups=2))
    return CompressedIndex(spark, out)


@pytest.fixture(scope="module")
def xs_oracle(xs_pdf):
    return build_oracle_index(xs_pdf)


def _rows(df) -> list[tuple]:
    return [(r.conv_id, r.turn_idx, round(r.score, 9)) for r in df.collect()]


_QUERIES = [
    '"term0001 term0002"',        # slop 0: adjacent in any order
    '"term0001 term0002"~3',
    '"term0002 term0001"~3',      # order-reversed: must equal the above
    '"public court school"~10',
    '"term0001"',                 # single term: plain presence
    '"zzz term0001"~5',           # absent term: no matches
]


def test_parse_near():
    spec = parse_query('"alpha beta"~4', "near")
    assert spec.mode == "near" and spec.slop == 4
    assert parse_query('""', "near") is None


@pytest.mark.parametrize("q", _QUERIES)
def test_topk_and_count_match_oracle(xs_index, xs_oracle, q):
    got = _rows(xs_index.topk(q, "near", 10))
    want = [
        (c, t, round(s, 9)) for (c, t), s in oracle_topk(xs_oracle, q, "near", 10)
    ]
    assert got == want, q
    assert xs_index.match_count(q, "near") == len(
        oracle_matches(xs_oracle, q, "near")
    ), q


def test_order_free(xs_index):
    a = set(map(tuple, xs_index.matches('"term0001 term0002"~4', "near").collect()))
    b = set(map(tuple, xs_index.matches('"term0002 term0001"~4', "near").collect()))
    assert a == b and a


def test_superset_of_ordered_phrase(xs_index):
    """Every ordered sloppy-phrase match satisfies the unordered window
    at the same slop."""
    q = '"term0001 term0002"~4'
    near = set(map(tuple, xs_index.matches(q, "near").collect()))
    phrase = set(map(tuple, xs_index.matches(q, "phrase").collect()))
    assert phrase <= near
    assert len(near) > len(phrase)  # reversed-order matches exist in xs


def test_slop_monotone(xs_index):
    prev: set = set()
    for slop in (0, 2, 8, 1000):
        cur = set(
            map(tuple, xs_index.matches(f'"term0001 term0002"~{slop}', "near").collect())
        )
        assert prev <= cur
        prev = cur
    conj = set(
        map(tuple, xs_index.matches("term0001 term0002", "conjunctive").collect())
    )
    assert prev == conj  # unbounded window == conjunctive containment


def test_kernel_vs_oracle_brute_force(xs_oracle):
    """Property check of the anchor rule itself on random position sets
    (no Spark): kernel == set-brute-force."""
    from search_engine_spark.index import kernels as K

    rng = np.random.default_rng(7)
    for trial in range(25):
        n_docs = 12
        terms = ["a", "b", "c"][: int(rng.integers(2, 4))]
        pls = {}
        raw = {t: {} for t in terms}
        for t in terms:
            doc_ids, tfs, pos_flat, offs = [], [], [], [0]
            for d in range(n_docs):
                if rng.random() < 0.7:
                    ps = sorted(
                        set(rng.integers(0, 30, size=int(rng.integers(1, 4))))
                    )
                    doc_ids.append(d)
                    tfs.append(len(ps))
                    pos_flat.extend(ps)
                    offs.append(len(pos_flat))
                    raw[t][d] = ps
            pls[t] = _FakeTP(
                np.array(doc_ids, dtype=np.int64),
                np.array(pos_flat, dtype=np.int64),
                np.array(offs, dtype=np.int64),
            )
        slop = int(rng.integers(0, 6))
        got = set(K.near_candidates(terms, pls, slop).tolist())
        w = slop + len(terms) - 1
        want = set()
        docs = set.intersection(*[set(raw[t]) for t in terms])
        for d in docs:
            anchors = sorted(set().union(*[set(raw[t][d]) for t in terms]))
            if any(
                all(any(a <= p <= a + w for p in raw[t][d]) for t in terms)
                for a in anchors
            ):
                want.add(d)
        assert got == want, (trial, terms, slop)


class _FakeTP:
    """Minimal TermPostings stand-in: doc_ids + flat positions."""

    def __init__(self, doc_ids, flat, offs):
        self.doc_ids = doc_ids
        self._flat = flat
        self._offs = offs

    def flat_positions(self):
        return self._flat, self._offs


def test_multi_index(spark, xs_pdf, xs_oracle, tmp_path):
    half = xs_pdf[xs_pdf["conv_id"] < "conv-000015"].reset_index(drop=True)
    rest = xs_pdf[xs_pdf["conv_id"] >= "conv-000015"].reset_index(drop=True)
    base, seg = str(tmp_path / "base"), str(tmp_path / "seg")
    build_index(spark, spark.createDataFrame(half), base, BuildConfig(num_groups=2))
    build_index(spark, spark.createDataFrame(rest), seg, BuildConfig(num_groups=2))
    multi = MultiIndex(spark, [base, seg])
    q = '"term0002 term0001"~3'
    got = _rows(multi.topk(q, "near", 10))
    want = [
        (c, t, round(s, 9)) for (c, t), s in oracle_topk(xs_oracle, q, "near", 10)
    ]
    assert got == want


def test_percolate_near(spark, xs_pdf, xs_index):
    """Saved near queries match streaming docs with the same window rule."""
    from search_engine_spark.operators.percolate import percolate, register

    saved = register([("n1", '"term0002 term0001"~3', "near")])
    docs = spark.createDataFrame(xs_pdf)
    hits = {
        (r.conv_id, r.turn_idx)
        for r in percolate(docs, saved).collect()
        if r.query_id == "n1"
    }
    want = set(map(tuple, xs_index.matches('"term0002 term0001"~3', "near").collect()))
    assert hits == want
