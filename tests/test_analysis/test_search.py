"""BM25 retrieval + bigram-LM perplexity (stages/search.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from hydra_ray.stages.search import bm25_search, lm_perplexity


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    )


def _bm25_ref(docs, query, k1=1.2, b=0.75):
    """Independent plain-Python BM25 for cross-checking."""
    terms = sorted(set(query.split()))
    toks = {d: t.split(" ") for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {q: sum(1 for v in toks.values() if q in v) for q in terms}
    scores = {}
    for d, v in toks.items():
        s = 0.0
        for q in terms:
            tf = v.count(q)
            if tf == 0:
                continue
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            part = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(v) / avgdl))
            s += math.floor(part * 1e6 + 0.5) / 1e6
        if s > 0:
            scores[d] = round(s, 6)
    return scores


def test_bm25_matches_reference_scoring():
    docs = [
        (1, "fast join merge fast fast"),
        (2, "slow scan table window"),
        (3, "merge join merge join merge"),
        (4, "the a of"),
    ]
    out = bm25_search(_docs(docs), "fast merge", top_n=10).take_all()
    ref = _bm25_ref(docs, "fast merge")
    got = {r["doc_id"]: round(r["score"], 6) for r in out}
    assert got == ref
    # ordering: descending score, doc_id tiebreak
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_top_n_and_no_hits():
    docs = [(i, f"tok{i} filler") for i in range(10)]
    out = bm25_search(_docs(docs), "tok3", top_n=5).take_all()
    assert [r["doc_id"] for r in out] == [3]
    out2 = bm25_search(_docs(docs), "absent", top_n=5).take_all()
    assert out2 == []
    with pytest.raises(ValueError):
        bm25_search(_docs(docs), "")


def test_lm_perplexity_hand_computed():
    # corpus: two docs sharing a bigram, one single-token doc
    docs = [(1, "a b a b"), (2, "a b c"), (3, "z")]
    out = {r["doc_id"]: r for r in lm_perplexity(_docs(docs)).take_all()}
    # bigram counts: (a,b)=3, (b,a)=1, (b,c)=1 ; uni: a=3, b=2
    # vocab = {a,b,c,z} -> V=4, k=0.5
    def nll(cb, cu):
        return math.floor(-math.log((cb + 0.5) / (cu + 0.5 * 4)) * 1e6 + 0.5) / 1e6

    d1 = nll(3, 3) + nll(1, 2) + nll(3, 3)
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["nll"] - round(d1, 6)) < 1e-9
    assert abs(out[1]["avg_nll"] - math.floor(d1 / 3 * 1e6 + 0.5) / 1e6) < 1e-9
    # single-token doc: zero bigrams, zero nll
    assert out[3]["n_bigrams"] == 0 and out[3]["nll"] == 0.0 and out[3]["avg_nll"] == 0.0


def test_lm_perplexity_rare_docs_score_higher():
    common = [(i, "the cat sat on the mat") for i in range(20)]
    rare = [(99, "zyx qwv jkl pqr mno abc")]
    out = {r["doc_id"]: r["avg_nll"] for r in lm_perplexity(_docs(common + rare)).take_all()}
    assert out[99] > out[0]  # garbled doc is less likely under the corpus LM


def test_lm_perplexity_partition_invariant():
    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c", "d", "e"]
    docs = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(1, 12)))) for i in range(60)
    ]
    one = {r["doc_id"]: r["nll"] for r in lm_perplexity(_docs(docs)).take_all()}
    many = {
        r["doc_id"]: r["nll"]
        for r in lm_perplexity(_docs(docs).repartition(7)).take_all()
    }
    assert one == many
