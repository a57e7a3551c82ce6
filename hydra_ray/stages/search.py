"""Corpus-statistics text scoring: BM25 retrieval and n-gram LM
perplexity filtering.

Both operators follow the same two-phase shape that scales to 100 TB:

1. a streaming statistics pass over the corpus that reduces to a SMALL
   model (per-term document frequencies / bigram counts pre-aggregated
   inside ``map_batches`` before any shuffle), and
2. a streaming scoring pass that broadcasts the model once
   (``ray.put``) and scores each batch with vectorized Arrow/numpy
   kernels — no per-row Python, no driver materialization of the
   corpus.

Floating-point determinism contract: every per-row score is rounded to
integer micro-units (``floor(x * 1e6 + 0.5)``, positive values only)
BEFORE summation, so the aggregate is an order-invariant int64 sum and
the DuckDB oracle is bit-exact regardless of execution order.

Reference anchors: hydra has no retrieval layer — this extends the
engine with the corpus-quality operators a training-data pipeline
needs (CCNet-style LM filtering; BM25 as the lexical-search baseline
next to stages/similarity.py's dense kNN).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from hydra_ray.stages.agg import grouped_agg


def _micro(x: np.ndarray) -> np.ndarray:
    """Positive float64 → int64 micro-units, half-up (matches DuckDB
    ``CAST(floor(x * 1e6 + 0.5) AS BIGINT)`` bit-for-bit)."""
    return np.floor(x * 1e6 + 0.5).astype(np.int64)


def _split_tokens(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Split on single spaces — the exact semantics of DuckDB
    ``string_split(text, ' ')`` so token counts agree with the oracle."""
    arr = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    return pc.split_pattern(arr, pattern=" ")


def _doc_lengths(tokens: pa.Array) -> np.ndarray:
    return pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def bm25_search(
    ds: "rd.Dataset",
    query: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> "rd.Dataset":
    """Okapi BM25 over a document Dataset for one query string.

    Phase A (stats): one streaming pass emits per-batch partials —
    (n_docs, sum_dl) plus per-(doc, term) tf rows restricted to the
    query's terms (the "inverted index slice" for this query; at scale
    this is exactly what a posting-list lookup returns).  DF per term
    and the corpus aggregates reduce from those partials.

    Phase B (score): idf/avgdl are tiny and broadcast; each hit row is
    scored vectorized and summed per doc as int64 micro-units; global
    top-n by (score desc, doc_id) via single-partition selection of the
    small per-doc table.

    Scale notes: the hits table has one row per (doc, query-term) —
    proportional to matching docs only.  Nothing corpus-sized reaches
    the driver; corpus stats are a 2-number reduce.
    """
    terms = sorted(set(query.split()))
    if not terms:
        raise ValueError("empty query")
    terms_arr = pa.array(terms, type=pa.string())

    def hits_batch(t: pa.Table) -> pa.Table:
        toks = _split_tokens(t[text_col])
        dl = _doc_lengths(toks)
        flat = toks.flatten()
        # doc index of every flattened token
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), dl)
        ti = (
            pc.fill_null(pc.index_in(flat, value_set=terms_arr), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        mask = ti >= 0
        if not mask.any():
            return pa.table(
                {
                    id_col: pa.array([], type=t[id_col].type),
                    "term": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "dl": pa.array([], type=pa.int64()),
                }
            )
        di, ti = doc_idx[mask], ti[mask]
        # tf per (doc, term): bincount over a composite key
        key = di * len(terms) + ti
        counts = np.bincount(key, minlength=len(t) * len(terms)).reshape(len(t), len(terms))
        d_nz, t_nz = np.nonzero(counts)
        ids = t[id_col].combine_chunks()
        return pa.table(
            {
                id_col: pc.take(ids, pa.array(d_nz)),
                "term": pc.take(terms_arr, pa.array(t_nz)),
                "tf": pa.array(counts[d_nz, t_nz], type=pa.int64()),
                "dl": pa.array(dl[d_nz], type=pa.int64()),
            }
        )

    def stats_batch(t: pa.Table) -> pa.Table:
        toks = _split_tokens(t[text_col])
        dl = _doc_lengths(toks)
        return pa.table(
            {
                "n_docs": pa.array([len(t)], type=pa.int64()),
                "sum_dl": pa.array([int(dl.sum())], type=pa.int64()),
            }
        )

    # Phase A — corpus stats (2-number reduce; stays streaming).
    stats = (
        ds.map_batches(stats_batch, batch_format="pyarrow")
        .sum(["n_docs", "sum_dl"])
    )
    n_docs = int(stats["sum(n_docs)"])
    avgdl = float(stats["sum(sum_dl)"]) / float(n_docs)

    hits = ds.map_batches(hits_batch, batch_format="pyarrow").materialize()

    # DF per term: tiny (≤ |query| rows) — reduce distributed, pull.
    df_tbl = grouped_agg(hits, keys=["term"], aggs=[(id_col, "count", "df")]).take_all()
    df_map = {r["term"]: int(r["df"]) for r in df_tbl}
    idf = {
        term: float(np.log((n_docs - df_map.get(term, 0) + 0.5) / (df_map.get(term, 0) + 0.5) + 1.0))
        for term in terms
    }
    model_ref = ray.put((idf, avgdl))

    def score_batch(t: pa.Table) -> pa.Table:
        idf_m, avg = ray.get(model_ref)
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=t[id_col].type),
                    "micro": pa.array([], type=pa.int64()),
                }
            )
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        terms_np = t["term"].to_pylist()
        idf_v = np.array([idf_m[x] for x in terms_np], dtype=np.float64)
        score = idf_v * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avg))
        return pa.table({id_col: t[id_col], "micro": pa.array(_micro(score), type=pa.int64())})

    per_doc = grouped_agg(
        hits.map_batches(score_batch, batch_format="pyarrow"),
        keys=[id_col],
        aggs=[("micro", "sum", "micro"), ("micro", "count", "n_hit")],
    )

    def topk(t: pa.Table) -> pa.Table:
        micro = t["micro"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -micro))[:top_n]
        t = t.take(pa.array(np.sort(order)))
        micro2 = t["micro"].to_numpy(zero_copy_only=False)
        ids2 = t[id_col].to_numpy(zero_copy_only=False)
        fin = np.lexsort((ids2, -micro2))
        t = t.take(pa.array(fin))
        return pa.table(
            {
                id_col: t[id_col],
                "n_hit": pc.cast(t["n_hit"], pa.int64()),
                "score": pa.array(
                    t["micro"].to_numpy(zero_copy_only=False).astype(np.float64) / 1e6
                ),
            }
        )

    # per_doc ≤ one row per matching doc; top-n selection in one partition
    return per_doc.repartition(1).map_batches(topk, batch_format="pyarrow")


def bm25_oracle_sql(
    query: str, *, k1: float = 1.2, b: float = 0.75, top_n: int = 20, table: str = "documents"
) -> str:
    """DuckDB oracle mirroring bm25_search bit-for-bit (micro-unit sum)."""
    terms = sorted(set(query.split()))
    terms_sql = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM {table}),
    dl AS (SELECT doc_id, len(ts) AS dl FROM toks),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
    hits AS (
        SELECT doc_id, tok AS term, count(*) AS tf
        FROM (SELECT doc_id, unnest(ts) AS tok FROM toks)
        WHERE tok IN ({terms_sql})
        GROUP BY doc_id, tok
    ),
    df AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
    scored AS (
        SELECT h.doc_id,
               CAST(floor(
                   ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (h.tf * ({k1!r} + 1.0))
                   / (h.tf + {k1!r} * (1.0 - {b!r} + {b!r} * dl.dl / stats.avgdl))
                   * 1e6 + 0.5) AS BIGINT) AS micro
        FROM hits h
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
    )
    SELECT doc_id, count(*) AS n_hit, CAST(sum(micro) AS DOUBLE) / 1e6 AS score
    FROM scored
    GROUP BY doc_id
    ORDER BY sum(micro) DESC, doc_id
    LIMIT {top_n}
    """


# ---------------------------------------------------------------------------
# Bigram language-model perplexity (CCNet-style quality filter)
# ---------------------------------------------------------------------------


def lm_perplexity(
    ds: "rd.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
) -> "rd.Dataset":
    """Score each document by average negative log-likelihood under an
    add-k-smoothed bigram LM trained on the corpus itself (the CCNet /
    Wikipedia-LM quality-filter shape: low nll ≈ fluent/common, high
    nll ≈ rare/garbled).

    Training pass: bigram and unigram counts pre-aggregated per batch
    (``value_counts`` inside ``map_batches``) then reduced with
    ``grouped_agg`` — the model size is O(vocab²) of the corpus, NOT
    O(corpus).  Scoring pass: model broadcast once via ``ray.put``;
    per-bigram nll computed vectorized and summed as int64 micro-units.

    nll(doc) = sum over adjacent token pairs (w1,w2) of
        -ln((c(w1,w2) + k) / (c(w1·) + k·V))
    with V = distinct unigram count; docs with < 2 tokens score 0 with
    n_bigrams = 0.  Output: (doc_id, n_bigrams, nll — micro-rounded
    per-bigram then summed, avg_nll = nll/n_bigrams rounded to 6dp).

    At 100-TB scale the corpus model would be hash-partitioned and the
    scoring pass a co-partitioned join on w1; below that (vocab² small
    — true for natural-language token vocabs after min-count pruning)
    the broadcast path shipped here is the right plan.
    """

    def pair_counts_batch(t: pa.Table) -> pa.Table:
        toks = _split_tokens(t[text_col])
        dl = _doc_lengths(toks)
        flat = np.asarray(toks.flatten().to_pylist(), dtype=object)
        if len(flat) == 0:
            return pa.table(
                {
                    "w1": pa.array([], type=pa.string()),
                    "w2": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        # adjacent pairs within each doc: drop the last token of each doc
        ends = np.cumsum(dl)
        keep = np.ones(len(flat), dtype=bool)
        keep[ends[dl > 0] - 1] = False
        idx1 = np.nonzero(keep)[0]
        w1 = flat[idx1]
        w2 = flat[idx1 + 1]
        import pandas as pd

        g = pd.DataFrame({"w1": w1, "w2": w2}).groupby(["w1", "w2"], sort=False).size()
        gi = g.reset_index(name="n")
        return pa.table(
            {
                "w1": pa.array(gi["w1"], type=pa.string()),
                "w2": pa.array(gi["w2"], type=pa.string()),
                "n": pa.array(gi["n"].to_numpy(), type=pa.int64()),
            }
        )

    bigrams = grouped_agg(
        ds.map_batches(pair_counts_batch, batch_format="pyarrow"),
        keys=["w1", "w2"],
        aggs=[("n", "sum", "n")],
    ).take_all()
    big_map: dict[tuple[str, str], int] = {(r["w1"], r["w2"]): int(r["n"]) for r in bigrams}
    uni_map: dict[str, int] = {}
    for (w1, _), n in big_map.items():
        uni_map[w1] = uni_map.get(w1, 0) + n
    # V = distinct tokens anywhere (w1 or w2 position, plus last tokens
    # are covered as w2 of their predecessor; single-token docs add their
    # token via neither — count them too for exactness)
    vocab = set()
    for (w1, w2) in big_map:
        vocab.add(w1)
        vocab.add(w2)

    def singles_batch(t: pa.Table) -> pa.Table:
        toks = _split_tokens(t[text_col])
        dl = _doc_lengths(toks)
        mask = dl == 1
        if not mask.any():
            return pa.table({"w": pa.array([], type=pa.string())})
        firsts = pc.list_flatten(pc.list_slice(toks, 0, 1))
        return pa.table({"w": pc.take(firsts, pa.array(np.nonzero(mask)[0]))})

    singles = ds.map_batches(singles_batch, batch_format="pyarrow").take_all()
    for r in singles:
        vocab.add(r["w"])
    V = len(vocab)
    model_ref = ray.put((big_map, uni_map, V))

    def score_batch(t: pa.Table) -> pa.Table:
        big, uni, vv = ray.get(model_ref)
        toks = _split_tokens(t[text_col])
        dl = _doc_lengths(toks)
        flat = np.asarray(toks.flatten().to_pylist(), dtype=object)
        ends = np.cumsum(dl)
        keep = np.ones(len(flat), dtype=bool)
        if len(flat):
            keep[ends[dl > 0] - 1] = False
        idx1 = np.nonzero(keep)[0]
        doc_of = np.repeat(np.arange(len(t), dtype=np.int64), dl)
        di = doc_of[idx1]
        c_big = np.array([big.get((flat[i], flat[i + 1]), 0) for i in idx1], dtype=np.float64)
        c_uni = np.array([uni.get(flat[i], 0) for i in idx1], dtype=np.float64)
        nll = -np.log((c_big + add_k) / (c_uni + add_k * vv))
        micro = _micro(nll)
        sums = np.bincount(di, weights=micro.astype(np.float64), minlength=len(t)).astype(np.int64)
        nbg = np.bincount(di, minlength=len(t)).astype(np.int64)
        total = sums.astype(np.float64) / 1e6
        # half-up at 6dp via the same floor(x*1e6+0.5) formula as the
        # oracle (np.round is banker's — would diverge on exact ties)
        avg = np.where(
            nbg > 0,
            np.floor(total / np.maximum(nbg, 1) * 1e6 + 0.5) / 1e6,
            0.0,
        )
        return pa.table(
            {
                id_col: t[id_col],
                "n_bigrams": pa.array(nbg, type=pa.int64()),
                "nll": pa.array(total),
                "avg_nll": pa.array(avg),
            }
        )

    return ds.map_batches(score_batch, batch_format="pyarrow")


def lm_perplexity_oracle_sql(*, add_k: float = 0.5, table: str = "documents") -> str:
    """DuckDB oracle for lm_perplexity (bit-exact micro-unit sums)."""
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM {table}),
    pairs AS (
        SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        FROM (SELECT doc_id, ts,
                     unnest(generate_series(1, greatest(len(ts) - 1, 0))) AS i
              FROM toks)
    ),
    big AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY w1, w2),
    uni AS (SELECT w1, sum(c) AS c FROM big GROUP BY w1),
    vocab AS (
        SELECT count(DISTINCT w) AS v FROM (
            SELECT w1 AS w FROM big
            UNION SELECT w2 FROM big
            UNION SELECT ts[1] FROM toks WHERE len(ts) = 1
        )
    ),
    scored AS (
        SELECT p.doc_id,
               CAST(floor(
                   -ln((big.c + {add_k!r}) / (uni.c + {add_k!r} * vocab.v)) * 1e6 + 0.5
               ) AS BIGINT) AS micro
        FROM pairs p
        JOIN big ON p.w1 = big.w1 AND p.w2 = big.w2
        JOIN uni ON p.w1 = uni.w1
        CROSS JOIN vocab
    ),
    per_doc AS (
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(sum(micro) AS DOUBLE) / 1e6 AS nll
        FROM scored GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(p.n_bigrams, 0) AS n_bigrams,
           coalesce(p.nll, 0.0) AS nll,
           CASE WHEN coalesce(p.n_bigrams, 0) > 0
                THEN floor(p.nll / p.n_bigrams * 1e6 + 0.5) / 1e6 ELSE 0.0 END AS avg_nll
    FROM toks t LEFT JOIN per_doc p USING (doc_id)
    """
