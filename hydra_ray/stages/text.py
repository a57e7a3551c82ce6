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


def _tokens_arr(text: pa.Array) -> pa.Array:
    """list<string> of whitespace-split tokens (trimmed first)."""
    return pc.split_pattern_regex(pc.utf8_trim_whitespace(text), pattern=r"\s+")


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
    digit_ratio = np.round(n_digits / np.maximum(n_chars, 1.0), 6)
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


def fingerprint_batch(batch: pa.Table, doc_id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Rolling polynomial hash over tokens (document fingerprint):
    fp = sum(base^i * h(token_i)) mod 2^61-1, h = stable 64-bit token hash."""
    from hydra_ray.state.cuckoo import _mix64

    tokens = _tokens_arr(
        batch[text_col].combine_chunks() if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col]
    ).to_pylist()
    fps = []
    for toks in tokens:
        acc = 0
        for tok in toks or []:
            h = int(_mix64(np.frombuffer(tok.encode("utf-8").ljust(8, b"\0")[:8], dtype=np.uint64))[0])
            acc = (acc * _FP_BASE + h) % _FP_MOD
        fps.append(acc)
    return pa.table(
        {"doc_id": batch[doc_id_col], "fingerprint": pa.array(fps, type=pa.int64())}
    )
