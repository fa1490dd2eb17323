"""Text-analysis operators: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

Token counting uses the oracle-mirrorable definition
``count(' ') + 1`` over single-space-joined text (the synthetic corpus
is single-spaced; a production tokenizer swaps in via the same stage
signature). Quality/lang-ID are deterministic heuristics (rows-only
checks — no SQL equivalent).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = {"the", "and", "of", "a", "to", "in", "is", "it"}

# tiny per-language marker sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": {"the", "and", "with", "fast", "slow"},
    "de": {"und", "der", "die", "das", "mit"},
    "fr": {"le", "la", "et", "les", "des"},
    "es": {"el", "la", "y", "los", "de"},
    "zh": set(),  # CJK detection is codepoint-based below
}


def add_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """tokens := count(' ')+1 (0 for empty string) — vectorized and
    identical to the SQL oracle's definition."""
    spaces = pc.count_substring(batch[text_col], " ")
    nonempty = pc.not_equal(batch[text_col], "")
    toks = pc.if_else(nonempty, pc.add(spaces, 1), pa.scalar(0, pa.int32()))
    return batch.append_column("n_tokens", toks.cast(pa.int64()))


def quality_stage(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Quality scoring: length, mean word length, stopword ratio,
    punctuation ratio, uppercase ratio — the cheap-filters stage of a
    training-data pipeline (C4/Gopher-style)."""
    texts = batch[text_col]
    words = texts.str.split(" ")
    n_words = words.str.len().fillna(0).astype(int)
    batch["n_chars_m"] = texts.str.len()
    batch["mean_word_len"] = (texts.str.replace(" ", "", regex=False).str.len() / n_words.clip(lower=1)).round(4)
    batch["stop_ratio"] = (
        words.map(lambda ws: sum(w in STOPWORDS for w in ws)) / n_words.clip(lower=1)
    ).round(4)
    batch["punct_ratio"] = (texts.str.count(r"[^\w\s]") / texts.str.len().clip(lower=1)).round(4)
    batch["quality_ok"] = (n_words >= 5) & (batch["mean_word_len"].between(2, 12))
    return batch


def langid_stage(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Language-ID heuristic: CJK codepoint share, else marker-word
    voting, else 'en'. Deterministic; rows-only check."""
    preds = []
    for t in batch[text_col]:
        if sum("一" <= ch <= "鿿" for ch in t) > len(t) * 0.2:
            preds.append("zh")
            continue
        ws = set(t.lower().split(" "))
        scores = {lang: len(ws & m) for lang, m in LANG_MARKERS.items() if m}
        best = max(scores, key=lambda k: (scores[k], k))
        preds.append(best if scores[best] > 0 else "en")
    batch["lang_pred"] = preds
    return batch


def fingerprint_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 content fingerprint (matches SQL md5()) plus a 64-bit
    rolling polynomial hash (Rabin-Karp style) for windowed dedup."""
    texts = batch[text_col].to_pylist()
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    mask = (1 << 64) - 1
    rolls = []
    for t in texts:
        h = 14695981039346656037
        for b in t.encode():
            h = ((h ^ b) * 1099511628211) & mask  # FNV-1a, 64-bit modular
        rolls.append(h - (1 << 64) if h >= (1 << 63) else h)
    batch = batch.append_column("fp", pa.array(md5s))
    return batch.append_column("fp_roll", pa.array(rolls, type=pa.int64()))
