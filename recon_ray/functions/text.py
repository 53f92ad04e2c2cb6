"""Text-analysis stages for large-scale training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

All are vectorized ``map_batches`` kernels over the ``documents`` table
(doc_id, text, ...). Language ID and fingerprinting are stateful-ish
(compiled regexes / stopword tables) and shaped as callable classes for
actor pools; the pure-arithmetic ones are stateless kernels.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

WORD_RE = re.compile(r"\w+", re.UNICODE)
TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)  # BPE-ish pre-tokenizer
PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")


def token_counts(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_chars): whitespace tokens (0 for blank docs)
    + raw char length. Matches the SQL oracle:
    CASE WHEN trim(text)='' THEN 0 ELSE len(regexp_split_to_array(trim(text),'\\s+')) END."""
    texts = batch.column("text").to_pylist()
    n_tokens = np.fromiter(
        (0 if not t.strip() else len(t.strip().split()) for t in texts),
        dtype=np.int64, count=len(texts),
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_chars": pc.utf8_length(batch.column("text")).cast(pa.int64()),
        }
    )


def search(ds, query: str, case_sensitive: bool = True, text_col: str = "text"):
    """Substring search — the Dataset.search port (recon/dataset.py:291-311)
    as a vectorized Arrow filter (pc.match_substring), streaming over the
    corpus instead of the reference's driver-side Python loop. Returns the
    matching rows as a (lazy) Dataset."""

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring(
            batch.column(text_col), query, ignore_case=not case_sensitive
        )
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def bpe_token_counts(batch: pa.Table) -> pa.Table:
    """(doc_id, n_bpe_tokens): count of \\w+|[^\\w\\s] matches — the
    pre-tokenization a BPE vocab would see."""
    texts = batch.column("text").to_pylist()
    n = np.fromiter(
        (len(TOKEN_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )
    return pa.table(
        {"doc_id": batch.column("doc_id"), "n_bpe_tokens": pa.array(n, pa.int64())}
    )


def quality_scores(batch: pa.Table) -> pa.Table:
    """Heuristic quality features (doc_id, n_chars, n_words, avg_word_len,
    punct_ratio, digit_ratio, upper_ratio) — the standard pre-training
    corpus filters (length/punctuation/casing ratios)."""
    texts = batch.column("text").to_pylist()
    n = len(texts)
    n_chars = np.zeros(n, np.int64)
    n_words = np.zeros(n, np.int64)
    word_chars = np.zeros(n, np.int64)
    n_punct = np.zeros(n, np.int64)
    n_digit = np.zeros(n, np.int64)
    n_upper = np.zeros(n, np.int64)
    for i, t in enumerate(texts):
        n_chars[i] = len(t)
        words = WORD_RE.findall(t)
        n_words[i] = len(words)
        word_chars[i] = sum(len(w) for w in words)
        n_punct[i] = len(PUNCT_RE.findall(t))
        n_digit[i] = sum(c.isdigit() for c in t)
        n_upper[i] = sum(c.isupper() for c in t)
    denom = np.maximum(n_chars, 1).astype(np.float64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "avg_word_len": pa.array(
                word_chars / np.maximum(n_words, 1), pa.float64()
            ),
            "punct_ratio": pa.array(n_punct / denom, pa.float64()),
            "digit_ratio": pa.array(n_digit / denom, pa.float64()),
            "upper_ratio": pa.array(n_upper / denom, pa.float64()),
        }
    )


#: tiny per-language stopword tables for the n-gram/stopword heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that", "for",
           "on", "with", "as", "are", "this", "be", "or", "an", "at"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
           "zu", "den", "von", "für", "auf", "im", "sie"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "pour",
           "dans", "que", "qui", "pas", "sur", "avec"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "que",
           "en", "por", "para", "con", "no", "se"},
}


class LanguageId:
    """Actor-pool language identifier: stopword-hit-rate argmax with an
    'unknown' fallback — the classic cheap lang-ID heuristic. State
    (lowercased stopword sets, compiled regex) built once per actor."""

    def __init__(self, min_score: float = 0.05):
        self.word = WORD_RE
        self.tables = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}
        self.min_score = min_score

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs, scores = [], []
        for t in texts:
            words = [w.lower() for w in self.word.findall(t)]
            if not words:
                langs.append("unknown")
                scores.append(0.0)
                continue
            best_lang, best = "unknown", 0.0
            for lang, table in self.tables.items():
                s = sum(w in table for w in words) / len(words)
                if s > best:
                    best_lang, best = lang, s
            if best < self.min_score:
                best_lang = "unknown"
            langs.append(best_lang)
            scores.append(round(best, 6))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(langs, pa.string()),
                "lang_score": pa.array(scores, pa.float64()),
            }
        )


#: per-worker-process kernel cache (elastic-task form of the stateful
#: stages — see stages/detect.py; an actor pool pays 2-4 s spawn for
#: state that costs microseconds to build)
_PROCESS_KERNELS: dict = {}


def make_langid_batch(min_score: float = 0.05):
    def fn(batch: pa.Table) -> pa.Table:
        key = ("langid", min_score)
        h = _PROCESS_KERNELS.get(key)
        if h is None:
            h = _PROCESS_KERNELS[key] = LanguageId(min_score=min_score)
        return h(batch)

    return fn


def make_fingerprint_batch(w: int = 5):
    def fn(batch: pa.Table) -> pa.Table:
        key = ("fingerprint", w)
        h = _PROCESS_KERNELS.get(key)
        if h is None:
            h = _PROCESS_KERNELS[key] = Fingerprinter(w=w)
        return h(batch)

    return fn


_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def _fnv1a_bytes(data: bytes) -> np.uint64:
    h = _FP_OFFSET
    for b in data:
        h = np.uint64((int(h) ^ b) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
    return h


class Fingerprinter:
    """Rolling-hash document fingerprinting (winnowing-style): hash every
    word w-gram, keep the minimum — a deterministic 64-bit doc fingerprint
    robust to local edits. Emits (doc_id, fingerprint, n_grams)."""

    def __init__(self, w: int = 5):
        self.w = w
        self.word = WORD_RE

    def gram_hashes(self, text: str) -> np.ndarray:
        words = [w.lower() for w in self.word.findall(text)]
        if len(words) < self.w:
            grams = [" ".join(words)] if words else []
        else:
            grams = [
                " ".join(words[i : i + self.w])
                for i in range(len(words) - self.w + 1)
            ]
        if not grams:
            return np.array([], dtype=np.uint64)
        return np.fromiter(
            (_fnv1a_bytes(g.encode()) for g in grams),
            dtype=np.uint64, count=len(grams),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = np.zeros(len(texts), dtype=np.uint64)
        ng = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            hs = self.gram_hashes(t)
            ng[i] = len(hs)
            fps[i] = hs.min() if len(hs) else 0
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fingerprint": pa.array(fps, pa.uint64()),
                "n_grams": pa.array(ng, pa.int64()),
            }
        )
