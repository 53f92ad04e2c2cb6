"""Text-analysis stages for large-scale training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

All are vectorized ``map_batches`` kernels over the ``documents`` table
(doc_id, text, ...). Language ID and fingerprinting are stateful-ish
(compiled regexes / stopword tables) and shaped as callable classes for
actor pools; the pure-arithmetic ones are stateless kernels.
"""

from __future__ import annotations

import math
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


def regex_extract_all(ds, pattern: str, text_col: str = "text",
                      id_col: str = "doc_id", match_col: str = "match"):
    """All non-overlapping regex matches per row, in order —
    SQL ``UNNEST(regexp_extract_all(...))`` with ordinality as a
    distributed flat-map: (id, ord, match) rows, ord 1-based per doc.
    Pattern is compiled once per call (closure state; the worker reuses
    it across batches). Engine-parity contract (same as pii.py): keep
    the pattern RE2-safe (no lookarounds/backrefs) so Python ``re`` and
    DuckDB's RE2 find identical spans. Embarrassingly parallel; no
    shuffle; output rows ≈ total matches, never the corpus."""
    rx = re.compile(pattern)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ords, ms = [], [], []
        for i, t in zip(batch[id_col], batch[text_col]):
            for j, m in enumerate(rx.finditer(t or ""), 1):
                ids.append(i)
                ords.append(j)
                ms.append(m.group(0))
        return pd.DataFrame(
            {id_col: pd.Series(ids, dtype=batch[id_col].dtype),
             "ord": pd.Series(ords, dtype="int64"),
             match_col: pd.Series(ms, dtype=object)}
        )

    return ds.map_batches(fn, batch_format="pandas")


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


def repetition_scores(batch: pa.Table) -> pa.Table:
    """Within-document repetition signals (the Gopher/MassiveText-style
    quality filters): fraction of duplicate words / 2-grams / 3-grams and
    the top-word share. A doc whose text is one paragraph pasted ten times
    scores ~0.9 dup fractions and gets filtered before training.

    Vectorized across the batch: words factorize to int codes once;
    per-doc distinct counts come from np.unique over (doc, code) pairs and
    n-gram codes chain via code arithmetic — no per-doc Counter loops.
    Definitions (mirrored exactly by ORACLE_DOC_REPETITION):
    words = lowercased \\w+ matches; k-grams = adjacent runs (n-k+1 per
    doc, 0 when the doc has fewer than k words); dup_frac = (total -
    distinct) / total, 0 when total is 0; top_word_frac = max word count /
    n_words."""
    texts = batch.column("text").to_pylist()
    n_docs = len(texts)
    words_per_doc = [
        [w.lower() for w in WORD_RE.findall(t)] for t in texts
    ]
    n_words = np.fromiter(
        (len(ws) for ws in words_per_doc), dtype=np.int64, count=n_docs
    )
    flat = [w for ws in words_per_doc for w in ws]
    didx = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)

    def zeros():
        return np.zeros(n_docs, np.float64)

    if not flat:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_words, pa.int64()),
                "dup_word_frac": pa.array(zeros(), pa.float64()),
                "dup_2gram_frac": pa.array(zeros(), pa.float64()),
                "dup_3gram_frac": pa.array(zeros(), pa.float64()),
                "top_word_frac": pa.array(zeros(), pa.float64()),
            }
        )
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    codes = codes.astype(np.int64)
    K = np.int64(len(uniques))

    def dup_frac(gram_codes: np.ndarray, gram_didx: np.ndarray,
                 totals: np.ndarray) -> np.ndarray:
        if len(gram_codes) == 0:
            return zeros()
        comb = gram_didx * (gram_codes.max() + 1) + gram_codes
        uniq_pairs = np.unique(comb)
        distinct = np.bincount(
            (uniq_pairs // (gram_codes.max() + 1)), minlength=n_docs
        )
        tot = totals.astype(np.float64)
        return np.where(tot > 0, (tot - distinct) / np.maximum(tot, 1), 0.0)

    # words
    dup_w = dup_frac(codes, didx, n_words)
    # top word share: counts of each (doc, word) pair, then per-doc max
    comb_w = didx * K + codes
    pairs, counts = np.unique(comb_w, return_counts=True)
    top = np.zeros(n_docs, np.int64)
    np.maximum.at(top, (pairs // K).astype(np.int64), counts)
    top_frac = np.where(
        n_words > 0, top / np.maximum(n_words, 1), 0.0
    )
    # adjacent 2-grams: positions i, i+1 within the same doc
    adj = didx[1:] == didx[:-1] if len(codes) > 1 else np.zeros(0, bool)
    c2 = codes[:-1][adj] * K + codes[1:][adj]
    d2 = didx[:-1][adj]
    n2 = np.maximum(n_words - 1, 0)
    # re-factorize 2-gram codes so the 3-gram chain stays in int64 range
    u2, inv2 = np.unique(c2, return_inverse=True)
    dup_2 = dup_frac(inv2, d2, n2)
    # 3-grams = (2-gram at i, word at i+2) — adjacency needs didx[i]==didx[i+2]
    if len(codes) > 2:
        adj3 = (didx[2:] == didx[:-2])
        # inv2 indexes positions where adj held; map back: position i has a
        # 2-gram iff adj[i]; build full-length inv2 slots
        inv2_full = np.full(len(codes) - 1, -1, dtype=np.int64)
        inv2_full[adj] = inv2
        first = inv2_full[:-1]
        ok = adj3 & (first >= 0)
        c3 = first[ok] * K + codes[2:][ok]
        d3 = didx[2:][ok]
    else:
        c3 = np.zeros(0, np.int64)
        d3 = np.zeros(0, np.int64)
    n3 = np.maximum(n_words - 2, 0)
    dup_3 = dup_frac(c3, d3, n3)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "dup_word_frac": pa.array(dup_w, pa.float64()),
            "dup_2gram_frac": pa.array(dup_2, pa.float64()),
            "dup_3gram_frac": pa.array(dup_3, pa.float64()),
            "top_word_frac": pa.array(top_frac, pa.float64()),
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


_WS_RUN_RE = re.compile(r"\s+")


def normalize_text(ds, text_col: str = "text", lowercase: bool = True,
                   squash_whitespace: bool = True, nfkc: bool = True):
    """Standard curation text normalization — NFKC unicode fold,
    lowercase, whitespace-run squash + strip — as a streaming
    ``map_batches`` stage (appends ``text_norm`` + ``norm_changed``).
    NFKC runs via ``unicodedata`` (C speed); case/whitespace are
    vectorized where pandas has the kernel."""
    import unicodedata

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col]
        if nfkc:
            s = pd.Series(
                [unicodedata.normalize("NFKC", t) for t in s],
                index=s.index,
            )
        if lowercase:
            s = s.str.lower()
        if squash_whitespace:
            s = s.str.replace(_WS_RUN_RE, " ", regex=True).str.strip()
        batch = batch.copy()
        batch["text_norm"] = s
        batch["norm_changed"] = (s != batch[text_col]).to_numpy()
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def dictionary_tag(
    ds,
    keywords: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Dictionary / gazetteer tagging — the EntityRecognizer-family
    pattern (reference recon/recognizer.py predicts spans from a model;
    here the "model" is a keyword dictionary): per (doc, keyword)
    non-overlapping occurrence counts, rows only where count > 0.

    Scale shape: the dictionary broadcasts once (``ray.put``, cached per
    worker); each batch runs one C-speed vectorized ``str.count`` pass
    per keyword (keywords are column-parallel, documents are
    row-parallel — fine for dictionaries up to ~10⁴ entries; beyond
    that, swap the inner loop for an Aho-Corasick automaton without
    touching the stage contract). Counting is per-keyword independent
    substring matching (no cross-keyword shadowing) — the exact rule a
    SQL replace-length oracle replays."""
    import re as _re

    import ray as _ray

    kw_ref = _ray.put(sorted(set(keywords)))

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        kws = _ray.get(kw_ref) if isinstance(kw_ref, _ray.ObjectRef) else kw_ref
        texts = batch[text_col].astype(str)
        ids, out_kw, counts = [], [], []
        for kw in kws:
            c = texts.str.count(_re.escape(kw)).astype("int64")
            hit = c > 0
            if hit.any():
                ids.extend(batch[id_col][hit].tolist())
                out_kw.extend([kw] * int(hit.sum()))
                counts.extend(c[hit].tolist())
        return pd.DataFrame(
            {id_col: pd.Series(ids, dtype="int64"),
             "keyword": pd.Series(out_kw, dtype="object"),
             "n_hits": pd.Series(counts, dtype="int64")}
        )

    return ds.map_batches(tag, batch_format="pandas")


def chunk_texts(
    ds,
    size: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 0,
):
    """Sliding-window document chunking — the long-document splitter a
    training pipeline runs before packing (context window ≫ tokenizer
    max): one chunk per window start 0, stride, 2·stride, … while the
    start is inside the text; the final chunk may be short. Returns a
    lazy Dataset of (id_col, chunk_idx, chunk).

    Embarrassingly parallel map, no shuffle: window starts are derived
    per batch with the same run-structure arithmetic as explode_list
    (repeat + offset-subtract, all numpy), and only the per-chunk slice
    is a Python-level loop (C string slicing; bounded by chunks, not
    chars). Docs shorter than ``min_chars`` are dropped before
    chunking — pass size to keep single-window docs out of the output
    when only long docs need splitting."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def f(b: pd.DataFrame) -> pd.DataFrame:
        texts = b[text_col].to_numpy()
        lens = b[text_col].str.len().to_numpy(dtype=np.int64)
        keep = lens > min_chars
        texts, lens = texts[keep], lens[keep]
        ids = b[id_col].to_numpy()[keep]
        if len(texts) == 0:
            return pd.DataFrame(
                {id_col: pd.Series(dtype=b[id_col].dtype),
                 "chunk_idx": pd.Series(dtype="int64"),
                 "chunk": pd.Series(dtype="object")}
            )
        counts = (lens + stride - 1) // stride  # ceil(len/stride) ≥ 1
        parent = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        idx = np.arange(len(parent), dtype=np.int64)
        first = np.concatenate(([0], np.cumsum(counts)[:-1]))
        chunk_idx = idx - first[parent]
        off = chunk_idx * stride
        return pd.DataFrame(
            {
                id_col: ids[parent],
                "chunk_idx": chunk_idx,
                "chunk": [
                    texts[p][o:o + size]
                    for p, o in zip(parent, off)
                ],
            }
        )

    return ds.map_batches(f, batch_format="pandas")


def compression_signals(batch: pa.Table) -> pa.Table:
    """(doc_id, raw_bytes, zlib_bytes, compress_ppm, nonprint_ppm,
    replacement_ppm): compressibility + encoding-health quality signals.
    A near-1.0 compression ratio means low-entropy boilerplate/repetition
    (drop candidates in FineWeb/CCNet-style filters); replacement chars
    (U+FFFD) and non-printables flag decode damage. zlib level 6 is
    pinned so the ratio is deterministic across runs; all ratios are
    integer ppm (floor), so a rows-only gate compares exactly. C-speed
    per row (zlib + str.translate), no Python char loops."""
    import zlib

    texts = batch.column("text").to_pylist()
    n = len(texts)
    raw = np.zeros(n, np.int64)
    comp = np.zeros(n, np.int64)
    nonp = np.zeros(n, np.int64)
    repl = np.zeros(n, np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        b = t.encode("utf-8", errors="replace")
        raw[i] = len(b)
        comp[i] = len(zlib.compress(b, 6))
        nonp[i] = sum(
            1 for ch in t if (ord(ch) < 32 and ch not in "\t\n\r")
        )
        repl[i] = t.count("�")
    n_chars = np.fromiter((len(t or "") for t in texts), np.int64, count=n)
    safe_raw = np.maximum(raw, 1)
    safe_chars = np.maximum(n_chars, 1)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "raw_bytes": pa.array(raw, pa.int64()),
            "zlib_bytes": pa.array(comp, pa.int64()),
            "compress_ppm": pa.array(
                comp * 1_000_000 // safe_raw, pa.int64()
            ),
            "nonprint_ppm": pa.array(
                nonp * 1_000_000 // safe_chars, pa.int64()
            ),
            "replacement_ppm": pa.array(
                repl * 1_000_000 // safe_chars, pa.int64()
            ),
        }
    )


def bm25_search(docs_ds, query_terms, k: int = 10, k1: float = 1.2,
                b: float = 0.75, text_col: str = "text",
                id_col: str = "doc_id") -> "pd.DataFrame":
    """Full-text BM25 (Robertson/Spärck Jones) top-k search over a text
    column — terms are the corpus-standard lowercase ``\\w+`` matches
    (identical to doc_word_freq's SQL-parity tokenization), idf the
    ln((N − df + ½)/(df + ½) + 1) form, scores rounded to 6 dp on BOTH
    engines (the repo's float-at-the-boundary convention, same as
    doc_lm_score).

    Scale shape: pass 1 is a combiner emitting ONE stats row per batch
    (doc count, total term count, per-query-term document frequencies —
    the whole posting index is never materialized, only the q query
    terms' df); pass 2 broadcasts the tiny (idf, avgdl) model, scores
    each doc batch-locally and keeps a LOCAL top-k, so the driver merges
    at most k × n_batches candidate rows. No shuffle at all."""
    import re as _re

    import ray as _ray

    q = sorted({t.lower() for t in query_terms})
    if not q:
        raise ValueError("bm25_search needs at least one query term")
    word = _re.compile(r"\w+")

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        n, sum_dl = 0, 0
        df = dict.fromkeys(q, 0)
        for t in batch[text_col].astype(str):
            toks = word.findall(t.lower())
            n += 1
            sum_dl += len(toks)
            seen = set(toks)
            for term in q:
                if term in seen:
                    df[term] += 1
        row = {"n": [n], "sum_dl": [sum_dl]}
        for i, term in enumerate(q):
            row[f"df{i}"] = [df[term]]
        return pd.DataFrame(row)

    sp = docs_ds.map_batches(stats, batch_format="pandas").to_pandas().sum()
    n_docs = int(sp["n"])
    if n_docs == 0:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    avgdl = float(sp["sum_dl"]) / n_docs
    idf = {
        term: math.log((n_docs - int(sp[f"df{i}"]) + 0.5)
                       / (int(sp[f"df{i}"]) + 0.5) + 1.0)
        for i, term in enumerate(q)
    }
    model_ref = _ray.put((idf, avgdl))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(model_ref) if isinstance(model_ref, _ray.ObjectRef) \
            else model_ref
        idf_, avgdl_ = m
        ids, scores = [], []
        for i, t in zip(batch[id_col], batch[text_col].astype(str)):
            toks = word.findall(t.lower())
            dl = len(toks)
            s = 0.0
            for term in q:  # sorted: deterministic float sum order
                tf = toks.count(term)
                if tf:
                    s += idf_[term] * tf * (k1 + 1) / (
                        tf + k1 * (1 - b + b * dl / avgdl_))
            if s > 0.0:
                ids.append(i)
                scores.append(round(s, 6))
        out = pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                            "score": pd.Series(scores, dtype="float64")})
        return out.sort_values(
            ["score", id_col], ascending=[False, True]).head(k)

    parts = docs_ds.map_batches(score, batch_format="pandas").to_pandas()
    if parts.empty:  # zero matching docs: all-empty to_pandas loses cols
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    return (
        parts.sort_values(["score", id_col], ascending=[False, True])
        .head(k).reset_index(drop=True)
    )


_CHUNK_WS = re.compile(r"[ \t\n\r\f\v]+")


def chunk_documents(ds, size: int = 64, stride: int = 48,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Split documents into overlapping whitespace-token windows — the
    standard retrieval / training-prep chunker (the inverse concern of
    ``pack.py``'s sequence packing, which CONCATENATES short docs).

    Chunk c of a T-token document covers tokens [c·stride, c·stride +
    size); the chunk count is 1 when T ≤ size, else
    ceil((T − size)/stride) + 1 — every token is covered and the last
    window ends exactly at T. Whitespace-only / empty docs emit no
    chunks. Token text is re-joined with single spaces (normalized-join
    chunking), so the output is layout- and whitespace-run-invariant.

    Pure map stage — NO shuffle: each batch explodes its own tokens
    (replication factor ≤ ceil(size/stride)), assigns chunk ids with
    integer index arithmetic, and joins per chunk via one C-level
    ``' '.join`` per OUTPUT chunk. The tokenizer class [ \\t\\n\\r\\f\\v]
    matches RE2's ``\\s``, so a DuckDB oracle reproduces chunks
    byte-for-byte (query ``doc_chunks``).

    Returns a Dataset with (id_col, chunk_idx, n_tokens, chunk_text)."""
    if not (1 <= stride <= size):
        raise ValueError("need 1 <= stride <= size")

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        tok_lists = [
            [t for t in _CHUNK_WS.split(s) if t]
            if isinstance(s, str) else []
            for s in b[text_col]
        ]
        n_tok = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                            count=len(tok_lists))
        keep = n_tok > 0
        if not keep.any():
            return pd.DataFrame({
                id_col: pd.Series(dtype=b[id_col].dtype),
                "chunk_idx": pd.Series(dtype="int64"),
                "n_tokens": pd.Series(dtype="int64"),
                "chunk_text": pd.Series(dtype=object)})
        ids = b[id_col].to_numpy()[keep]
        toks = [t for t in tok_lists if t]
        T = n_tok[keep]
        # chunk count per doc: 1 if T <= size else ceil((T-size)/stride)+1
        C = np.where(T <= size, 1, (T - size + stride - 1) // stride + 1)
        # explode tokens with per-doc positions
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        doc_of = np.repeat(np.arange(len(T)), T)
        pos = np.arange(len(flat)) - np.repeat(
            np.concatenate([[0], np.cumsum(T)[:-1]]), T)
        # token at pos p rides chunks c in [max(0,(p-size)//stride+1),
        # min(C-1, p//stride)] — replication ≤ ceil(size/stride)
        c_min = np.maximum(0, (pos - size) // stride + 1)
        c_max = np.minimum(C[doc_of] - 1, pos // stride)
        rep = (c_max - c_min + 1).astype(np.int64)
        r_doc = np.repeat(doc_of, rep)
        r_tok = np.repeat(flat, rep)
        r_pos = np.repeat(pos, rep)
        # intra-run arange: global arange minus each run's start
        ga = np.arange(rep.sum())
        run_start = np.repeat(np.cumsum(rep) - rep, rep)
        r_chunk = np.repeat(c_min, rep) + (ga - run_start)
        out = pd.DataFrame({
            "__d": r_doc, "chunk_idx": r_chunk, "__p": r_pos,
            "__t": r_tok})
        out = out.sort_values(["__d", "chunk_idx", "__p"],
                              kind="mergesort")
        g = out.groupby(["__d", "chunk_idx"], sort=False)
        res = g["__t"].agg(" ".join).rename("chunk_text").reset_index()
        res["n_tokens"] = g.size().to_numpy()
        res[id_col] = ids[res["__d"].to_numpy()]
        return res[[id_col, "chunk_idx", "n_tokens", "chunk_text"]]

    return ds.map_batches(fn, batch_format="pandas")
