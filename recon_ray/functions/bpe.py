"""Tokenizer-vocabulary induction at corpus scale: byte-pair-encoding
training in the standard Sennrich et al. 2016 shape —

1. the CORPUS-SIZED work is one distributed word count (per-batch
   combiner + a single key shuffle, `relational.group_count`): BPE merges
   never cross word boundaries, so everything after runs on the distinct
   word-frequency table (vocabulary-sized, ≪ corpus at 100 TB);
2. the merge loop itself is driver-side over that small table — each
   iteration counts adjacent symbol pairs weighted by word frequency and
   merges the most frequent pair (ties broken lexicographically, so
   training is fully deterministic and layout-invariant: word counts are
   exact integers under any shuffle).

`make_bpe_encoder(merges)` returns a map_batches stage that applies the
learned merges (rank-greedy, the standard inference rule) — per-worker
merge-rank dict built once per process.

Word segmentation is lowercase `\\w+` (WORD_RE, shared with the dedup
shinglers); the end-of-word marker `</w>` keeps suffix merges distinct
from prefix merges, per the paper.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

WORD_RE = re.compile(r"\w+", re.UNICODE)
EOW = "</w>"


def _word_counts(ds, text_col: str) -> pd.DataFrame:
    from recon_ray.functions.relational import group_count

    def words(batch: pd.DataFrame) -> pd.DataFrame:
        out: list[str] = []
        for t in batch[text_col]:
            out.extend(w.lower() for w in WORD_RE.findall(t))
        return pd.DataFrame({"word": out})

    return group_count(ds.map_batches(words, batch_format="pandas"), "word")


def train_bpe(ds, text_col: str = "text", n_merges: int = 200,
              min_pair_freq: int = 2) -> dict:
    """Learn ``n_merges`` BPE merges over the corpus. Returns
    {"merges": [(a, b), ...] in rank order, "n_words": distinct words,
    "total_words": corpus word occurrences}."""
    wc = _word_counts(ds, text_col)
    if len(wc) == 0:
        return {"merges": [], "n_words": 0, "total_words": 0}
    freqs = wc["count"].to_numpy(np.int64)
    # each word as a tuple of symbols, chars + end-of-word marker
    symbolized = [tuple(w) + (EOW,) for w in wc["word"]]

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, f in zip(symbolized, freqs):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + int(f)
        if not pair_counts:
            break
        # max by (count, lexicographically-smallest pair) → deterministic
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < min_pair_freq:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_symbolized = []
        for syms in symbolized:
            if a not in syms:
                new_symbolized.append(syms)
                continue
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_symbolized.append(tuple(out))
        symbolized = new_symbolized
    return {
        "merges": merges,
        "n_words": int(len(wc)),
        "total_words": int(freqs.sum()),
    }


def bpe_encode_word(word: str, ranks: dict) -> list[str]:
    """Rank-greedy BPE inference: repeatedly merge the lowest-rank
    adjacent pair (the standard GPT-2/sentencepiece rule)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


#: per-worker-process encoder cache (rank dict builds once per process)
_PROCESS_BPE: dict = {}


def make_bpe_encoder(merges: list, text_col: str = "text",
                     id_col: str = "doc_id"):
    """map_batches stage: (id, n_words, n_tokens, n_unk_chars) per doc
    under the learned merges — the token-budget signal sequence packing
    and curation gates consume. Per-word encodings are memoized per batch
    (Zipf: a few thousand distinct words dominate)."""
    merges_t = tuple(map(tuple, merges))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ranks = _PROCESS_BPE.get(merges_t)
        if ranks is None:
            ranks = _PROCESS_BPE[merges_t] = {
                p: i for i, p in enumerate(merges_t)
            }
        memo: dict[str, int] = {}
        n_words = np.zeros(len(batch), np.int64)
        n_tokens = np.zeros(len(batch), np.int64)
        for j, t in enumerate(batch[text_col]):
            ws = [w.lower() for w in WORD_RE.findall(t)]
            n_words[j] = len(ws)
            tot = 0
            for w in ws:
                c = memo.get(w)
                if c is None:
                    c = memo[w] = len(bpe_encode_word(w, ranks))
                tot += c
            n_tokens[j] = tot
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(),
             "n_words": n_words, "n_tokens": n_tokens}
        )

    return fn
