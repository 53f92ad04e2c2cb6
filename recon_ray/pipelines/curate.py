"""The composed training-data curation pipeline — the flow a 100-TB
pre-training corpus runs between raw documents and tokenized shards:

    documents
      → annotate + filter            [ONE map_batches pass: quality,
        (quality / repetition /       repetition, lang-ID masks combined
         language gates)              per batch; text never leaves the
                                      batch unfiltered]
      → exact dedup                  [bucketed min-doc_id per content hash]
      → (optional) MinHash near-dup  [functions.dedup.minhash_lsh_dedup +
         keep-best                    dedup_keep_best; off by default so
                                      the core path stays SQL-oracle-able]
      → sequence packing             [functions.pack.pack_sequences —
                                      reuses the n_tokens column computed
                                      in the annotate pass]

Everything stays a lazy streaming Dataset; the only shuffles are the
dedup hash-bucket exchange and the pack's bucket groupby. The whole core
path (filters → dedup → pack) has a composed DuckDB oracle
(queries.ORACLE_DOC_CURATION) built from the same fragments that oracle
each stage individually.

Reference tie-in: this is the Corpus.apply/pipe_ composition pattern
(recon/corpus.py:13, recon/operations.py:233-258) applied to corpus
curation rather than span correction — operators chain over a stream and
each stage's counts are observable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_MIN_WORDS = 25
DEFAULT_MAX_DUP_WORD = 0.6


def make_curation_filter(
    min_words: int = DEFAULT_MIN_WORDS,
    max_dup_word: float = DEFAULT_MAX_DUP_WORD,
    drop_unknown_lang: bool = True,
):
    """One combined annotate+filter kernel: runs the existing quality /
    repetition / lang-ID / token-count kernels on the batch, ANDs the
    gates, and emits only surviving (doc_id, text, n_tokens) rows —
    the corpus slims at the first stage, not after N passes."""
    from recon_ray.functions.text import (
        make_langid_batch,
        quality_scores,
        repetition_scores,
        token_counts,
    )

    langid = make_langid_batch()

    def f(batch: pa.Table) -> pa.Table:
        q = quality_scores(batch)
        r = repetition_scores(batch)
        t = token_counts(batch)
        keep = (
            q.column("n_words").to_numpy(zero_copy_only=False) >= min_words
        ) & (
            r.column("dup_word_frac").to_numpy(zero_copy_only=False)
            <= max_dup_word
        )
        if drop_unknown_lang:
            preds = langid(batch).column("lang_pred").to_pylist()
            keep &= np.fromiter(
                (p != "unknown" for p in preds), dtype=bool, count=len(preds)
            )
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": batch.column("text"),
                "n_tokens": t.column("n_tokens"),
            }
        )
        return out.filter(pa.array(keep))

    return f


def curate(
    docs_ds,
    *,
    min_words: int = DEFAULT_MIN_WORDS,
    max_dup_word: float = DEFAULT_MAX_DUP_WORD,
    drop_unknown_lang: bool = True,
    near_dedup: bool = False,
    minhash_threshold: float = 0.7,
    max_tokens: int = 512,
    n_buckets: int = 16,
    lm_gate: float | None = None,
) -> dict:
    """Run the curation flow; returns {"curated": Dataset(doc_id, text,
    n_tokens), "packed": Dataset(doc_id, bucket, n_tokens, seq_id),
    "near_dedup": minhash result dict or None}. All lazy until consumed.

    ``lm_gate``: optional CCNet-style perplexity gate — train the bigram
    LM on the already-gated corpus (two count passes, functions/lm.py)
    and drop docs whose mean bigram log-likelihood is below the given
    threshold (e.g. -7.0). Off by default; the composed SQL oracle
    covers the default path, the gate has its own tests."""
    from recon_ray.functions.dedup import exact_dedup
    from recon_ray.functions.pack import pack_sequences

    filtered = docs_ds.map_batches(
        make_curation_filter(min_words, max_dup_word, drop_unknown_lang),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if lm_gate is not None:
        import ray as _ray

        from recon_ray.functions.lm import make_lm_scorer, train_bigram_lm
        from recon_ray.functions.relational import semi_join

        filtered = filtered.materialize()  # LM trains on the gated docs
        model_ref = _ray.put(train_bigram_lm(filtered))
        scored = filtered.map_batches(
            make_lm_scorer(model_ref), batch_format="pandas"
        )
        keep = scored.map_batches(
            lambda b: b.loc[b["lm_score"] >= lm_gate, ["doc_id"]],
            batch_format="pandas",
        ).to_pandas()
        filtered = semi_join(
            filtered, set(keep["doc_id"].tolist()), on="doc_id"
        )
    curated = exact_dedup(filtered, text_col="text", id_col="doc_id")
    nd = None
    if near_dedup:
        from recon_ray.functions.dedup import dedup_keep_best, minhash_lsh_dedup

        res = minhash_lsh_dedup(curated, threshold=minhash_threshold)
        nd = dedup_keep_best(curated, res["clusters"])
        curated = nd["filtered"]
    packed = pack_sequences(
        curated, max_tokens=max_tokens, n_buckets=n_buckets
    )
    return {"curated": curated, "packed": packed, "near_dedup": nd}


def curate_incremental(
    docs_ds,
    store_root: str,
    *,
    min_words: int = DEFAULT_MIN_WORDS,
    max_dup_word: float = DEFAULT_MAX_DUP_WORD,
    drop_unknown_lang: bool = True,
    max_tokens: int = 512,
    n_buckets: int = 16,
    texts: bool = False,
) -> dict:
    """Resumable curation across RUNS: the exact-dedup step is the global
    content-addressed ExampleStore (state/example_store.py), keyed by the
    u64 hash of the text — each run filters its input, adds only novel
    content to the store (per-bucket anti-join, work bounded per bucket),
    and packs ONLY this run's novel docs into fresh sequences. Re-running
    on already-seen input is a no-op (0 added, 0 packs); a crashed run
    re-adds idempotently (content-addressed part files).

    ``texts=True`` emits tokenizer-ready concatenated pack texts
    (``pack_texts``) instead of pack assignments.

    Returns {"n_new": int, "packed": Dataset | None (this run's packs),
    "store": ExampleStore}."""
    import ray.data as rd

    from recon_ray.functions.pack import pack_sequences, pack_texts
    from recon_ray.hashing import hash_u64_arrays
    from recon_ray.state.example_store import ExampleStore

    filtered = docs_ds.map_batches(
        make_curation_filter(min_words, max_dup_word, drop_unknown_lang),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def key_by_content(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        keys = hash_u64_arrays(texts)
        return pa.table(
            {
                "doc_id": pa.array(keys, pa.uint64()),  # store key
                "orig_doc_id": batch.column("doc_id"),
                "text": batch.column("text"),
                "n_tokens": batch.column("n_tokens"),
            }
        )

    keyed = filtered.map_batches(
        key_by_content, batch_format="pyarrow", zero_copy_batch=True
    )
    store = ExampleStore(store_root)
    n_new, parts = store.add_dataset(keyed, return_parts=True)
    if not parts:
        return {"n_new": 0, "packed": None, "store": store}
    new_docs = rd.read_parquet(parts)
    pack = pack_texts if texts else pack_sequences
    packed = pack(new_docs, max_tokens=max_tokens, n_buckets=n_buckets)
    return {"n_new": n_new, "packed": packed, "store": store}
