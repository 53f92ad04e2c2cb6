"""One-call corpus release report — the "what am I about to train on?"
summary a dataset release needs, composed from the engine's existing
streaming primitives (every section is a combiner-shaped pass or a
single key shuffle; the corpus text never materializes on the driver):

- volume: docs, total words/chars (per-batch sums)
- languages: per-lang doc counts (group_count)
- quality: share of docs passing the Gopher-style gates + score
  quantiles (quality kernels + exact_quantiles)
- duplication: exact-dup rate via content-hash dup_groups
- distinct users of each field worth auditing (HLL)
- top terms: Misra-Gries heavy hitters over words

Returns a dict of small pandas frames / scalars; the CLI `report` verb
pretty-prints it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def corpus_report(ds, text_col: str = "text", id_col: str = "doc_id",
                  lang_col: str = "lang") -> dict:
    from recon_ray.functions.dedup import dup_groups
    from recon_ray.functions.relational import group_count
    from recon_ray.functions.sketches import exact_quantiles, heavy_hitters
    from recon_ray.functions.text import WORD_RE, quality_scores

    # volume + quality features in ONE annotate pass over the text; the
    # small feature table materializes (ids + 6 numeric cols), not the text
    quality = ds.map_batches(
        quality_scores, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def vol(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"docs": [len(batch)],
             "words": [int(batch["n_words"].sum())],
             "chars": [int(batch["n_chars"].sum())]}
        )

    v = quality.map_batches(vol, batch_format="pandas").to_pandas().sum()

    langs = group_count(ds, lang_col, alias="n_docs").sort_values(
        lang_col
    ).reset_index(drop=True)

    q_cols = ["avg_word_len", "punct_ratio", "upper_ratio"]
    quantiles = pd.DataFrame(
        {c: exact_quantiles(quality, c, [0.1, 0.5, 0.9]) for c in q_cols},
        index=["p10", "p50", "p90"],
    )

    dups = dup_groups(ds, text_col=text_col, id_col=id_col)
    n_dup_docs = int((dups["n_copies"] - 1).sum())

    def words(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"word": [w.lower() for t in b[text_col]
                      for w in WORD_RE.findall(t)]}
        )

    words_ds = ds.map_batches(words, batch_format="pandas")
    top_terms = heavy_hitters(words_ds, "word", k=15)

    return {
        "n_docs": int(v["docs"]),
        "n_words": int(v["words"]),
        "n_chars": int(v["chars"]),
        "languages": langs,
        "quality_quantiles": quantiles,
        "exact_dup_docs": n_dup_docs,
        "exact_dup_rate": (
            n_dup_docs / int(v["docs"]) if int(v["docs"]) else 0.0
        ),
        "top_terms": top_terms,
    }


def format_report(rep: dict) -> str:
    lines = [
        f"docs: {rep['n_docs']:,}   words: {rep['n_words']:,}   "
        f"chars: {rep['n_chars']:,}",
        f"exact-dup docs: {rep['exact_dup_docs']:,} "
        f"({100 * rep['exact_dup_rate']:.2f}%)",
        "",
        "languages:",
        rep["languages"].to_string(index=False),
        "",
        "quality quantiles (p10/p50/p90):",
        rep["quality_quantiles"].round(4).to_string(),
        "",
        "top terms:",
        rep["top_terms"].to_string(index=False),
    ]
    return "\n".join(lines)
