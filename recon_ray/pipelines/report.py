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


def format_report_html(rep: dict, title: str = "Corpus report") -> str:
    """Standalone-HTML rendering of :func:`corpus_report` — the engine's
    dashboard analogue (/root/reference/recon/cli/dashboard.py serves a
    FastAPI/streamlit stub; a server is out of scope for a batch engine,
    so the same statistics render as one self-contained file: inline CSS,
    semantic tables, no scripts, no external fetches)."""
    import html as _html

    def esc(v) -> str:
        return _html.escape(str(v))

    def table(df: pd.DataFrame, index: bool = False) -> str:
        cols = ([""] if index else []) + [esc(c) for c in df.columns]
        head = "".join(f"<th>{c}</th>" for c in cols)
        rows = []
        for idx, row in df.iterrows():
            cells = ([f"<th>{esc(idx)}</th>"] if index else []) + [
                f"<td>{esc(v)}</td>" for v in row
            ]
            rows.append("<tr>" + "".join(cells) + "</tr>")
        return (
            f"<table><thead><tr>{head}</tr></thead>"
            f"<tbody>{''.join(rows)}</tbody></table>"
        )

    summary = pd.DataFrame(
        {
            "metric": ["documents", "words", "characters",
                       "exact-duplicate docs", "exact-duplicate rate"],
            "value": [
                f"{rep['n_docs']:,}", f"{rep['n_words']:,}",
                f"{rep['n_chars']:,}", f"{rep['exact_dup_docs']:,}",
                f"{100 * rep['exact_dup_rate']:.2f}%",
            ],
        }
    )
    css = (
        "body{font-family:system-ui,sans-serif;margin:2rem auto;"
        "max-width:56rem;padding:0 1rem;color:#1a1a1a}"
        "h1{font-size:1.4rem}h2{font-size:1.1rem;margin-top:2rem}"
        "table{border-collapse:collapse;margin:.5rem 0;width:100%}"
        "th,td{border:1px solid #d0d0d0;padding:.3rem .6rem;"
        "text-align:left;font-variant-numeric:tabular-nums}"
        "th{background:#f5f5f5;font-weight:600}"
    )
    parts = [
        "<!doctype html><html lang=\"en\"><head><meta charset=\"utf-8\">",
        f"<title>{esc(title)}</title><style>{css}</style></head><body>",
        f"<h1>{esc(title)}</h1>",
        "<h2>Summary</h2>", table(summary),
        "<h2>Languages</h2>", table(rep["languages"]),
        "<h2>Quality quantiles</h2>",
        table(rep["quality_quantiles"].round(4), index=True),
        "<h2>Top terms</h2>", table(rep["top_terms"]),
        "</body></html>",
    ]
    return "".join(parts)


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
