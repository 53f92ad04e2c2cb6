"""Augmentation + split operators — ports of the reference's 1→N
operations with the determinism fix SURVEY §7.4 demands:

- ``recon_ray.augment.ent_label_sub.v1`` ← recon/augmentation.py:116-158
  (span substitution rewriting text + offsets, recon/augmentation.py:22-76).
  The reference seeds nothing (global np.random, recon/augmentation.py:148)
  — here every doc's RNG is seeded from its ``doc_id``, so augmentation is
  reproducible regardless of batch/partition layout.
- ``recon_ray.augment.kb_expansion.v1`` ← recon/augmentation.py:161-191:
  substitutions drawn from an alias dictionary (the SpanAliasesPreProcessor
  output, recon/preprocess.py:100-131) — pass ``aliases`` (broadcast-small).
- ``recon_ray.split_units.v1`` ← recon/corrections.py:179-233
  (split_sentences): explode a file into top-level units (module preamble +
  one unit per def), re-offsetting mentions into unit-local coordinates.

All three are doc-level EXPLODE ops: output rows ≥ input rows; augmented /
split rows get derived ``doc_id``s (stable_u64 of parent id + index).
"""

from __future__ import annotations

import random
import re
from typing import Optional

import numpy as np
import pyarrow as pa

from recon_ray.hashing import stable_u64
from recon_ray.ops import op
from recon_ray.ops.mentions_io import mentions_list_array, mentions_parts


def _rows_of(batch: pa.Table) -> list[dict]:
    lengths, text, start, end, label, source = mentions_parts(batch)
    cols = {
        c: batch.column(c).to_pylist()
        for c in batch.column_names
        if c != "mentions"
    }
    rows = []
    pos = 0
    for i in range(batch.num_rows):
        n = int(lengths[i])
        rows.append(
            {
                **{c: cols[c][i] for c in cols},
                "mentions": [
                    (text[j], int(start[j]), int(end[j]), label[j], source[j])
                    for j in range(pos, pos + n)
                ],
            }
        )
        pos += n
    return rows


def _table_of(rows: list[dict], schema_cols: list[str]) -> pa.Table:
    lengths = np.array([len(r["mentions"]) for r in rows], dtype=np.int64)
    flat = [m for r in rows for m in r["mentions"]]
    mentions = mentions_list_array(
        lengths,
        np.array([m[0] for m in flat], dtype=object),
        np.array([m[1] for m in flat], dtype=np.int64),
        np.array([m[2] for m in flat], dtype=np.int64),
        np.array([m[3] for m in flat], dtype=object),
        np.array([m[4] for m in flat], dtype=object),
    )
    cols = {}
    for c in schema_cols:
        if c == "mentions":
            continue
        vals = [r[c] for r in rows]
        if c == "doc_id":
            cols[c] = pa.array(np.array(vals, dtype=np.uint64), pa.uint64())
        else:
            cols[c] = pa.array(vals)
    t = pa.table(cols)
    return t.append_column("mentions", mentions)


def _substitute(row: dict, rng: random.Random, label: str,
                choices_for) -> Optional[dict]:
    """substitute_spans port (recon/augmentation.py:22-76): rewrite content
    by splicing replacements at span offsets, shifting subsequent spans."""
    content = row["content"]
    spans = sorted(row["mentions"], key=lambda m: m[1])
    new_parts = []
    new_mentions = []
    cursor = 0
    shift = 0
    changed = False
    for text, start, end, lbl, src in spans:
        if lbl == label:
            opts = choices_for(text)
            if opts:
                repl = rng.choice(opts)
                if repl != text:
                    changed = True
                new_parts.append(content[cursor:start])
                new_parts.append(repl)
                cursor = end
                new_start = start + shift
                new_mentions.append(
                    (repl, new_start, new_start + len(repl), lbl, src)
                )
                shift += len(repl) - (end - start)
                continue
        new_mentions.append((text, start + shift, end + shift, lbl, src))
    new_parts.append(content[cursor:])
    if not changed:
        return None
    return {**row, "content": "".join(new_parts), "mentions": new_mentions}


@op("recon_ray.augment.ent_label_sub.v1", kind="explode")
def ent_label_sub(
    batch: pa.Table,
    label: str = "CALL",
    subs: Optional[list[str]] = None,
    n_augments: int = 1,
) -> pa.Table:
    """Emit each original doc plus up to n_augments substituted copies
    (only when a substitution actually changed something)."""
    subs = subs or []
    rows = _rows_of(batch)
    out = []
    for r in rows:
        out.append(r)
        for k in range(n_augments):
            rng = random.Random(stable_u64("ent_label_sub", r["doc_id"], k))
            aug = _substitute(r, rng, label, lambda _t: subs)
            if aug is not None:
                aug["doc_id"] = stable_u64("aug", r["doc_id"], k)
                out.append(aug)
    return _table_of(out, batch.column_names)


@op("recon_ray.augment.kb_expansion.v1", kind="explode")
def kb_expansion(
    batch: pa.Table,
    label: str = "CALL",
    aliases: Optional[dict] = None,
    n_augments: int = 1,
) -> pa.Table:
    """Alias-dictionary substitution (kb_expansion port): replacements come
    from ``aliases[text]``."""
    aliases = aliases or {}
    rows = _rows_of(batch)
    out = []
    for r in rows:
        out.append(r)
        for k in range(n_augments):
            rng = random.Random(stable_u64("kb_expansion", r["doc_id"], k))
            aug = _substitute(r, rng, label, lambda t: aliases.get(t, []))
            if aug is not None:
                aug["doc_id"] = stable_u64("aug_kb", r["doc_id"], k)
                out.append(aug)
    return _table_of(out, batch.column_names)


_UNIT_BOUNDARY = {
    "python": re.compile(r"^def [^\n]*$", re.M),
    "javascript": re.compile(r"^function [^\n]*$", re.M),
    "go": re.compile(r"^func [^\n]*$", re.M),
}


@op("recon_ray.split_units.v1", kind="explode")
def split_units(batch: pa.Table) -> pa.Table:
    """Split each file at top-level definition boundaries into unit docs
    (preamble = unit 0), re-offsetting mentions relative to each unit
    (split_sentences semantics: spans fully inside a unit move with it;
    our units partition the file, so no span is lost)."""
    rows = _rows_of(batch)
    out = []
    for r in rows:
        content = r["content"]
        pat = _UNIT_BOUNDARY.get(r.get("lang", ""), None)
        bounds = [m.start() for m in pat.finditer(content)] if pat else []
        if not bounds or bounds[0] != 0:
            bounds = [0] + bounds
        bounds.append(len(content))
        for u in range(len(bounds) - 1):
            lo, hi = bounds[u], bounds[u + 1]
            unit_mentions = [
                (t, s - lo, e - lo, l, src)
                for (t, s, e, l, src) in r["mentions"]
                if lo <= s and e <= hi
            ]
            out.append(
                {
                    **r,
                    "doc_id": stable_u64("unit", r["doc_id"], u),
                    "path": f"{r['path']}#u{u}",
                    "content": content[lo:hi],
                    "mentions": unit_mentions,
                }
            )
    return _table_of(out, batch.column_names)
