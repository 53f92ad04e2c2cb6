"""Span-correction batch kernels — vectorized ports of the reference's
per-Example correction/validation operations, operating on the flattened
``mentions`` child arrays of a pyarrow batch.

Semantics parity (asserted in tests against the sequential ports in
recon_ray/reference_extractor.py):

- ``recon_ray.upcase_labels.v1``   ← recon/validation.py:7-19
- ``recon_ray.rename_labels.v1``   ← recon/corrections.py:12-25
- ``recon_ray.strip_annotations.v1`` ← recon/corrections.py:142-176,
  including the elif quirk: per strip-char, a span is either left-stripped
  OR right-stripped in that iteration, never both.
- ``recon_ray.filter_overlaps.v1`` ← recon/validation.py:22-112 (chain-
  greedy longest-wins). Vectorized overlap pre-screen; the sequential
  chain algorithm runs only on flagged docs.
- ``recon_ray.fix_annotations.v1`` ← recon/corrections.py:28-95.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from recon_ray import spec
from recon_ray.ops import op
from recon_ray.ops.mentions_io import (
    doc_index,
    keep_flat,
    mentions_parts,
    replace_mentions,
)


def _remap_strings(values: np.ndarray, mapping: dict[str, str]) -> np.ndarray:
    if len(values) == 0 or not mapping:
        return values
    uniq, inv = np.unique(values.astype(str), return_inverse=True)
    mapped = np.array([mapping.get(u, u) for u in uniq], dtype=object)
    return mapped[inv]


@op("recon_ray.upcase_labels.v1")
def upcase_labels(batch: pa.Table) -> pa.Table:
    lengths, text, start, end, label, source = mentions_parts(batch)
    if len(label):
        label = np.char.upper(label.astype(str)).astype(object)
    return replace_mentions(batch, lengths, text, start, end, label, source)


@op("recon_ray.rename_labels.v1")
def rename_labels(batch: pa.Table, label_map: Optional[dict] = None) -> pa.Table:
    label_map = label_map or spec.RENAME_MAP
    lengths, text, start, end, label, source = mentions_parts(batch)
    label = _remap_strings(label, label_map)
    return replace_mentions(batch, lengths, text, start, end, label, source)


@op("recon_ray.strip_annotations.v1")
def strip_annotations(batch: pa.Table, strip_chars: Optional[list] = None) -> pa.Table:
    strip_chars = strip_chars if strip_chars is not None else spec.STRIP_CHARS
    strip_set = "".join(strip_chars)
    lengths, text, start, end, label, source = mentions_parts(batch)
    if len(text) == 0:
        return batch
    s = pd.Series(text, dtype=object).astype(str)
    start = start.copy()
    end = end.copy()
    for ch in strip_chars:
        nonempty = s.str.len() > 0
        starts = nonempty & s.str.startswith(ch)
        if starts.any():
            lstripped = s[starts].str.lstrip(strip_set)
            delta = s[starts].str.len() - lstripped.str.len()
            start[starts.to_numpy()] += delta.to_numpy()
            s[starts] = lstripped
        ends = nonempty & ~starts & s.str.endswith(ch)
        if ends.any():
            rstripped = s[ends].str.rstrip(strip_set)
            delta = s[ends].str.len() - rstripped.str.len()
            end[ends.to_numpy()] -= delta.to_numpy()
            s[ends] = rstripped
    text = s.to_numpy(dtype=object)
    # reference would IndexError on an all-strip-chars span; we drop it
    keep = np.array([len(t) > 0 for t in text])
    if not keep.all():
        lengths, (text, start, end, label, source) = keep_flat(
            keep, lengths, text, start, end, label, source
        )
    return replace_mentions(batch, lengths, text, start, end, label, source)


def _chain_greedy_keep(starts: np.ndarray, ends: np.ndarray) -> list[int]:
    """Indices (into the sorted-by-start slice) kept by the reference's
    chain-greedy longest-wins (recon/validation.py:39-112)."""
    kept: list[int] = []
    chain: list[int] = []
    chain_start = chain_end = 0
    n = len(starts)

    def flush(chain_idx: list[int]) -> None:
        order = sorted(chain_idx, key=lambda i: ends[i] - starts[i], reverse=True)
        selected: list[int] = []
        for i in order:
            clash = False
            for j in selected:
                if min(ends[i], ends[j]) - max(starts[i], starts[j]) > 0:
                    clash = True
                    break
            if not clash:
                selected.append(i)
        kept.extend(selected)

    for i in range(n):
        if not chain:
            chain = [i]
            chain_start, chain_end = starts[i], ends[i]
        elif min(ends[i], chain_end) - max(starts[i], chain_start) > 0:
            chain.append(i)
            chain_start = min(starts[i], chain_start)
            chain_end = max(ends[i], chain_end)
        else:
            flush(chain)
            chain = [i]
            chain_start, chain_end = starts[i], ends[i]
    if chain:
        flush(chain)
    return sorted(kept)


@op("recon_ray.filter_overlaps.v1")
def filter_overlaps(batch: pa.Table) -> pa.Table:
    lengths, text, start, end, label, source = mentions_parts(batch)
    if len(start) == 0:
        return batch
    didx = doc_index(lengths)
    # stable sort by start within doc (reference sorts by start,
    # recon/validation.py:33)
    order = np.lexsort((np.arange(len(start)), start, didx))
    text, start, end, label, source = (
        text[order], start[order], end[order], label[order], source[order]
    )
    # vectorized overlap pre-screen: within a doc, overlap exists iff some
    # start[i+1] < running-max(end[:i+1])
    df = pd.DataFrame({"d": didx, "s": start, "e": end})
    cummax_e = df.groupby("d", sort=False)["e"].cummax().to_numpy()
    nxt_same_doc = np.zeros(len(start), dtype=bool)
    if len(start) > 1:
        nxt_same_doc[:-1] = didx[1:] == didx[:-1]
    overlap_here = np.zeros(len(start), dtype=bool)
    if len(start) > 1:
        overlap_here[:-1] = nxt_same_doc[:-1] & (start[1:] < cummax_e[:-1])
    flagged_docs = np.unique(didx[overlap_here])
    if len(flagged_docs) == 0:
        return replace_mentions(batch, lengths, text, start, end, label, source)

    keep = np.ones(len(start), dtype=bool)
    boundaries = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=boundaries[1:])
    for d in flagged_docs:
        lo, hi = boundaries[d], boundaries[d + 1]
        local_keep = _chain_greedy_keep(start[lo:hi], end[lo:hi])
        mask = np.zeros(hi - lo, dtype=bool)
        mask[local_keep] = True
        keep[lo:hi] = mask
    lengths, (text, start, end, label, source) = keep_flat(
        keep, lengths, text, start, end, label, source
    )
    return replace_mentions(batch, lengths, text, start, end, label, source)


@op("recon_ray.fix_annotations.v1")
def fix_annotations(
    batch: pa.Table,
    corrections: Optional[list] = None,
    case_sensitive: bool = False,
) -> pa.Table:
    """corrections: list of (annotation, from_labels, to_label|None)."""
    corrections = corrections if corrections is not None else spec.CORRECTIONS
    lengths, text, start, end, label, source = mentions_parts(batch)
    if len(text) == 0 or not corrections:
        return batch
    cmap: dict[str, tuple[list, Optional[str]]] = {}
    for annotation, from_labels, to_label in corrections:
        key = annotation if case_sensitive else annotation.lower()
        cmap[key] = (list(from_labels), to_label)
    keys = text.astype(str) if case_sensitive else np.char.lower(text.astype(str))
    hit = np.isin(keys, np.array(list(cmap.keys()), dtype=str))
    keep = np.ones(len(text), dtype=bool)
    label = label.copy()
    for i in np.nonzero(hit)[0]:
        from_labels, to_label = cmap[keys[i]]
        applies = label[i] in from_labels or "ANY" in from_labels
        if not applies:
            continue
        if to_label is None:
            keep[i] = False
        else:
            label[i] = to_label
    if not keep.all():
        lengths, (text, start, end, label, source) = keep_flat(
            keep, lengths, text, start, end, label, source
        )
    return replace_mentions(batch, lengths, text, start, end, label, source)


#: the frozen correction chain, in spec order
CORRECTION_CHAIN = [
    "recon_ray.upcase_labels.v1",
    "recon_ray.rename_labels.v1",
    "recon_ray.strip_annotations.v1",
    "recon_ray.filter_overlaps.v1",
    "recon_ray.fix_annotations.v1",
]
