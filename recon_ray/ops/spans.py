"""Span-correction batch kernels — Arrow-native ports of the reference's
per-Example correction/validation operations, operating directly on the
``mentions`` ListArray's child arrays with pyarrow.compute kernels (no
to_pylist round-trips, no per-row Python in the common paths).

Semantics parity (asserted in tests against the sequential ports in
recon_ray/reference_extractor.py):

- ``recon_ray.upcase_labels.v1``     ← recon/validation.py:7-19
- ``recon_ray.rename_labels.v1``     ← recon/corrections.py:12-25
- ``recon_ray.strip_annotations.v1`` ← recon/corrections.py:142-176,
  including the elif quirk: per strip-char, a span is either left-stripped
  OR right-stripped in that iteration, never both.
- ``recon_ray.filter_overlaps.v1``   ← recon/validation.py:22-112 (chain-
  greedy longest-wins). Chains are segmented VECTORIZED (running-max of
  span ends per doc); the sequential greedy runs only inside multi-span
  chains, which are tiny (typically the DEF-span/CALL-span pair at a
  definition site) even when a document has tens of thousands of spans.
- ``recon_ray.fix_annotations.v1``   ← recon/corrections.py:28-95 —
  fully vectorized per correction entry (the corrections list is small;
  the mention table is not).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from recon_ray import spec
from recon_ray.ops import op


def _parts(batch: pa.Table, col: str = "mentions"):
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lengths = arr.value_lengths().fill_null(0).to_numpy(zero_copy_only=False)
    child = arr.flatten()
    return lengths.astype(np.int64), child


def _rebuild(batch: pa.Table, lengths: np.ndarray, child: pa.StructArray,
             col: str = "mentions") -> pa.Table:
    offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    new = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), child)
    idx = batch.column_names.index(col)
    return batch.set_column(idx, col, new)


def _struct(text, start, end, label, source) -> pa.StructArray:
    return pa.StructArray.from_arrays(
        [text, start.cast(pa.int32()), end.cast(pa.int32()), label, source],
        names=["text", "start", "end", "label", "source"],
    )


def _fields(child: pa.StructArray):
    return (child.field("text"), child.field("start"), child.field("end"),
            child.field("label"), child.field("source"))


def _filter_child(child: pa.StructArray, keep: np.ndarray,
                  lengths: np.ndarray) -> tuple[np.ndarray, pa.StructArray]:
    didx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    new_lengths = np.bincount(didx[keep], minlength=len(lengths)).astype(np.int64)
    mask = pa.array(keep)
    text, start, end, label, source = _fields(child)
    return new_lengths, _struct(
        text.filter(mask), start.filter(mask), end.filter(mask),
        label.filter(mask), source.filter(mask),
    )


@op("recon_ray.upcase_labels.v1")
def upcase_labels(batch: pa.Table) -> pa.Table:
    lengths, child = _parts(batch)
    text, start, end, label, source = _fields(child)
    return _rebuild(batch, lengths,
                    _struct(text, start, end, pc.utf8_upper(label), source))


@op("recon_ray.rename_labels.v1")
def rename_labels(batch: pa.Table, label_map: Optional[dict] = None) -> pa.Table:
    label_map = label_map or spec.RENAME_MAP
    lengths, child = _parts(batch)
    text, start, end, label, source = _fields(child)
    if len(label) and label_map:
        uniq = pc.unique(label)
        mapped = pa.array(
            [label_map.get(u, u) for u in uniq.to_pylist()], pa.string()
        )
        label = pc.take(mapped, pc.index_in(label, uniq))
    return _rebuild(batch, lengths, _struct(text, start, end, label, source))


@op("recon_ray.strip_annotations.v1")
def strip_annotations(batch: pa.Table, strip_chars: Optional[list] = None) -> pa.Table:
    strip_chars = strip_chars if strip_chars is not None else spec.STRIP_CHARS
    strip_set = "".join(strip_chars)
    lengths, child = _parts(batch)
    if len(child) == 0:
        return batch
    text, start, end, label, source = _fields(child)
    start = start.cast(pa.int64())
    end = end.cast(pa.int64())
    # Closed form of the reference's per-char loop (recon/corrections.py
    # elif quirk): each span lstrips at most once (at the iteration of its
    # ORIGINAL first char, position L in strip_chars) and rstrips at most
    # once (original last char, position R) — the elif means R == L never
    # rstrips, and whichever of L/R is smaller fires first (the deltas of
    # the second operation are computed on the first's output, which only
    # matters when the span is entirely strip chars and the first trim
    # consumed everything). Equivalence with the iterative form is pinned
    # by the reference-table + hypothesis parity tests.
    cs = pa.array(list(strip_chars))
    first = pc.utf8_slice_codeunits(text, 0, 1)
    last = pc.utf8_slice_codeunits(text, -1, None)
    L = pc.fill_null(pc.index_in(first, value_set=cs), -1)
    R = pc.fill_null(pc.index_in(last, value_set=cs), -1)
    has_l = pc.greater_equal(L, 0)
    has_r = pc.greater_equal(R, 0)
    do_r = pc.and_(has_r, pc.or_(pc.invert(has_l), pc.not_equal(L, R)))
    both = pc.and_(has_l, do_r)
    l_first = pc.less(L, R)

    i64 = pa.int64()
    ln = pc.utf8_length(text).cast(i64)
    lt = pc.utf8_ltrim(text, strip_set)
    ln_lt = pc.utf8_length(lt).cast(i64)
    rt = pc.utf8_rtrim(text, strip_set)
    ln_rt = pc.utf8_length(rt).cast(i64)
    tr = pc.utf8_trim(text, strip_set)
    ln_tr = pc.utf8_length(tr).cast(i64)
    zero = pa.scalar(0, i64)
    ldelta = pc.if_else(
        has_l,
        pc.if_else(
            pc.and_(both, pc.invert(l_first)),
            pc.subtract(ln_rt, ln_tr),  # lstrip ran second, on the rstripped
            pc.subtract(ln, ln_lt),
        ),
        zero,
    )
    rdelta = pc.if_else(
        do_r,
        pc.if_else(
            pc.and_(both, l_first),
            pc.subtract(ln_lt, ln_tr),  # rstrip ran second, on the lstripped
            pc.subtract(ln, ln_rt),
        ),
        zero,
    )
    text = pc.if_else(both, tr, pc.if_else(has_l, lt, pc.if_else(do_r, rt, text)))
    start = pc.add(start, ldelta)
    end = pc.subtract(end, rdelta)
    keep = pc.greater(pc.utf8_length(text), 0).to_numpy(zero_copy_only=False)
    child = _struct(text, start, end, label, source)
    if not keep.all():
        lengths, child = _filter_child(child, keep, lengths)
    return _rebuild(batch, lengths, child)


def _chain_greedy_keep(starts: np.ndarray, ends: np.ndarray) -> list[int]:
    """Greedy longest-wins inside ONE overlap chain (already sorted by
    start): recon/validation.py:39-65."""
    order = sorted(range(len(starts)), key=lambda i: ends[i] - starts[i],
                   reverse=True)
    selected: list[int] = []
    for i in order:
        clash = False
        for j in selected:
            if min(ends[i], ends[j]) - max(starts[i], starts[j]) > 0:
                clash = True
                break
        if not clash:
            selected.append(i)
    return selected


@op("recon_ray.filter_overlaps.v1")
def filter_overlaps(batch: pa.Table) -> pa.Table:
    lengths, child = _parts(batch)
    n = len(child)
    if n == 0:
        return batch
    text, start_a, end_a, label, source = _fields(child)
    start = start_a.to_numpy(zero_copy_only=False).astype(np.int64)
    end = end_a.to_numpy(zero_copy_only=False).astype(np.int64)
    didx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    # stable sort by start within doc (reference sorts by start,
    # recon/validation.py:33)
    order = np.lexsort((np.arange(n), start, didx))
    if not np.array_equal(order, np.arange(n)):
        take = pa.array(order)
        child = _struct(
            text.take(take), start_a.take(take), end_a.take(take),
            label.take(take), source.take(take),
        )
        start, end, didx = start[order], end[order], didx[order]
    # vectorized chain segmentation: within a doc, a new chain starts where
    # start[i] >= running-max(end) of the previous spans (strict-overlap
    # rule min(end)-max(start) > 0, recon/validation.py:88-92). The per-doc
    # running max is one global np.maximum.accumulate on end + K·didx
    # (K > every end, so a later doc's offset dominates any earlier doc's
    # value and the max effectively resets at each doc boundary).
    K = int(end.max()) + 1 if n else 1
    cummax_end = np.maximum.accumulate(end + K * didx) - K * didx
    new_chain = np.ones(n, dtype=bool)
    if n > 1:
        same_doc = didx[1:] == didx[:-1]
        new_chain[1:] = ~(same_doc & (start[1:] < cummax_end[:-1]))
    chain_id = np.cumsum(new_chain) - 1
    sizes = np.bincount(chain_id)
    if (sizes <= 1).all():
        return _rebuild(batch, lengths, child)
    keep = np.ones(n, dtype=bool)
    starts_of_chain = np.nonzero(new_chain)[0]
    # size-2 chains — in practice nearly all of them (the DEF/CALL pair at
    # a definition site) — resolve in closed form: greedy longest-first
    # keeps only the longer span (tie → the earlier, sorted()'s stability)
    # IF the two strictly overlap, else both survive. Only ≥3 chains run
    # the sequential reference greedy.
    lo2 = starts_of_chain[sizes == 2]
    if len(lo2):
        len0 = end[lo2] - start[lo2]
        len1 = end[lo2 + 1] - start[lo2 + 1]
        ov = np.minimum(end[lo2], end[lo2 + 1]) - np.maximum(
            start[lo2], start[lo2 + 1]
        )
        drop = np.where(len1 > len0, lo2, lo2 + 1)[ov > 0]
        keep[drop] = False
    for c in np.nonzero(sizes > 2)[0]:
        lo = starts_of_chain[c]
        hi = lo + sizes[c]
        local = _chain_greedy_keep(start[lo:hi], end[lo:hi])
        mask = np.zeros(hi - lo, dtype=bool)
        mask[local] = True
        keep[lo:hi] = mask
    new_lengths, child = _filter_child(child, keep, lengths)
    return _rebuild(batch, new_lengths, child)


def corrections_from_dict(corrections_dict: dict) -> list:
    """The reference's dict shorthand (recon/corrections.py:98-139):
    ``{"text": "LABEL"}`` converts from ANY label, ``{"text": None}``
    deletes from ANY label, ``{"text": ("FROM", "TO")}`` /
    ``{"text": (["A", "B"], "TO")}`` restrict the source labels —
    normalized to the engine's (annotation, from_labels, to_label)
    tuple form."""
    corrections = []
    for key, val in corrections_dict.items():
        if isinstance(val, str) or val is None:
            from_labels: list = ["ANY"]
            to_label = val
        elif isinstance(val, tuple):
            from_labels = [val[0]] if isinstance(val[0], str) \
                else list(val[0])
            to_label = val[1]
        else:
            raise ValueError(
                "Cannot parse corrections dict. Value must be either a "
                "str of the label to change the annotation to (TO_LABEL)"
                " or a tuple of (FROM_LABEL, TO_LABEL)"
            )
        corrections.append((key, from_labels, to_label))
    return corrections


def _fix_compute(child: pa.StructArray, corrections: list,
                 case_sensitive: bool):
    """Shared match kernel for apply and dryrun: returns
    (relabel mask, gathered new labels, drop mask, midx, cmap).

    reference puts corrections in a dict keyed by annotation — a later
    entry with the same text wins (recon/corrections.py:58); matching
    always tests the ORIGINAL span label (single dict lookup per span).
    Single-pass form: ONE index_in against the annotation dictionary
    replaces an equal+is_in+if_else sweep per entry (22 entries in the
    spec); the from_labels test is an is_in over packed
    (entry, label) pair codes."""
    text, _s, _e, label, _src = _fields(child)
    keys = text if case_sensitive else pc.utf8_lower(text)
    cmap: dict[str, tuple[list, Optional[str]]] = {}
    for annotation, from_labels, to_label in corrections:
        akey = annotation if case_sensitive else annotation.lower()
        cmap[akey] = (list(from_labels), to_label)
    annots = list(cmap.keys())
    lab_universe = sorted(
        {lbl for fl, _ in cmap.values() for lbl in fl if lbl != "ANY"}
    )
    nlab = len(lab_universe) + 1  # slot 0 = "label not referenced"
    any_entries, del_entries, pair_codes, to_labels = [], [], [], []
    for ei, (fl, tl) in enumerate(cmap.values()):
        if "ANY" in fl:
            any_entries.append(ei)
        else:
            for lbl in fl:
                pair_codes.append(
                    ei * nlab + lab_universe.index(lbl) + 1
                )
        if tl is None:
            del_entries.append(ei)
        to_labels.append(tl)

    midx = pc.fill_null(
        pc.index_in(keys, value_set=pa.array(annots)), -1
    ).cast(pa.int64())
    lidx = pc.fill_null(
        pc.index_in(label, value_set=pa.array(lab_universe, pa.string())), -1
    ).cast(pa.int64())
    pair = pc.add(
        pc.multiply(midx, pa.scalar(nlab, pa.int64())),
        pc.add(lidx, pa.scalar(1, pa.int64())),
    )
    cond = pc.and_(
        pc.greater_equal(midx, 0),
        pc.or_(
            pc.is_in(pair, value_set=pa.array(pair_codes, pa.int64())),
            pc.is_in(midx, value_set=pa.array(any_entries, pa.int64()))
            if any_entries
            else pa.scalar(False),
        ),
    )
    # relabel: gather each entry's to_label (null → keep original)
    to_arr = pa.array(to_labels, pa.string())
    gathered = pc.take(to_arr, pc.if_else(cond, midx, pa.scalar(0, pa.int64())))
    relabel = pc.and_(cond, pc.is_valid(gathered))
    if del_entries:
        drop = pc.and_(
            cond, pc.is_in(midx, value_set=pa.array(del_entries, pa.int64()))
        )
    else:
        drop = pa.array(np.zeros(len(child), dtype=bool))
    return relabel, gathered, drop, midx, cmap


@op("recon_ray.fix_annotations.v1")
def fix_annotations(
    batch: pa.Table,
    corrections=None,
    case_sensitive: bool = False,
    dryrun: bool = False,
) -> pa.Table:
    """corrections: list of (annotation, from_labels, to_label|None)
    tuples, or the reference's dict shorthand (auto-converted via
    :func:`corrections_from_dict`) — vectorized per correction entry
    over the whole batch. ``dryrun=True`` returns the batch UNCHANGED
    (the reference's dryrun contract, recon/corrections.py:70-90); use
    :func:`fix_annotations_dryrun` for the would-be-change report the
    reference prints."""
    corrections = corrections if corrections is not None else spec.CORRECTIONS
    if isinstance(corrections, dict):
        corrections = corrections_from_dict(corrections)
    if dryrun:
        return batch
    lengths, child = _parts(batch)
    if len(child) == 0 or not corrections:
        return batch
    relabel, gathered, drop, _midx, _cmap = _fix_compute(
        child, corrections, case_sensitive)
    text, start, end, label, source = _fields(child)
    label = pc.if_else(relabel, gathered, label)
    keep = pc.invert(drop).to_numpy(zero_copy_only=False)
    child = _struct(text, start, end, label, source)
    if not keep.all():
        lengths, child = _filter_child(child, keep, lengths)
    return _rebuild(batch, lengths, child)


def fix_annotations_dryrun(
    batch: pa.Table,
    corrections=None,
    case_sensitive: bool = False,
) -> pa.Table:
    """Would-be changes of :func:`fix_annotations` without mutating —
    the engine analogue of the reference's dryrun printout
    (recon/corrections.py:70-90, 'Deleting span: ...' / 'Correction
    span: ...'): one row per affected span with (doc_index, action,
    text, from_label, to_label, message)."""
    corrections = corrections if corrections is not None else spec.CORRECTIONS
    if isinstance(corrections, dict):
        corrections = corrections_from_dict(corrections)
    lengths, child = _parts(batch)
    empty = pa.table({
        "doc_index": pa.array([], pa.int64()),
        "action": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
        "from_label": pa.array([], pa.string()),
        "to_label": pa.array([], pa.string()),
        "message": pa.array([], pa.string()),
    })
    if len(child) == 0 or not corrections:
        return empty
    relabel, gathered, drop, midx, cmap = _fix_compute(
        child, corrections, case_sensitive)
    text, _s, _e, label, _src = _fields(child)
    didx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    drop_np = np.asarray(drop.to_numpy(zero_copy_only=False), dtype=bool)
    rel_np = np.asarray(relabel.to_numpy(zero_copy_only=False), dtype=bool)
    affected = drop_np | rel_np
    if not affected.any():
        return empty
    mask = pa.array(affected)
    txt = text.filter(mask)
    frm = label.filter(mask)
    new = gathered.filter(mask)
    is_del = drop_np[affected]
    mi = midx.filter(mask).to_pylist()
    entries = list(cmap.items())
    from_lists = [entries[i][1][0] for i in mi]
    msgs = []
    for t, fl, tl, d in zip(txt.to_pylist(), from_lists,
                            new.to_pylist(), is_del):
        if d:
            msgs.append(f"Deleting span: {t}")
        else:
            msgs.append(
                f"Correction span: {t} from labels: {fl} to"
                f" label: {tl}"
            )
    return pa.table({
        "doc_index": pa.array(didx[affected], pa.int64()),
        "action": pa.array(
            ["delete" if d else "relabel" for d in is_del], pa.string()),
        "text": txt,
        "from_label": frm,
        "to_label": new,
        "message": pa.array(msgs, pa.string()),
    })


#: the frozen correction chain, in spec order
CORRECTION_CHAIN = [
    "recon_ray.upcase_labels.v1",
    "recon_ray.rename_labels.v1",
    "recon_ray.strip_annotations.v1",
    "recon_ray.filter_overlaps.v1",
    "recon_ray.fix_annotations.v1",
]
