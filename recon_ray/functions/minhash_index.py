"""Incremental near-dup index — MinHash-LSH dedup AT INGEST.

The batch pipeline (``functions/dedup.py:minhash_lsh_dedup``) dedups one
corpus against itself. At 100 TB the corpus arrives in shards over weeks,
and re-running the full pairwise pass per shard is quadratic in history —
the standard production shape is an INDEX of everything accepted so far,
with each new shard deduped against the index and only its NOVEL docs
appended (the near-dup counterpart of ``pipelines/curate.py``'s
exact-hash ``curate_incremental``).

State layout (one directory, manifest-LAST crash safety like
``sources/zonemap.py``):

- ``bands/part-<sha>.parquet``   — (doc_id, band, bhash) of accepted docs
- ``shingles/part-<sha>.parquet``— (doc_id, sh_bin) packed uint64 shingle
  sets (binary cells: Acero-joinable, zero-copy to numpy)
- ``_manifest.json``             — params + accepted ``batch_ids``
  (idempotence: re-ingesting a recorded batch is a no-op)

Scale shape per ingest: the new shard's signatures/bands are one map
pass; new-vs-index candidates come from ONE hash-bucket join of the new
bands against the stored band parquet (band rows, never text, shuffle);
verification is the shared shuffle-join exact-Jaccard path
(``_verify_pairs_shuffle``) over packed shingle cells fetched by
semi-join — index shingles are read COLUMN-PRUNED for candidates only.
Nothing index-sized ever lands on the driver; the only driver state is
the shard-sized novel/duplicate id sets. Requires globally-unique
``doc_id`` across all ingested shards (the caller's contract, asserted
against the manifest count).

Equality contract (pinned in tests/test_minhash_index.py): ingesting
shards A then B accepts exactly the docs that survive keep-first
(min-id) batch dedup over A∪B when ids are assigned in ingest order.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from recon_ray.functions.dedup import (
    _N_PERM,
    _verify_pairs_shuffle,
    connected_components,
    lsh_candidate_pairs,
    make_minhash_batch,
    make_shingle_batch,
)

MANIFEST = "_manifest.json"


def _as_arrow(ds):
    """Normalize block type before a union: mixing pandas and arrow
    blocks in one Dataset trips Ray's batcher block-type assertion."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def _mpath(state_dir: str) -> str:
    return os.path.join(state_dir, MANIFEST)


def minhash_index_init(state_dir: str, n_perm: int = _N_PERM,
                       n_bands: int = 16, k: int = 3,
                       threshold: float = 0.8) -> dict:
    """Create an empty index (idempotent: returns the existing manifest
    if one is already published; parameter mismatch raises)."""
    os.makedirs(os.path.join(state_dir, "bands"), exist_ok=True)
    os.makedirs(os.path.join(state_dir, "shingles"), exist_ok=True)
    if os.path.exists(_mpath(state_dir)):
        man = json.load(open(_mpath(state_dir)))
        want = {"n_perm": n_perm, "n_bands": n_bands, "k": k,
                "threshold": threshold}
        have = {kk: man[kk] for kk in want}
        if have != want:
            raise ValueError(
                f"index at {state_dir} has params {have}, asked {want}")
        return man
    man = {"n_perm": n_perm, "n_bands": n_bands, "k": k,
           "threshold": threshold, "n_docs": 0, "batch_ids": [],
           "band_parts": [], "shingle_parts": []}
    _publish(state_dir, man)
    return man


def _publish(state_dir: str, man: dict) -> None:
    tmp = _mpath(state_dir) + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, _mpath(state_dir))  # manifest LAST, atomic


def _write_part(sub_dir: str, table: pa.Table) -> str:
    """Content-addressed part write (idempotent under task retry)."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    h = hashlib.sha1(sink.getvalue().to_pybytes()).hexdigest()[:16]
    name = f"part-{h}.parquet"
    path = os.path.join(sub_dir, name)
    if not os.path.exists(path):
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    return name


def _read_parts(state_dir: str, sub: str, parts: list,
                columns: "list | None" = None):
    paths = [os.path.join(state_dir, sub, p) for p in parts]
    if not paths:
        return None
    return rd.read_parquet(paths, columns=columns)


def _bands_of(docs_ds, man: dict):
    sigs = docs_ds.map_batches(
        make_minhash_batch(man["n_perm"], man["k"]),
        batch_format="pyarrow", zero_copy_batch=True)
    # reuse lsh_candidate_pairs' banding kernel via a tiny local copy of
    # its closure is not possible — band directly here with the SAME
    # weights so stored and fresh bhashes are comparable
    from recon_ray.functions.dedup import _band_weights

    n_bands = man["n_bands"]
    rows_per_band = man["n_perm"] // n_bands
    W, B = _band_weights(n_bands, rows_per_band)

    def bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "band": pa.array([], pa.int32()),
                "bhash": pa.array([], pa.uint64()),
            })
        s = np.asarray(batch.column("sig").to_pylist(), dtype=np.uint64)
        chunks = s.reshape(n, n_bands, rows_per_band)
        bh = (chunks * W[None, :, :]).sum(axis=2, dtype=np.uint64) \
            + B[None, :]
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
            "band": pa.array(
                np.tile(np.arange(n_bands, dtype=np.int32), n),
                pa.int32()),
            "bhash": pa.array(bh.reshape(-1), pa.uint64()),
        })

    return sigs.map_batches(bands, batch_format="pyarrow",
                            zero_copy_batch=True)


def _pack_shingles(docs_ds, k: int):
    sh = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        make_shingle_batch(k), batch_format="pyarrow",
        zero_copy_batch=True)

    def pack(t: pa.Table) -> pa.Table:
        col = t.column("shingles")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        packed = [np.asarray(s, dtype=np.uint64).tobytes()
                  for s in col.to_pylist()]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "sh_bin": pa.array(packed, pa.large_binary()),
        })

    return sh.map_batches(pack, batch_format="pyarrow")


def id_set_filter(ds, ids, col: str = "doc_id", keep: bool = True):
    """Arrow-kernel id-set filter: the id set ships ONCE as an Arrow
    array via ``ray.put``; each batch runs ``pc.is_in`` zero-copy —
    no pandas roundtrip. ``keep=False`` inverts (drop the ids)."""
    import ray as _ray

    if not ids:
        if not keep:
            return ds
        return ds.map_batches(lambda t: t.slice(0, 0),
                              batch_format="pyarrow")
    vs = _ray.put(pa.array(sorted(ids)))

    def f(t: pa.Table, vs=vs, col=col, keep=keep) -> pa.Table:
        m = pc.is_in(t.column(col),
                     value_set=_ray.get(vs) if isinstance(
                         vs, _ray.ObjectRef) else vs)
        # null ids yield a null mask entry; fill with False so the
        # drop path (keep=False) RETAINS null-id rows (isin semantics)
        # rather than silently filtering them out.
        m = pc.fill_null(m, False)
        return t.filter(m if keep else pc.invert(m))

    return ds.map_batches(f, batch_format="pyarrow",
                          zero_copy_batch=True)


def cluster_keep_dups(cc: pd.DataFrame, new_ids: set) -> set:
    """Vectorized cluster keep-rule shared by both incremental indexes:
    the keeper of each connected component is an INDEX doc when the
    cluster touches one, else the minimum new id (keep-first). Returns
    the set of new-doc ids that lost (the shard's duplicates).

    Equivalent to the per-row rule but as one sort + grouped-first —
    no Python loop over the (dup-cluster-sized) component frame."""
    if not len(cc):
        return set()
    is_new = cc["doc_id"].isin(new_ids)
    order = cc.assign(__old=~is_new).sort_values(
        ["cluster", "__old", "doc_id"], ascending=[True, False, True])
    keepers = order.groupby("cluster", sort=False)["doc_id"].first()
    keep_of = cc["cluster"].map(keepers)
    return {int(x)
            for x in cc.loc[is_new & (cc["doc_id"] != keep_of),
                            "doc_id"]}


def _cross_candidates(new_bands, old_bands):
    """(old_id → 'a', new_id → 'b') distinct candidate pairs from one
    hash-bucket join on (band, bhash) — both sides are narrow band rows."""
    from recon_ray.functions.relational import (
        bucketed_group_apply,
        distinct,
    )

    def _tag(v: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column("__new", pa.array(
                np.full(t.num_rows, v, dtype=np.int8)))
        return f

    tag_new = new_bands.map_batches(_tag(1), batch_format="pyarrow",
                                    zero_copy_batch=True)
    tag_old = old_bands.map_batches(_tag(0), batch_format="pyarrow",
                                    zero_copy_batch=True)

    def bucket_cross(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["band", "bhash", "doc_id", "__new"])
        o = d[d["__new"] == 0]
        n = d[d["__new"] == 1]
        if len(o) == 0 or len(n) == 0:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        m = o.merge(n, on=["band", "bhash"])
        return (m[["doc_id_x", "doc_id_y"]]
                .drop_duplicates()
                .rename(columns={"doc_id_x": "a", "doc_id_y": "b"}))

    pairs = bucketed_group_apply(
        tag_old.union(tag_new), ["band", "bhash"], bucket_cross)
    return distinct(pairs, ["a", "b"])


def minhash_index_ingest(state_dir: str, docs_ds,
                         batch_id: str,
                         candidate_broadcast_limit: int = 1_000_000,
                         pairs_as_dataset: bool = False) -> dict:
    """Dedup ``docs_ds`` (doc_id, text) against the index AND within
    itself; append the novel docs' bands+shingles; returns
    {"n_new", "n_novel", "n_dup", "novel_ids": DataFrame,
    "dup_pairs": DataFrame(a, b, jaccard) — the verified near-dup edge
    list}. Keep rule per verified cluster: an INDEX doc if the cluster
    touches one, else the minimum batch doc_id (keep-first).
    Re-ingesting a recorded ``batch_id`` is a NO-OP returning the
    recorded counts.

    ``pairs_as_dataset=True`` returns ``dup_pairs`` as the verified
    ray.data.Dataset instead of collecting it to the driver — the
    escape hatch for a shard whose near-dup edge list is pair-scaled
    (edges grow quadratically inside a dup cluster). Clustering and
    the keep-rule consume the edge DATASET either way; only the
    return-value collection is gated."""
    man = json.load(open(_mpath(state_dir)))
    done = {b["id"]: b for b in man["batch_ids"]}
    if batch_id in done:
        rec = done[batch_id]
        return {"n_new": rec["n_new"], "n_novel": rec["n_novel"],
                "n_dup": rec["n_dup"],
                "n_preexisting": rec.get("n_preexisting", 0),
                "novel_ids": pd.DataFrame(columns=["doc_id"]),
                "dup_pairs": (
                    rd.from_arrow(pa.table({
                        "a": pa.array([], pa.int64()),
                        "b": pa.array([], pa.int64()),
                        "jaccard": pa.array([], pa.float64())}))
                    if pairs_as_dataset
                    else pd.DataFrame(columns=["a", "b", "jaccard"])),
                "replayed": True}
    docs_ds = docs_ds.materialize()
    # id-collision guard: a doc_id already in the index is the same
    # logical doc arriving again (unique-id contract) — drop it up
    # front rather than silently re-storing it as novel. Ids-only
    # column-pruned scan; the intersection is shard-bounded.
    n_pre = 0
    if man["shingle_parts"]:
        incoming = set(
            docs_ds.select_columns(["doc_id"]).to_pandas()["doc_id"])
        stored_ids = rd.read_parquet(
            [os.path.join(state_dir, "shingles", p)
             for p in man["shingle_parts"]],
            columns=["doc_id"])
        pre = id_set_filter(stored_ids, incoming).to_pandas()
        pre_ids = (set(pre["doc_id"])
                   if "doc_id" in pre.columns else set())
        if pre_ids:
            n_pre = len(pre_ids)
            docs_ds = id_set_filter(
                docs_ds, pre_ids, keep=False).materialize()
    n_new = docs_ds.count()
    threshold = man["threshold"]

    new_bands = _bands_of(docs_ds, man).materialize()
    new_sh = _pack_shingles(docs_ds, man["k"]).materialize()

    # candidates: within-batch + batch-vs-index
    sigs = docs_ds.map_batches(
        make_minhash_batch(man["n_perm"], man["k"]),
        batch_format="pyarrow", zero_copy_batch=True)
    within = lsh_candidate_pairs(
        sigs, n_bands=man["n_bands"], n_perm=man["n_perm"])
    old_bands = _read_parts(state_dir, "bands", man["band_parts"])
    cand = _as_arrow(within)
    if old_bands is not None:
        cand = cand.union(
            _as_arrow(_cross_candidates(new_bands, old_bands)))
    cand = cand.materialize()

    n_pairs = cand.count()
    if n_pairs:
        # shingle sets for BOTH endpoints: new shard fully, index side
        # pruned to the candidate old ids (semi-join by broadcast set —
        # candidate-old is shard-bounded, ≤ pairs)
        sh_all = new_sh
        old_sh = _read_parts(
            state_dir, "shingles", man["shingle_parts"])
        from recon_ray.functions.relational import semi_join

        if old_sh is not None:
            old_ids = set(
                cand.map_batches(
                    lambda t: t.select(["a"]).rename_columns(["i"]),
                    batch_format="pyarrow", zero_copy_batch=True,
                ).to_pandas()["i"]
            )
            sh_all = _as_arrow(sh_all).union(
                _as_arrow(semi_join(old_sh, old_ids, on="doc_id")))
        if n_pairs <= candidate_broadcast_limit:
            # broadcast verify (the minhash_lsh_dedup small-side path):
            # the candidate endpoints' packed shingle cells collect to a
            # pairs-bounded driver dict, shipped once via ray.put — two
            # full shuffle-joins are pure fixed cost at this size
            import ray as _ray

            from recon_ray.functions.dedup import _verify_pairs_fn

            ends = cand.map_batches(
                lambda t: pa.table({"i": pa.concat_arrays([
                    t.column("a").combine_chunks(),
                    t.column("b").combine_chunks()])}),
                batch_format="pyarrow", zero_copy_batch=True)
            cand_ids = set(ends.to_pandas()["i"])
            sub = semi_join(sh_all, cand_ids, on="doc_id").to_pandas()
            sh_ref = _ray.put({
                d: np.frombuffer(bts, dtype=np.uint64)
                for d, bts in zip(sub["doc_id"], sub["sh_bin"])})
            verified_ds = cand.map_batches(
                _verify_pairs_fn(sh_ref, threshold),
                batch_format="pandas").materialize()
        else:
            verified_ds = _verify_pairs_shuffle(
                cand, sh_all, threshold, packed=True
            ).materialize()

    if n_pairs and verified_ds.count():
        # cluster the verified graph; a new doc is DUP iff its cluster
        # contains an index doc or a smaller-id batch doc (keep-first).
        # The edge Dataset feeds CC directly — nothing pair-scaled
        # lands on the driver unless the caller collects dup_pairs.
        cc = connected_components(verified_ds)
        new_ids = set(
            docs_ds.select_columns(["doc_id"]).to_pandas()["doc_id"])
        dup_ids = cluster_keep_dups(cc, new_ids)
        verified = (verified_ds.sort(["a", "b"]) if pairs_as_dataset
                    else verified_ds.to_pandas().sort_values(["a", "b"])
                    .reset_index(drop=True))
    else:
        dup_ids = set()
        verified = (
            rd.from_arrow(pa.table({
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64())}))
            if pairs_as_dataset
            else pd.DataFrame(columns=["a", "b", "jaccard"]))

    novel = id_set_filter(docs_ds, dup_ids, keep=False).materialize()
    novel_ids = novel.select_columns(["doc_id"]).to_pandas()
    if "doc_id" not in novel_ids.columns:  # empty → columnless frame
        novel_ids = pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})

    # append ONLY novel docs' bands + shingles (content-addressed parts)
    band_parts = list(man["band_parts"])
    sh_parts = list(man["shingle_parts"])
    if len(novel_ids):
        nb = _bands_of(novel, man)
        for t in nb.iter_batches(batch_format="pyarrow",
                                 batch_size=1 << 16):
            if t.num_rows:
                p = _write_part(os.path.join(state_dir, "bands"), t)
                if p not in band_parts:
                    band_parts.append(p)
        for t in _pack_shingles(novel, man["k"]).iter_batches(
                batch_format="pyarrow", batch_size=1 << 16):
            if t.num_rows:
                p = _write_part(os.path.join(state_dir, "shingles"), t)
                if p not in sh_parts:
                    sh_parts.append(p)
    man["band_parts"] = band_parts
    man["shingle_parts"] = sh_parts
    man["n_docs"] = int(man["n_docs"] + len(novel_ids))
    man["batch_ids"].append({"id": batch_id, "n_new": int(n_new),
                             "n_novel": int(len(novel_ids)),
                             "n_dup": int(len(dup_ids)),
                             "n_preexisting": int(n_pre)})
    _publish(state_dir, man)
    return {"n_new": int(n_new), "n_novel": int(len(novel_ids)),
            "n_dup": int(len(dup_ids)), "n_preexisting": int(n_pre),
            "novel_ids": novel_ids, "dup_pairs": verified,
            "replayed": False}
