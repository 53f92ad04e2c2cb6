"""Deduplication family for training-data pipelines:

- ``exact_dedup``: content-hash → hash-partitioned groupby → keep the
  min-doc_id row per group (the distributed ExampleStore,
  recon/store.py:39-47).
- ``minhash_lsh_dedup``: word-shingle → 64-perm MinHash → banded LSH
  buckets (groupby shuffle) → candidate pairs → exact Jaccard verify →
  connected components via iterative min-label propagation (no driver
  union-find on big data).
- ``simhash_signatures`` + ``simhash_dedup``: 64-bit SimHash, banded
  bucketing, Hamming-distance verify.
- ``ngram_jaccard_pairs``: exact n-gram Jaccard for candidate pairs.
- ``embedding_neardup``: cosine-similarity near-dup over an embedding
  column (blocked matmul against a broadcast matrix).

Everything is deterministic (fixed hash seeds), shuffle-aware (signatures
are tiny rows; texts never ride through the LSH shuffle), and shaped as
map_batches + groupby.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

WORD_RE = re.compile(r"\w+", re.UNICODE)

_MERSENNE = (1 << 61) - 1
_N_PERM = 64


def _perm_params(n_perm: int = _N_PERM, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-grams (sha-truncated, deterministic)."""
    words = [w.lower() for w in WORD_RE.findall(text)]
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return np.array([], dtype=np.uint64)
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.sha1(g.encode()).digest()[:8], "little"
        )
    return out


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep one representative (min id) per distinct text. Shuffle keys are
    16-byte content hashes, never the texts themselves. Global dedup is a
    bucketed merge — one vectorized call per hash bucket, never one Python
    callback per distinct text (distinct texts ≈ corpus size at scale)."""
    from recon_ray.functions.relational import bucketed_group_apply

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__h"] = [
            hashlib.sha256(t.encode()).hexdigest()[:32] for t in batch[text_col]
        ]
        return batch

    hashed = ds.map_batches(add_hash, batch_format="pandas")

    def keep_min_per_hash(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").drop_duplicates("__h")

    kept = bucketed_group_apply(hashed, "__h", keep_min_per_hash)
    return kept.drop_columns(["__h"])


def dup_groups(ds, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    """(representative id, n_copies) per distinct text — the dedup audit.
    Pure built-in aggregates (Min + Count) over the content-hash key: the
    shuffle carries (hash, id) rows only and the merge is vectorized."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "__h": [
                    hashlib.sha256(t.encode()).hexdigest()[:32]
                    for t in batch[text_col]
                ],
                id_col: batch[id_col].values,
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    agg = (
        hashed.groupby("__h")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_copies"))
        .to_pandas()
    )
    out = agg[[id_col, "n_copies"]].copy()
    out["n_copies"] = out["n_copies"].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Actor-pool signature stage: (doc_id, sig: list<uint64>[n_perm]).
    Permutation params built once per actor."""

    def __init__(self, n_perm: int = _N_PERM, k: int = 3, seed: int = 1234):
        self.a, self.b = _perm_params(n_perm, seed)
        self.n_perm = n_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k)
        if len(h) == 0:
            return np.full(self.n_perm, np.uint64(_MERSENNE), dtype=np.uint64)
        # (a*h + b) with uint64 wraparound (deterministic, avalanche-enough;
        # min over shingles per permutation) — vectorized outer product
        vals = self.a[:, None] * h[None, :] + self.b[:, None]
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = [self.signature(t) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array([s.tolist() for s in sigs],
                                pa.list_(pa.uint64())),
            }
        )


def lsh_candidate_pairs(
    sig_ds, n_bands: int = 16, n_perm: int = _N_PERM
) -> pd.DataFrame:
    """Band the signatures, shuffle on (band, band_hash), emit candidate
    pairs (a<b) within each bucket. Returns a (small) pandas pair table."""
    rows_per_band = n_perm // n_bands

    def bands(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        sigs = batch.column("sig").to_pylist()
        out_doc, out_band, out_hash = [], [], []
        for d, s in zip(doc_ids, sigs):
            for b in range(n_bands):
                chunk = tuple(s[b * rows_per_band : (b + 1) * rows_per_band])
                h = hash((b, chunk)) & 0x7FFFFFFFFFFFFFFF
                out_doc.append(d)
                out_band.append(b)
                out_hash.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "bhash": pa.array(out_hash, pa.int64()),
            }
        )

    banded = sig_ds.map_batches(bands, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame(columns=["a", "b"])
        out = [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))]
        return pd.DataFrame(out, columns=["a", "b"])

    pair_df = (
        banded.groupby(["band", "bhash"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(pair_df) == 0:
        return pd.DataFrame(columns=["a", "b"])
    return pair_df.drop_duplicates().reset_index(drop=True)


def minhash_lsh_dedup(
    docs_ds,
    threshold: float = 0.8,
    n_perm: int = _N_PERM,
    n_bands: int = 16,
    k: int = 3,
    concurrency: int = 4,
) -> dict:
    """Full near-dup pipeline. Returns {"pairs": verified pair df,
    "clusters": doc_id→cluster_rep df, "n_duplicates": int}.

    Candidate verification fetches only the candidate texts (semi-join by
    broadcast id-set) — the corpus never re-shuffles."""
    sigs = docs_ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"n_perm": n_perm, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    cand = lsh_candidate_pairs(sigs, n_bands=n_bands, n_perm=n_perm)
    if len(cand) == 0:
        return {"pairs": cand.assign(jaccard=[]), "clusters": pd.DataFrame(
            columns=["doc_id", "cluster"]), "n_duplicates": 0}
    cand_ids = set(cand["a"]) | set(cand["b"])
    from recon_ray.functions.relational import semi_join

    texts = (
        semi_join(docs_ds.select_columns(["doc_id", "text"]), cand_ids, "doc_id")
        .to_pandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    jac = np.array([jaccard(texts[a], texts[b], k) for a, b in
                    zip(cand["a"], cand["b"])])
    verified = cand[jac >= threshold].assign(jaccard=jac[jac >= threshold])
    # connected components by min-label propagation (candidate graph is small
    # post-verify; at larger scale run the same loop as grouped Datasets)
    label = {d: d for d in set(verified["a"]) | set(verified["b"])}
    changed = True
    while changed:
        changed = False
        for a, b in zip(verified["a"], verified["b"]):
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
    clusters = pd.DataFrame(
        sorted(label.items()), columns=["doc_id", "cluster"]
    )
    n_dup = int((clusters["doc_id"] != clusters["cluster"]).sum())
    return {"pairs": verified.reset_index(drop=True), "clusters": clusters,
            "n_duplicates": n_dup}


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash signatures: sign-sum of per-word hash bits."""

    def __init__(self):
        self.word = WORD_RE

    @staticmethod
    def _word_hash(w: str) -> int:
        return int.from_bytes(hashlib.sha1(w.encode()).digest()[:8], "little")

    def simhash(self, text: str) -> int:
        words = [w.lower() for w in self.word.findall(text)]
        if not words:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for w in words:
            h = np.uint64(self._word_hash(w))
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(
                    [self.simhash(t) for t in texts], pa.uint64()
                ),
            }
        )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_dedup(docs_ds, max_hamming: int = 3, concurrency: int = 4) -> pd.DataFrame:
    """Near-dup pairs by SimHash: 4 bands of 16 bits (any pair within
    Hamming ≤3 of 64 bits shares at least one exact band), verify Hamming."""
    sigs_ds = docs_ds.map_batches(
        SimHasher, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
    )

    def bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sh = batch.column("simhash").to_pylist()
        out_id, out_band, out_key, out_sig = [], [], [], []
        for d, s in zip(ids, sh):
            for b in range(4):
                out_id.append(d)
                out_band.append(b)
                out_key.append((s >> (16 * b)) & 0xFFFF)
                out_sig.append(s)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "key": pa.array(out_key, pa.int64()),
                "simhash": pa.array(out_sig, pa.uint64()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].tolist()
        sh = rows["simhash"].tolist()
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = hamming64(int(sh[i]), int(sh[j]))
                if d <= max_hamming:
                    out.append((ids[i], ids[j], d))
        return pd.DataFrame(out, columns=["a", "b", "hamming"])

    df = (
        sigs_ds.map_batches(bands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "key"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(df) == 0:
        return pd.DataFrame(columns=["a", "b", "hamming"])
    return (
        df.drop_duplicates(["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


def embedding_neardup(
    emb_ds, threshold: float = 0.98, id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Cosine near-dup pairs (a<b, cosine≥threshold) by blocked matmul:
    the (normalized) matrix broadcasts once; each batch computes its block
    row against the full matrix. O(n²/B) per task, no shuffle.
    For corpora where the matrix exceeds worker RAM, pre-bucket by coarse
    LSH (see similarity.knn_lsh) and run this per bucket."""
    full = emb_ds.select_columns([id_col, emb_col]).to_pandas()
    ids = full[id_col].to_numpy()
    mat = np.stack(full[emb_col].to_numpy())
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ids_ref = ray.put(ids)
    mat_ref = ray.put(mat)

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids = ray.get(ids_ref)
        m = ray.get(mat_ref)
        q = np.stack(batch[emb_col].to_numpy())
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ m.T
        qa_ids = batch[id_col].to_numpy()
        rows, cols = np.nonzero(sims >= threshold)
        out = []
        for r, c in zip(rows, cols):
            a, b = int(qa_ids[r]), int(all_ids[c])
            if a < b:
                out.append((a, b, round(float(sims[r, c]), 6)))
        return pd.DataFrame(out, columns=["a", "b", "cosine"])

    df = emb_ds.map_batches(block, batch_format="pandas").to_pandas()
    if df.empty:
        return pd.DataFrame(columns=["a", "b", "cosine"])
    return df.sort_values(["a", "b"]).reset_index(drop=True)
