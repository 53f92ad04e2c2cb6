"""Deterministic hashing utilities.

The reference pins determinism with xxh3_64 content hashes
(recon/hashing.py:120-143) used as idempotence keys and a git-like
``commit_hash`` per dataset (recon/dataset.py:104-106). Here:

- ``content_sha256`` is the per-row invariant required by BASELINE.json
  (content sha256 equality vs. the reference extractor);
- ``stable_u64`` / ``hash_u64_arrays`` provide 64-bit keys (``doc_id``,
  shuffle salts) — sha256-truncated since xxhash isn't available in this
  environment (pure stdlib, deterministic across processes/machines);
- ``combine_u64`` is an order-insensitive rollup (sum mod 2^64) playing the
  role of the reference's dataset commit hash (recon/hashing.py:88-100) at
  partition granularity: manifests store it to detect externally-changed
  inputs without ordering assumptions.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Sequence

import numpy as np
import pyarrow as pa

_MASK64 = (1 << 64) - 1


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def sha256_hex_many(texts: Sequence[str]) -> list[str]:
    """Vectorized-ish sha256 over a column (C-speed hashlib per row)."""
    h = hashlib.sha256
    return [h(t.encode("utf-8")).hexdigest() for t in texts]


def stable_u64(*parts: object) -> int:
    """Deterministic 64-bit hash of a tuple of str/int parts."""
    m = hashlib.sha256()
    for p in parts:
        m.update(str(p).encode("utf-8"))
        m.update(b"\x00")
    return int.from_bytes(m.digest()[:8], "little")


def hash_u64_arrays(*cols: Sequence[object]) -> np.ndarray:
    """Row-wise stable_u64 over parallel columns → uint64 ndarray."""
    n = len(cols[0])
    out = np.empty(n, dtype=np.uint64)
    sha = hashlib.sha256
    for i in range(n):
        m = sha()
        for c in cols:
            m.update(str(c[i]).encode("utf-8"))
            m.update(b"\x00")
        out[i] = int.from_bytes(m.digest()[:8], "little")
    return out


def combine_u64(hashes: Iterable[int]) -> int:
    """Order-insensitive combination of u64 hashes (sum mod 2^64)."""
    total = 0
    for h in hashes:
        total = (total + int(h)) & _MASK64
    return total


def add_content_keys(batch: pa.Table, content_col: str = "content") -> pa.Table:
    """Append ``content_sha256`` (per-row invariant) and ``doc_id`` (u64 key
    over repo/path/commit) to a files batch. Stateless map_batches kernel."""
    contents = batch.column(content_col).to_pylist()
    sha = sha256_hex_many(contents)
    doc_id = hash_u64_arrays(
        batch.column("repo").to_pylist(),
        batch.column("path").to_pylist(),
        batch.column("commit").to_pylist(),
    )
    batch = batch.append_column("content_sha256", pa.array(sha, pa.string()))
    batch = batch.append_column("doc_id", pa.array(doc_id, pa.uint64()))
    return batch
