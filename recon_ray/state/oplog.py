"""Op-log + snapshot dataset wrapper — the distributed analogue of the
reference Dataset's ``apply_`` / ``rollback`` contract
(recon/dataset.py:176-289, tests/test_dataset.py:90-117).

The reference tracks per-example transformations in memory and keeps prior
example versions in a content-addressed ``ExampleStore`` so the last n
operations can be undone. At Ray scale per-example undo journals would be
as large as the data, so rollback here is SNAPSHOT-grained: every applied
operation writes a content-addressed parquet snapshot of the docs (the
ExampleStore analogue, one dir per op-chain state), and ``rollback(n)``
re-points the dataset at the snapshot n ops back — restoring data, stats,
and commit hash exactly. Snapshots double as the resume/replay grain.

The commit hash is the order-insensitive rollup of per-doc state hashes
(doc_id + sorted mention tuples) — ``hash(ds)`` equality before an op and
after its rollback is the ported acceptance check.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data as rd

from recon_ray.hashing import combine_u64
from recon_ray.ops import OPS


def _doc_state_u64(batch: pa.Table) -> pa.Table:
    """Per-doc deterministic state hash (doc_id ⊕ mention set)."""
    import hashlib

    doc_ids = batch.column("doc_id").to_pylist()
    out = np.empty(len(doc_ids), dtype=np.uint64)
    if "mentions" in batch.column_names:
        from recon_ray.ops.mentions_io import mentions_parts

        lengths, text, start, end, label, _src = mentions_parts(batch)
        pos = 0
        for i, d in enumerate(doc_ids):
            n = int(lengths[i])
            parts = sorted(
                (int(start[j]), int(end[j]), str(label[j]), str(text[j]))
                for j in range(pos, pos + n)
            )
            m = hashlib.sha256(str((d, parts)).encode())
            out[i] = int.from_bytes(m.digest()[:8], "little")
            pos += n
    else:
        for i, d in enumerate(doc_ids):
            m = hashlib.sha256(str(d).encode())
            out[i] = int.from_bytes(m.digest()[:8], "little")
    return pa.table({"h": pa.array(out, pa.uint64())})


def dataset_commit_hash(ds) -> int:
    """Order-insensitive content rollup of a docs Dataset — the analogue of
    the reference's dataset commit hash (recon/hashing.py:88-100)."""
    parts = ds.map_batches(
        _doc_state_u64, batch_format="pyarrow", zero_copy_batch=True
    )
    total = 0
    for b in parts.iter_batches(batch_format="pyarrow"):
        total = combine_u64([total, combine_u64(b.column("h").to_pylist())])
    return total


@dataclass
class OpLogEntry:
    name: str
    kwargs: dict
    snapshot: str
    n_docs: int
    commit_hash: str
    extra: dict = field(default_factory=dict)


class SnapshotStore:
    """Content-addressed snapshot store — the ExampleStore analogue at
    dataset granularity (recon/store.py keys examples by hash; at Ray
    scale the unit is a docs SNAPSHOT keyed by its order-insensitive
    commit hash). Identical dataset states share one directory, so an
    apply→rollback→re-apply chain (or two TrackedDatasets reaching the
    same state) stores the bytes once."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, commit_hash: str) -> str:
        return os.path.join(self.root, commit_hash)

    def has(self, commit_hash: str) -> bool:
        return os.path.isdir(self.path(commit_hash))

    def get(self, commit_hash: str):
        """The stored docs as a (lazy) Dataset."""
        if not self.has(commit_hash):
            raise KeyError(commit_hash)
        return rd.read_parquet(self.path(commit_hash))

    def list(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )

    def put_dir(self, tmp_dir: str, commit_hash: str) -> str:
        """Move a freshly-written snapshot into the store; dedupe on hash."""
        dest = self.path(commit_hash)
        if os.path.isdir(dest):
            shutil.rmtree(tmp_dir, ignore_errors=True)
        else:
            os.replace(tmp_dir, dest)
        return dest

    def gc(self, referenced: set[str]) -> list[str]:
        """Drop snapshots not in ``referenced``; returns removed hashes."""
        removed = []
        for h in self.list():
            if h not in referenced:
                shutil.rmtree(self.path(h), ignore_errors=True)
                removed.append(h)
        return removed


class TrackedDataset:
    """Apply registered ops over a docs Dataset with per-op snapshots and
    snapshot-grained rollback.

    ``apply_(op_name, **kwargs)`` runs the op and commits a new snapshot;
    ``rollback(n)`` restores the dataset (and its stats/commit hash) to
    the state n operations back; ``operations`` is the live op log."""

    def __init__(self, ds, workdir: str, name: str = "dataset",
                 store: Optional[SnapshotStore] = None):
        self.name = name
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        # snapshots live in a content-addressed store (shareable across
        # TrackedDatasets pointed at the same root)
        self.store = store or SnapshotStore(os.path.join(workdir, "store"))
        self._log: list[OpLogEntry] = []
        self._commit("__initial__", {}, ds)

    # ------------------------------------------------------------------
    def _commit(self, op_name: str, kwargs: dict, ds) -> None:
        tmp = os.path.join(self.workdir, f".tmp-{len(self._log):03d}")
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        snapshot_ds = rd.read_parquet(tmp)
        n_docs = snapshot_ds.count()
        commit_hash = f"{dataset_commit_hash(snapshot_ds):016x}"
        snap = self.store.put_dir(tmp, commit_hash)
        entry = OpLogEntry(
            name=op_name,
            kwargs={k: v for k, v in kwargs.items()},
            snapshot=snap,
            n_docs=n_docs,
            commit_hash=commit_hash,
        )
        self._log.append(entry)
        self._write_log()

    def _write_log(self) -> None:
        with open(os.path.join(self.workdir, "ops.json"), "w") as f:
            json.dump(
                [
                    {
                        "name": e.name,
                        "kwargs": {k: str(v) for k, v in e.kwargs.items()},
                        "snapshot": e.snapshot,
                        "n_docs": e.n_docs,
                        "commit_hash": e.commit_hash,
                    }
                    for e in self._log
                ],
                f,
                indent=2,
            )

    @classmethod
    def load(cls, workdir: str, store: Optional[SnapshotStore] = None
             ) -> "TrackedDataset":
        """Reopen a persisted op log (ops.json + snapshot store) in a new
        process — data, stats and commit hash come back exactly; this is
        what the CLI ``track log/rollback/gc`` verbs drive."""
        self = object.__new__(cls)
        self.name = os.path.basename(workdir.rstrip("/")) or "dataset"
        self.workdir = workdir
        self.store = store or SnapshotStore(os.path.join(workdir, "store"))
        with open(os.path.join(workdir, "ops.json")) as f:
            entries = json.load(f)
        self._log = [
            OpLogEntry(
                name=e["name"],
                kwargs=e["kwargs"],
                snapshot=e["snapshot"],
                n_docs=e["n_docs"],
                commit_hash=e["commit_hash"],
            )
            for e in entries
        ]
        if not self._log:
            raise ValueError(f"empty op log in {workdir}")
        return self

    # ------------------------------------------------------------------
    @property
    def data(self):
        """The current docs as a (lazy) Dataset read of the head snapshot."""
        return rd.read_parquet(self._log[-1].snapshot)

    @property
    def operations(self) -> list[OpLogEntry]:
        """Applied operations (excludes the initial commit)."""
        return self._log[1:]

    @property
    def commit_hash(self) -> str:
        return self._log[-1].commit_hash

    def __len__(self) -> int:
        return self._log[-1].n_docs

    def apply_(self, op_name: str, tracker=None,
               batch_size: Optional[int] = None, **kwargs) -> None:
        if op_name not in OPS:
            raise KeyError(f"unknown operation: {op_name}")
        out = OPS[op_name].apply(
            self.data, tracker=tracker, batch_size=batch_size, **kwargs
        )
        self._commit(op_name, kwargs, out)

    def rollback(self, n: int = 1) -> None:
        """Undo the last n operations (recon/dataset.py:240-289 semantics:
        n must be ≥1 and ≤ number of applied operations)."""
        if n < 1:
            raise ValueError(
                f"Cannot rollback dataset: provided n: ({n}) must be 1 or higher."
            )
        if n > len(self.operations):
            raise ValueError(
                f"Cannot rollback dataset: provided n ({n}) is larger than "
                "the total number of dataset operations."
            )
        # snapshots are content-addressed and may be shared — truncate the
        # log only; reclaim unreferenced dirs explicitly via gc()
        self._log = self._log[:-n]
        self._write_log()

    def gc(self) -> list[str]:
        """Drop store snapshots no longer referenced by this op log."""
        return self.store.gc({e.commit_hash for e in self._log})

    def search(self, query: str, case_sensitive: bool = True,
               text_col: str = "content"):
        from recon_ray.functions.text import search as _search

        return _search(self.data, query, case_sensitive, text_col=text_col)
