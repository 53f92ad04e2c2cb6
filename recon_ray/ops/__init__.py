"""Batch-operation framework — the Ray Data analogue of recon's
``@operation`` registry (recon/operations.py:26-125).

An op here is a **batch kernel** ``fn(pa.Table, **kwargs) -> pa.Table``
registered under a versioned name and lifted over a ``ray.data.Dataset``
with ``map_batches(batch_format="pyarrow", zero_copy_batch=True)``.
The reference's three-way per-example return contract
(Example → changed-if-hash-differs, None → removed, List → added;
recon/operations.py:239-256) becomes doc-level add/remove/change counting
by aligning ``doc_id`` → row-state hash before vs. after the kernel.

Lineage counts stream to a small named Ray actor (``LineageTracker``) —
the one legitimately shared-mutable piece of state, the analogue of the
``OperationState`` log (recon/types.py:211-273).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Union

import pyarrow as pa
import ray

OPS: dict[str, "Op"] = {}
PREPROCESSORS: dict[str, "PreProc"] = {}
FACTORIES: dict[str, Callable[..., "Op"]] = {}


@dataclass
class PreProc:
    """Shared-preprocessing stage (analogue of recon's PreProcessor,
    recon/preprocess.py:47-66): a batch kernel that APPENDS one derived
    column. Caching falls out of the data model — ``ensure`` computes the
    column only when absent, so a chain of ops declaring the same ``pre``
    derives it once and every later op reads it for free (the reference
    caches preprocessor outputs per example hash; here the cache is the
    column riding the Dataset)."""

    name: str
    provides: str
    fn: Callable[[pa.Table], pa.Table]

    def ensure(self, ds):
        provides, fn = self.provides, self.fn

        def maybe(batch: pa.Table) -> pa.Table:
            if provides in batch.column_names:
                return batch
            return fn(batch)

        return ds.map_batches(
            maybe, batch_format="pyarrow", zero_copy_batch=True
        )


def preprocessor(name: str, provides: str) -> Callable:
    """Register a preprocessing kernel (analogue of @preprocessor,
    recon/preprocess.py:16-44)."""

    def deco(fn: Callable[[pa.Table], pa.Table]) -> Callable:
        PREPROCESSORS[name] = PreProc(name=name, provides=provides, fn=fn)
        return fn

    return deco


def op_factory(name: str) -> Callable:
    """Register an operation FACTORY — a callable returning a configured
    Op (analogue of operation_factories, recon/operations.py:28-30).
    ``make_op(name, **kwargs)`` instantiates and registers the result."""

    def deco(fn: Callable[..., "Op"]) -> Callable:
        FACTORIES[name] = fn
        return fn

    return deco


def make_op(name: str, **kwargs) -> "Op":
    new_op = FACTORIES[name](**kwargs)
    OPS[new_op.name] = new_op
    return new_op


def load_entry_point_plugins(group: str = "recon_ray.operations") -> int:
    """Plugin surface (the catalogue ``entry_points=True`` analogue,
    recon/operations.py:27-30): importing each module registered under the
    entry-point group runs its @op/@preprocessor/@op_factory decorators.
    Returns the number of plugins loaded (0 when none installed)."""
    import importlib.metadata as md

    count = 0
    try:
        eps = md.entry_points(group=group)
    except TypeError:  # older importlib.metadata API
        eps = md.entry_points().get(group, [])
    for ep in eps:
        ep.load()
        count += 1
    return count


@ray.remote(num_cpus=0)
class LineageTracker:
    """Append-only per-op counters (analogue of OperationState,
    recon/types.py:211-273). num_cpus=0: pure bookkeeping."""

    def __init__(self) -> None:
        self._ops: dict[str, dict[str, int]] = {}
        self._order: list[str] = []

    def add(self, op_name: str, added: int, removed: int, changed: int, rows: int) -> None:
        if op_name not in self._ops:
            self._ops[op_name] = {"added": 0, "removed": 0, "changed": 0, "rows": 0}
            self._order.append(op_name)
        s = self._ops[op_name]
        s["added"] += added
        s["removed"] += removed
        s["changed"] += changed
        s["rows"] += rows

    def summary(self) -> list[dict]:
        return [{"name": n, **self._ops[n]} for n in self._order]


def _doc_state_hashes(batch: pa.Table) -> dict[int, int]:
    """doc_id → within-process hash of the doc's mention set.

    Used only to compute added/removed/changed counts inside one worker
    process (pre vs. post the kernel), so Python's builtin hash is fine.
    """
    from recon_ray.ops.mentions_io import mentions_parts

    doc_ids = batch.column("doc_id").to_pylist()
    if "mentions" not in batch.column_names:
        return {d: 0 for d in doc_ids}
    lengths, text, start, end, label, _src = mentions_parts(batch)
    out: dict[int, int] = {}
    pos = 0
    for i, d in enumerate(doc_ids):
        n = int(lengths[i])
        out[d] = hash(
            tuple(
                (int(start[j]), int(end[j]), label[j], text[j])
                for j in range(pos, pos + n)
            )
        )
        pos += n
    return out


@dataclass
class Op:
    name: str
    fn: Callable[..., pa.Table]
    kind: str = "map"  # map | filter | explode — doc-level semantics
    pre: tuple = ()  # preprocessor names this op depends on

    def batch_fn(self, tracker=None, **kwargs) -> Callable[[pa.Table], pa.Table]:
        kernel, name = self.fn, self.name

        def run(batch: pa.Table) -> pa.Table:
            if tracker is None:
                return kernel(batch, **kwargs)
            pre = _doc_state_hashes(batch)
            out = kernel(batch, **kwargs)
            post = _doc_state_hashes(out)
            added = len(post.keys() - pre.keys())
            removed = len(pre.keys() - post.keys())
            changed = sum(
                1 for d in pre.keys() & post.keys() if pre[d] != post[d]
            )
            tracker.add.remote(name, added, removed, changed, out.num_rows)
            return out

        return run

    def apply(self, ds, tracker=None, batch_size: Optional[int] = None, **kwargs):
        for p in self.pre:  # ensure is a no-op when the column already rides
            ds = PREPROCESSORS[p].ensure(ds)
        return ds.map_batches(
            self.batch_fn(tracker=tracker, **kwargs),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )


def op(name: str, kind: str = "map", pre: tuple = ()) -> Callable:
    """Register a batch kernel (analogue of @operation,
    recon/operations.py:63-125). ``pre`` names preprocessors whose derived
    columns the kernel reads — applied (and shared) automatically."""

    def deco(fn: Callable[..., pa.Table]) -> Callable[..., pa.Table]:
        OPS[name] = Op(name=name, fn=fn, kind=kind, pre=tuple(pre))
        return fn

    return deco


OpSpec = Union[str, tuple]


def pipe(ds, ops: list[OpSpec], tracker=None, batch_size: Optional[int] = None):
    """Chain registered ops over a Dataset (analogue of Dataset.pipe_,
    recon/dataset.py:225-238). Each entry is a name or (name, kwargs)."""
    for entry in ops:
        if isinstance(entry, str):
            name, kwargs = entry, {}
        else:
            name, kwargs = entry
        ds = OPS[name].apply(ds, tracker=tracker, batch_size=batch_size, **kwargs)
    return ds


# populate the registry with the built-in operators (safe circular import:
# these modules only need the already-defined @op decorator above)
from recon_ray.ops import augment as _augment  # noqa: E402,F401
from recon_ray.ops import spans as _spans  # noqa: E402,F401
from recon_ray.ops import tokens as _tokens  # noqa: E402,F401
