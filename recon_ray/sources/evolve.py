"""Schema-evolution Parquet reader — union-by-name over part files whose
schemas drifted across writer versions (the normal state of a multi-year
ingestion directory: columns added, columns dropped, integer widths
changed). Ray's ``read_parquet`` assumes one schema; feeding it a mixed
directory either errors or silently misaligns blocks downstream.

``read_parquet_evolved`` makes the drift explicit and safe:

1. discover per-file schemas from the Parquet FOOTERS only — when the
   file list is large the footer reads fan out as a Ray task stage and
   only (path, serialized-schema) pairs return to the driver
   (file-count-sized metadata, never data);
2. compute the unified schema: union of column names in first-seen
   order, with CONSERVATIVE type promotion — equal types keep, null
   type yields, integers widen to int64, any float widens the pair to
   float64. Anything else (string vs int, mismatched timestamp units)
   raises instead of silently stringifying — a type conflict in a
   petabyte directory is a bug report, not a cast;
3. group files by identical schema (one ``read_parquet`` per group, so
   Ray's fragment parallelism and column pruning stay intact), align
   every group to the unified schema in a zero-copy ``map_batches``
   stage (missing columns become typed nulls, reordered by name), and
   ``union`` the streams.

The oracled ``interop_schema_evolution`` query replays the promotion
rules in DuckDB (``read_parquet(..., union_by_name=true)`` semantics)
over a three-version fixture derived from the orders table.
"""

from __future__ import annotations

import os

import pyarrow as pa

# footer reads fan out to Ray tasks above this many files
_PARALLEL_FOOTER_THRESHOLD = 64


def _promote(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Unified type for one column seen with types ``a`` and ``b``."""
    if a.equals(b):
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    num = (pa.types.is_integer, pa.types.is_floating)
    if any(p(a) for p in num) and any(p(b) for p in num):
        if pa.types.is_floating(a) or pa.types.is_floating(b):
            return pa.float64()
        return pa.int64()
    raise ValueError(
        f"cannot promote {a} vs {b} — schema drift beyond "
        "add/drop/widen needs an explicit migration")


def _file_schemas(files: list[str]) -> list[tuple[str, bytes]]:
    """(path, serialized footer schema) per file; parallel via Ray
    tasks for big listings, driver loop for small ones."""
    import pyarrow.parquet as pq

    def one(path: str) -> bytes:
        return pq.read_schema(path).serialize().to_pybytes()

    if len(files) <= _PARALLEL_FOOTER_THRESHOLD:
        return [(f, one(f)) for f in files]
    import ray

    @ray.remote(num_cpus=0.25)
    def batch(paths: list) -> list:
        return [(p, one(p)) for p in paths]

    chunk = max(8, len(files) // 64)
    refs = [batch.remote(files[i:i + chunk])
            for i in range(0, len(files), chunk)]
    out: list = []
    for r in ray.get(refs):
        out.extend(r)
    return out


def unify_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Union-by-name in first-seen order with `_promote` on conflicts."""
    names: list[str] = []
    types: dict[str, pa.DataType] = {}
    for sch in schemas:
        for f in sch:
            if f.name not in types:
                names.append(f.name)
                types[f.name] = f.type
            else:
                types[f.name] = _promote(types[f.name], f.type)
    return pa.schema([(n, types[n]) for n in names])


def _align_fn(unified: pa.Schema):
    def align(t: pa.Table) -> pa.Table:
        cols = []
        for f in unified:
            if f.name in t.column_names:
                c = t.column(f.name)
                if not c.type.equals(f.type):
                    c = c.cast(f.type)
            else:
                c = pa.nulls(t.num_rows, f.type)
            cols.append(c)
        return pa.table(dict(zip(unified.names, cols)))

    return align


def read_parquet_evolved(path: str, columns: list[str] | None = None):
    """Directory (or explicit file list) of Parquet parts with drifted
    schemas → ONE lazy Dataset on the unified schema. ``columns``
    prunes the unified schema (pushed into each per-group read, so
    unread columns never leave storage)."""
    import ray.data

    if isinstance(path, (list, tuple)):
        files = sorted(path)
    else:
        files = sorted(
            os.path.join(dp, f)
            for dp, _dn, fn in os.walk(path)
            for f in fn if f.endswith(".parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet parts under {path!r}")
    pairs = _file_schemas(files)
    schemas: dict[bytes, pa.Schema] = {}
    groups: dict[bytes, list[str]] = {}
    for f, raw in pairs:
        if raw not in schemas:
            schemas[raw] = pa.ipc.read_schema(pa.py_buffer(raw))
        groups.setdefault(raw, []).append(f)
    unified = unify_schemas([schemas[k] for k in schemas])
    if columns is not None:
        missing = [c for c in columns if c not in unified.names]
        if missing:
            raise ValueError(f"columns not in unified schema: {missing}")
        unified = pa.schema([(n, unified.field(n).type)
                             for n in columns])
    align = _align_fn(unified)
    parts = []
    for raw, fl in groups.items():
        keep = [c for c in columns or unified.names
                if c in schemas[raw].names]
        if not keep:
            # group carries none of the requested columns: read ONE
            # narrow column purely for row counts; align nulls the rest
            keep = [schemas[raw].names[0]]
        ds = ray.data.read_parquet(fl, columns=keep)
        parts.append(ds.map_batches(align, batch_format="pyarrow",
                                    zero_copy_batch=True))
    out = parts[0]
    if len(parts) > 1:
        out = out.union(*parts[1:])
    return out
