"""Zone-map (min/max data-skipping) Parquet layout + predicate-pruned
reader — the "don't scan 100 TB to answer a 1-repo question" layer that
table formats (Iceberg/Delta zone maps, Parquet row-group stats) provide,
rebuilt over plain directories so the engine controls it end to end.

Writer: each write task emits ONE content-addressed Parquet file per
batch and returns a tiny stats row (per tracked column: min / max /
null_count, plus row count); the driver assembles `_zonemap.json` from
the stats Dataset (files-sized, never rows-sized) and writes it LAST —
crash before the manifest means the next run simply rewrites (same
content hash → same filenames → idempotent under Ray task retries).

Optional Z-ORDER clustering: interleaving the bits of two integer
columns into one sort key makes BOTH columns' per-file ranges tight, so
a box predicate on either (or both) skips most files — the standard
multi-dimensional-locality trick (Morton curve). Clustering costs one
distributed sort at write time; that is the documented trade every
layout-optimizing writer (OPTIMIZE ZORDER BY) makes.

Reader: `read_zonemapped(dir, intervals)` drops every file whose
[min, max] window cannot intersect the requested box and applies the
EXACT residual row filter to the survivors — pruning is a performance
fact, never a correctness input. Oracled end-to-end by
`q_events_pruned_scan` (the pruned scan must equal the full-table SQL);
the skipping itself is pinned by tests/test_zonemap.py.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

MANIFEST = "_zonemap.json"
_VER_RE = re.compile(r"^_zonemap\.v(\d+)\.json$")


def zvalue(x: np.ndarray, y: np.ndarray, bits: int = 21) -> np.ndarray:
    """Morton interleave of two non-negative integer arrays into one
    uint64 sort key (bit i of x → bit 2i, bit i of y → bit 2i+1).
    ``bits`` caps each input at 2^bits (values clip); 21+21 bits keeps
    the result inside the exactly-representable int range everywhere.
    Vectorized; the per-row reference is pinned in tests."""
    xs = np.clip(x.astype(np.int64), 0, (1 << bits) - 1).astype(np.uint64)
    ys = np.clip(y.astype(np.int64), 0, (1 << bits) - 1).astype(np.uint64)
    out = np.zeros(len(xs), dtype=np.uint64)
    for i in range(bits):
        out |= ((xs >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
        out |= ((ys >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i + 1)
    return out


def write_zonemapped(
    ds,
    out_dir: str,
    stat_cols: list[str],
    zorder_cols: tuple[str, str] | None = None,
    rows_per_file: int = 65536,
    keep_history: bool = False,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 1 << 14,
    bloom_k: int = 7,
) -> dict:
    """Write ``ds`` as zone-mapped Parquet under ``out_dir``. Tracks
    min/max/null_count for every ``stat_cols`` entry per file; with
    ``zorder_cols`` = (int_col_a, int_col_b) the rows are first
    clustered on the Morton key (one distributed sort). Returns the
    manifest dict. The dataset schema is recorded so an all-pruned read
    stays schema-correct. ``keep_history=True`` additionally publishes
    the snapshot as ``_zonemap.v{N}.json`` — time travel via
    ``read_zonemapped(dir, version=N)``, structural sharing through the
    content-addressed parts, expiry via :func:`vacuum`.

    ``bloom_cols`` additionally stores a per-file BLOOM FILTER over
    each listed column (``bloom_bits`` bits, ``bloom_k`` probes — the
    sketches module's hash family): min/max windows prune RANGE
    predicates but are useless for point lookups on columns the layout
    isn't sorted by (every file's window spans the domain); the bloom
    prunes ``equals=`` probes there — a definite-absent file is
    skipped, a maybe-present file is scanned and exactly filtered
    (false positives cost I/O, never correctness). The Iceberg/Parquet
    bloom-filter feature rebuilt over plain directories."""
    import base64

    from recon_ray.functions.sketches import (_bloom_positions,
                                              _col_hashes)

    os.makedirs(out_dir, exist_ok=True)
    bloom_cols = list(bloom_cols or [])
    track_cols = list(dict.fromkeys(list(stat_cols) + bloom_cols))

    if zorder_cols is not None:
        ca, cb = zorder_cols

        def add_z(t: pa.Table) -> pa.Table:
            z = zvalue(t.column(ca).to_numpy(zero_copy_only=False),
                       t.column(cb).to_numpy(zero_copy_only=False))
            return t.append_column("__z", pa.array(z, pa.uint64()))

        ds = ds.map_batches(add_z, batch_format="pyarrow").sort("__z")

    def write_file(t: pa.Table) -> pa.Table:
        if "__z" in t.column_names:
            t = t.drop_columns(["__z"])
        if t.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "stats": pa.array([], pa.string())})
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        h = hashlib.sha1(sink.getvalue().to_pybytes()).hexdigest()[:16]
        # content-addressed name: a retried task rewrites the same file.
        # (Two bit-identical 65k-row batches would collide — give rows a
        # unique id column if batch-level duplicates are possible.)
        name = f"part-{h}.parquet"
        stats = {}
        for col in track_cols:
            arr = t.column(col)
            nulls = arr.null_count
            valid = arr.drop_null()
            stats[col] = {
                "min": _js(pc.min(valid).as_py()) if len(valid) else None,
                "max": _js(pc.max(valid).as_py()) if len(valid) else None,
                "null_count": int(nulls),
            }
            if col in bloom_cols and len(valid):
                import pandas as _pd

                hh = _col_hashes(
                    _pd.DataFrame({col: valid.to_pandas()}), col)
                pos = _bloom_positions(hh, bloom_k, bloom_bits).ravel()
                bits = np.zeros((bloom_bits + 7) // 8, dtype=np.uint8)
                np.bitwise_or.at(
                    bits, pos >> 3,
                    np.left_shift(np.uint8(1),
                                  (pos & 7).astype(np.uint8)))
                stats[col]["bloom"] = base64.b64encode(
                    bits.tobytes()).decode()
        tmp = os.path.join(out_dir, f".{name}.tmp-{os.getpid()}")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(out_dir, name))  # atomic, idempotent
        return pa.table({"file": [name], "n_rows": [t.num_rows],
                         "stats": [json.dumps(stats)]})

    stats_rows = ds.map_batches(
        write_file, batch_format="pyarrow", batch_size=rows_per_file
    ).to_pandas()  # files-sized, not rows-sized

    seen: dict[str, dict] = {}
    for r in stats_rows.itertuples(index=False):
        seen[r.file] = {"file": r.file, "n_rows": int(r.n_rows),
                        "stats": json.loads(r.stats)}
    files = sorted(seen.values(), key=lambda f: f["file"])
    file_schema = None
    if files:  # schema from a written file: no pipeline re-execution
        file_schema = pq.read_schema(
            os.path.join(out_dir, files[0]["file"]))
        schema_cols = file_schema.names
    else:
        schema_cols = [c for c in ds.schema().names if c != "__z"]
    manifest = {
        "stat_cols": stat_cols,
        "zorder_cols": list(zorder_cols) if zorder_cols else None,
        "columns": schema_cols,
        "files": files,
        "n_rows": int(sum(f["n_rows"] for f in files)),
    }
    if bloom_cols:
        # stored dtype kind per bloom column: the probe side must hash
        # the SAME representation the writer hashed (_col_hashes
        # branches int vs string-of-value by dtype), so probing a
        # float64 column with a Python int must first coerce to float
        dtypes = {}
        if file_schema is not None:
            for col in bloom_cols:
                if col in file_schema.names:
                    ty = file_schema.field(col).type
                    dtypes[col] = ("int" if pa.types.is_integer(ty)
                                   else "float" if pa.types.is_floating(ty)
                                   else "str")
        manifest["bloom"] = {"cols": bloom_cols, "m": int(bloom_bits),
                             "k": int(bloom_k), "dtypes": dtypes}
    if keep_history:
        manifest["version"] = max(list_versions(out_dir), default=0) + 1
        _write_json(out_dir, manifest,
                    f"_zonemap.v{manifest['version']}.json")
    # sweep orphans BEFORE publishing the head manifest: parts from a
    # previous layout (different batching) or a crashed run must never
    # linger — a reader trusts only a manifest, but stale files waste
    # disk. Files referenced by ANY retained snapshot survive (that's
    # the structural sharing: unchanged content-addressed parts are
    # shared between versions, the Iceberg snapshot model).
    protected = {f["file"] for f in files}
    for v in list_versions(out_dir):
        protected.update(
            e["file"] for e in _load_manifest(out_dir, v)["files"])
    for fname in os.listdir(out_dir):
        if (fname.endswith(".parquet") and fname not in protected) or \
                ".tmp" in fname:
            os.remove(os.path.join(out_dir, fname))
    _write_json(out_dir, manifest, MANIFEST)  # head manifest LAST
    return manifest


def _write_json(out_dir: str, obj: dict, name: str) -> None:
    tmp = tempfile.NamedTemporaryFile(
        "w", dir=out_dir, delete=False, suffix=".tmp")
    json.dump(obj, tmp, indent=1)
    tmp.close()
    os.replace(tmp.name, os.path.join(out_dir, name))


def list_versions(out_dir: str) -> list[int]:
    """Retained snapshot versions, ascending."""
    out = []
    for n in os.listdir(out_dir):
        m = _VER_RE.match(n)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _load_manifest(out_dir: str, version: int | None = None) -> dict:
    name = MANIFEST if version is None else f"_zonemap.v{version}.json"
    with open(os.path.join(out_dir, name)) as f:
        return json.load(f)


def vacuum(out_dir: str, keep_last: int = 1) -> dict:
    """Expire old snapshots: drop all but the newest ``keep_last``
    version manifests, then delete every part no retained manifest
    (head included) references. Returns {"versions_dropped",
    "files_deleted"}."""
    if keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    versions = list_versions(out_dir)
    drop = versions[:-keep_last] if keep_last else versions
    for v in drop:
        os.remove(os.path.join(out_dir, f"_zonemap.v{v}.json"))
    protected = {e["file"] for e in _load_manifest(out_dir)["files"]}
    for v in list_versions(out_dir):
        protected.update(
            e["file"] for e in _load_manifest(out_dir, v)["files"])
    deleted = 0
    for fname in os.listdir(out_dir):
        if fname.endswith(".parquet") and fname not in protected:
            os.remove(os.path.join(out_dir, fname))
            deleted += 1
    return {"versions_dropped": len(drop), "files_deleted": deleted}


def _js(v):
    """JSON-safe scalar (timestamps → isoformat strings)."""
    return v.isoformat() if hasattr(v, "isoformat") else v


def prune_files(out_dir: str, intervals: dict,
                version: int | None = None,
                equals: dict | None = None) -> tuple[list[str], int]:
    """File-level pruning decision only (exposed for tests / planning):
    returns (kept file names, total file count). ``intervals`` maps
    column → (lo, hi) inclusive; None bounds are open. A file survives
    iff every interval can intersect its [min, max] window; files with
    only NULLs in a filtered column never match a range predicate and
    are skipped. ``equals`` maps column → value (point lookup): the
    [min, max] window applies first, then — when the writer stored a
    bloom for the column — a definite-absent bloom probe skips the
    file (maybe-present keeps it; false positives cost a scan, never
    a row)."""
    import base64

    manifest = _load_manifest(out_dir, version)
    bl = manifest.get("bloom") or {}
    probes: dict = {}
    if equals:
        import pandas as _pd

        from recon_ray.functions.sketches import (_bloom_positions,
                                                  _col_hashes)

        dtypes = bl.get("dtypes") or {}
        for col, v in equals.items():
            if col in bl.get("cols", ()):
                kind = dtypes.get(col)
                if kind is None:
                    # legacy manifest without dtypes: infer the stored
                    # kind from the first non-null stats min (JSON
                    # preserves int vs float vs str)
                    for entry in manifest["files"]:
                        s = entry["stats"].get(col)
                        if s and s["min"] is not None:
                            mv = s["min"]
                            kind = ("int" if isinstance(mv, bool) is False
                                    and isinstance(mv, int)
                                    else "float" if isinstance(mv, float)
                                    else "str")
                            break
                pv = v
                try:
                    if kind == "int":
                        pv = int(v)
                    elif kind == "float":
                        pv = float(v)
                    elif kind == "str":
                        pv = str(v)
                except (TypeError, ValueError):
                    pv = v  # uncoercible probe: hash as given
                hh = _col_hashes(_pd.DataFrame({col: [pv]}), col)
                probes[col] = _bloom_positions(
                    hh, bl["k"], bl["m"]).ravel()
    kept = []
    for entry in manifest["files"]:
        ok = True
        for col, (lo, hi) in intervals.items():
            s = entry["stats"].get(col)
            if s is None:  # untracked column: cannot prune on it
                continue
            if s["min"] is None:  # all-NULL file: no row can be in range
                ok = False
                break
            if lo is not None and s["max"] < lo:
                ok = False
                break
            if hi is not None and s["min"] > hi:
                ok = False
                break
        for col, v in (equals or {}).items():
            if not ok:
                break
            s = entry["stats"].get(col)
            if s is None:
                continue
            if s["min"] is None or not (s["min"] <= v <= s["max"]):
                ok = False
                break
            b64 = s.get("bloom")
            if b64 is not None and col in probes:
                bits = np.frombuffer(base64.b64decode(b64), np.uint8)
                pos = probes[col]
                hit = (bits[pos >> 3]
                       >> (pos & 7).astype(np.uint8)) & 1
                if not hit.all():
                    ok = False  # definitely absent from this file
                    break
        if ok:
            kept.append(entry["file"])
    return kept, len(manifest["files"])


def read_zonemapped(out_dir: str, intervals: dict | None = None,
                    version: int | None = None,
                    equals: dict | None = None):
    """Predicate-pruned Dataset over a zone-mapped directory: skip files
    the manifest proves empty for the box (min/max windows for
    ``intervals``, bloom probes + windows for ``equals`` point
    lookups), then apply the exact residual row filter to the
    survivors. Returns a lazy Dataset; with every file pruned it
    returns an empty Dataset that still carries the schema (read one
    file, filter all rows — never a zero-column block)."""
    import ray.data

    intervals = intervals or {}
    equals = equals or {}
    kept, _total = prune_files(out_dir, intervals, version=version,
                               equals=equals)
    all_pruned = not kept
    if all_pruned:
        manifest = _load_manifest(out_dir, version)
        if not manifest["files"]:
            raise FileNotFoundError(f"zone-mapped dir {out_dir} is empty")
        kept = [manifest["files"][0]["file"]]  # schema donor
    ds = ray.data.read_parquet([os.path.join(out_dir, f) for f in kept])
    if not intervals and not equals and not all_pruned:
        return ds

    def residual(t: pa.Table) -> pa.Table:
        mask = np.ones(t.num_rows, dtype=bool)
        if all_pruned:
            return t.filter(pa.array(np.zeros(t.num_rows, dtype=bool)))
        for col, (lo, hi) in intervals.items():
            vals = t.column(col)
            ok = pc.is_valid(vals).to_numpy(zero_copy_only=False)
            if lo is not None:
                ge = pc.greater_equal(vals, pa.scalar(lo))
                ok &= ge.fill_null(False).to_numpy(zero_copy_only=False)
            if hi is not None:
                le = pc.less_equal(vals, pa.scalar(hi))
                ok &= le.fill_null(False).to_numpy(zero_copy_only=False)
            mask &= ok
        for col, v in equals.items():
            eq = pc.equal(t.column(col), pa.scalar(v))
            mask &= eq.fill_null(False).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(mask))

    return ds.map_batches(residual, batch_format="pyarrow")
