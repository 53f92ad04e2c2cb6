"""CSV, Arrow-IPC and Apache ORC interchange — the formats everything
else in a data platform speaks (spreadsheets/legacy exports on one side,
Arrow Flight / Feather / pandas on the other, the Hive/Trino columnar
ecosystem on the third). Completes the §2.1 source/sink matrix next to
Parquet, JSONL, spaCy DocBin, Prodigy and N-Triples.

Both sinks follow the repo's distributed-part contract (sources/jsonl.py,
sources/ntriples.py): each map task serializes its own block and writes
ONE content-addressed part file via atomic rename, so a retried Ray task
rewrites identical bytes to the identical name and nothing ever collects
on the driver. Readers hand the file list to Ray's native readers
(`read_csv`) or stream-decode IPC payloads in a map stage.

CSV caveat, stated rather than hidden: CSV cannot distinguish NULL from
the empty string. The sink writes both as ``""``; pipelines that must
round-trip through CSV should coalesce nullable string columns first
(the oracled `interop_roundtrip` query does exactly that). IPC has no
such loss — it round-trips the Arrow schema bit-exact, which is why the
round-trip query pushes the SAME rows through BOTH formats and the gate
hashes the result against the original table.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.csv as pacsv


def _write_part(out_dir: str, payload: bytes, ext: str) -> str:
    name = f"part-{hashlib.sha256(payload).hexdigest()[:16]}{ext}"
    tmp = os.path.join(out_dir, f".{name}.tmp-{os.getpid()}")
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, os.path.join(out_dir, name))
    return name


def write_csv_shards(ds, out_dir: str) -> int:
    """Distributed CSV sink: RFC-4180 quoting via Arrow's csv writer
    (commas / quotes / newlines inside fields survive), one
    content-addressed ``part-*.csv`` per block, header in every part so
    each file stands alone. Returns rows written."""
    os.makedirs(out_dir, exist_ok=True)

    def serialize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"written": pa.array([0], pa.int64())})
        sink = pa.BufferOutputStream()
        pacsv.write_csv(t, sink)
        _write_part(out_dir, sink.getvalue().to_pybytes(), ".csv")
        return pa.table({"written": pa.array([t.num_rows], pa.int64())})

    parts = ds.map_batches(serialize, batch_format="pyarrow",
                           zero_copy_batch=True)
    return int(parts.sum("written") or 0)


def read_csv_shards(path: str, column_types: dict | None = None):
    """CSV directory → lazy Dataset via Ray's parallel CSV reader.
    ``column_types`` (name → pa.DataType) pins the schema — always pass
    it in pipelines; type inference on shards can disagree between
    files (the classic all-digits-in-this-shard trap)."""
    import ray.data

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".csv")
    )
    if not files:
        raise FileNotFoundError(f"no csv parts under {path}")
    convert = (
        pacsv.ConvertOptions(column_types=column_types)
        if column_types else None
    )
    kw = {"convert_options": convert} if convert else {}
    return ray.data.read_csv(files, **kw)


def write_ipc_shards(ds, out_dir: str) -> int:
    """Arrow IPC (Feather v2 stream) sink: schema-exact interchange —
    one content-addressed ``part-*.arrow`` per block. Returns rows
    written."""
    os.makedirs(out_dir, exist_ok=True)

    def serialize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"written": pa.array([0], pa.int64())})
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        _write_part(out_dir, sink.getvalue().to_pybytes(), ".arrow")
        return pa.table({"written": pa.array([t.num_rows], pa.int64())})

    parts = ds.map_batches(serialize, batch_format="pyarrow",
                           zero_copy_batch=True)
    return int(parts.sum("written") or 0)


def write_orc_shards(ds, out_dir: str) -> int:
    """Apache ORC sink (the Hive/Trino-ecosystem columnar format): one
    content-addressed ``part-*.orc`` per block via pyarrow's ORC writer
    (byte-deterministic — verified in tests — so the retry contract
    holds). Returns rows written."""
    import pyarrow.orc as paorc

    os.makedirs(out_dir, exist_ok=True)

    def serialize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"written": pa.array([0], pa.int64())})
        sink = pa.BufferOutputStream()
        paorc.write_table(t, sink)
        _write_part(out_dir, sink.getvalue().to_pybytes(), ".orc")
        return pa.table({"written": pa.array([t.num_rows], pa.int64())})

    parts = ds.map_batches(serialize, batch_format="pyarrow",
                           zero_copy_batch=True)
    return int(parts.sum("written") or 0)


def read_orc_shards(path: str):
    """ORC directory → lazy Dataset: raw part bytes read in parallel
    (`read_binary_files`), decoded per payload in a map stage — the ORC
    footer carries the schema, so like IPC there is no inference and no
    column_types knob."""
    import ray.data

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".orc")
    )
    if not files:
        raise FileNotFoundError(f"no orc parts under {path}")

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.orc as paorc

        tables = [
            paorc.ORCFile(pa.BufferReader(buf)).read()
            for buf in t.column("bytes").to_pylist()
        ]
        return pa.concat_tables(tables)

    return ray.data.read_binary_files(files).map_batches(
        decode, batch_format="pyarrow"
    )


def read_ipc_shards(path: str):
    """IPC directory → lazy Dataset: Ray reads the raw bytes of each
    part in parallel (`read_binary_files`), a map stage decodes each
    payload back into its Arrow table — schema travels inside the
    stream, so no inference and no column_types knob."""
    import ray.data

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".arrow")
    )
    if not files:
        raise FileNotFoundError(f"no ipc parts under {path}")

    def decode(t: pa.Table) -> pa.Table:
        tables = [
            pa.ipc.open_stream(pa.BufferReader(buf)).read_all()
            for buf in t.column("bytes").to_pylist()
        ]
        return pa.concat_tables(tables)

    return ray.data.read_binary_files(files).map_batches(
        decode, batch_format="pyarrow"
    )
