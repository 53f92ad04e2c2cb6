"""JSONL sources/sinks for annotated documents — the analogue of the
reference loaders (recon/loaders.py:18-55) and Dataset.to_disk JSONL
serialization (recon/dataset.py:422-425), re-expressed over Ray Data.

Record shape (the reference's Example model, recon/types.py:77-188):

    {"text": ..., "spans": [{"text"?, "start", "end", "label", ...}],
     "meta": {...} | str | list}

Validation semantics ported:
- span.text back-filled from text[start:end] when missing
  (recon/types.py:85-96);
- meta coerced to {"source": value} when str/list (recon/types.py:98-104);
- every row gets a ``doc_id`` (stable u64 of text+spans, the analogue of
  example_hash, recon/hashing.py:42-59).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data as rd

from recon_ray.hashing import stable_u64
from recon_ray.ops.mentions_io import mentions_list_array


def _validate_record(rec: dict) -> dict:
    text = rec.get("text", "")
    spans = []
    for s in rec.get("spans", []) or []:
        start, end = int(s["start"]), int(s["end"])
        stext = s.get("text")
        if stext is None:
            stext = text[start:end]
        spans.append(
            {
                "text": stext,
                "start": start,
                "end": end,
                "label": str(s.get("label", "")),
                "source": str(s.get("source") or ""),
            }
        )
    meta = rec.get("meta", {})
    if isinstance(meta, str):
        meta = {"source": meta}
    elif isinstance(meta, list):
        meta = {"source": json.dumps(meta)}
    elif meta is None:
        meta = {}
    return {"text": text, "spans": spans, "meta": meta}


def records_to_table(records: list[dict]) -> pa.Table:
    """Validated records → docs table (doc_id, text, meta_json, mentions)."""
    recs = [_validate_record(r) for r in records]
    lengths = np.array([len(r["spans"]) for r in recs], dtype=np.int64)
    flat = [s for r in recs for s in r["spans"]]
    mentions = mentions_list_array(
        lengths,
        np.array([s["text"] for s in flat], dtype=object),
        np.array([s["start"] for s in flat], dtype=np.int64),
        np.array([s["end"] for s in flat], dtype=np.int64),
        np.array([s["label"] for s in flat], dtype=object),
        np.array([s["source"] for s in flat], dtype=object),
    )
    doc_ids = np.array(
        [
            stable_u64(
                r["text"],
                *(f"{s['start']}:{s['end']}:{s['label']}:{s['text']}"
                  for s in r["spans"]),
            )
            for r in recs
        ],
        dtype=np.uint64,
    )
    t = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.uint64()),
            "text": pa.array([r["text"] for r in recs], pa.string()),
            "meta_json": pa.array(
                [json.dumps(r["meta"], sort_keys=True) for r in recs], pa.string()
            ),
        }
    )
    return t.append_column("mentions", mentions)


def read_jsonl_examples(path: str):
    """JSONL file(s) → docs Dataset. The parse+validate runs distributed
    (read_text → map_batches), not on the driver. ``.jsonl.gz`` inputs
    (a single file or a directory of gzip parts) decompress inside the
    read tasks via Arrow's stream codec — the driver never sees bytes."""
    import os

    gz = str(path).endswith(".gz")
    if not gz and os.path.isdir(path):
        names = os.listdir(path)
        gz_names = [n for n in names if n.endswith(".gz")]
        if gz_names and len(gz_names) == len(
                [n for n in names if not n.startswith(".")]):
            gz = True
    if gz:
        lines = rd.read_text(
            path, arrow_open_stream_args={"compression": "gzip"})
    else:
        lines = rd.read_text(path)

    def parse(batch: pa.Table) -> pa.Table:
        records = [json.loads(line) for line in batch.column("text").to_pylist()]
        return records_to_table(records)

    return lines.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


def write_jsonl_examples(docs_ds, path: str, compress: bool = False) -> None:
    """docs Dataset → JSONL directory. Each map task writes its own
    content-addressed part file (idempotent under Ray task retries — a
    retried task rewrites the same bytes to the same name), so the write
    is distributed; this Ray version has no Dataset.write_text sink.
    ``compress=True`` writes ``.jsonl.gz`` parts (gzip mtime pinned to 0
    so identical content compresses to identical bytes — the
    content-addressing survives)."""
    import gzip
    import hashlib
    import os

    from recon_ray.ops.mentions_io import mentions_parts

    os.makedirs(path, exist_ok=True)

    def serialize(batch: pa.Table) -> pa.Table:
        lengths, text, start, end, label, source = mentions_parts(batch)
        texts = batch.column("text").to_pylist()
        metas = (
            batch.column("meta_json").to_pylist()
            if "meta_json" in batch.column_names
            else ["{}"] * batch.num_rows
        )
        out = []
        pos = 0
        for i in range(batch.num_rows):
            spans = [
                {
                    "text": text[j],
                    "start": int(start[j]),
                    "end": int(end[j]),
                    "label": label[j],
                    "source": source[j],
                }
                for j in range(pos, pos + int(lengths[i]))
            ]
            pos += int(lengths[i])
            out.append(
                json.dumps(
                    {"text": texts[i], "spans": spans, "meta": json.loads(metas[i])},
                    sort_keys=True,
                )
            )
        payload = ("\n".join(out) + "\n").encode("utf-8")
        name = hashlib.sha256(payload).hexdigest()[:16]
        ext = ".jsonl.gz" if compress else ".jsonl"
        if compress:
            payload = gzip.compress(payload, 6, mtime=0)
        tmp = os.path.join(path, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(path, f"part-{name}{ext}"))
        return pa.table({"written": pa.array([len(out)], pa.int64())})

    docs_ds.map_batches(
        serialize, batch_format="pyarrow", zero_copy_batch=True
    ).count()
