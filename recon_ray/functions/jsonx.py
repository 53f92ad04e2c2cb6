"""JSON column extraction — the semi-structured half of an event-log
pipeline: pull typed fields out of a JSON-string column (`events.props`
style) as a streaming `map_batches` stage, so downstream relational
operators see plain Arrow columns.

Reference parity: the reference stores free-form per-example metadata in
``Example.meta``/``data`` dicts (reference `recon/types.py` Example
fields) and coerces them on load; here the same "opaque payload → typed
columns" step is a distributed stage over a JSON string column.

Scale shape: stateless `map_batches` — no shuffle, no driver state; the
decoder is `json.loads` per record (JSON decode is inherently
per-record; the C-accelerated stdlib decoder runs inside one batch
callback, not one Python call per row of the driver). Column assembly
and type coercion are vectorized pandas casts. Malformed JSON or a
missing field yields NULL (never a crash): the 100-TB contract is that
dirty records degrade to NULLs you can filter, not task retries.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

#: supported target dtypes → (pandas nullable dtype, python caster)
_CASTS = {
    "int64": ("Int64", int),
    "float64": ("Float64", float),
    "string": ("string", str),
    "bool": ("boolean", bool),
}


def make_json_extractor(
    col: str,
    fields: dict[str, str],
    keep: list[str] | None = None,
    prefix: str = "",
):
    """Build a `map_batches(fn, batch_format="pandas")` stage that parses
    the JSON strings in ``col`` and emits one typed column per entry of
    ``fields`` (name → dtype in {int64, float64, string, bool}).

    ``keep`` lists pass-through columns (default: everything but
    ``col``); extracted columns are named ``prefix + field``. Top-level
    fields only — nested payloads stay opaque (extract a `string` field
    and run a second extractor if a sub-object is needed).
    """
    for f, t in fields.items():
        if t not in _CASTS:
            raise ValueError(f"unsupported dtype {t!r} for field {f!r}")

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.drop(columns=[col])
            if keep is None
            else batch[list(keep)].copy()
        )
        n = len(batch)
        raw: list[dict] = []
        for s in batch[col]:
            try:
                v = json.loads(s) if isinstance(s, str) else None
                raw.append(v if isinstance(v, dict) else None)
            except (ValueError, TypeError):
                raw.append(None)
        for f, t in fields.items():
            dtype, caster = _CASTS[t]
            vals: list = [None] * n
            for i, d in enumerate(raw):
                if d is None:
                    continue
                v = d.get(f)
                if v is None:
                    continue
                try:
                    vals[i] = caster(v)
                except (ValueError, TypeError):
                    vals[i] = None
            out[prefix + f] = pd.array(vals, dtype=dtype)
        return out

    return extract


def json_extract_cols(ds, col: str, fields: dict[str, str], **kw):
    """`ds` with ``col`` replaced by typed columns per ``fields`` — see
    `make_json_extractor` for semantics."""
    return ds.map_batches(
        make_json_extractor(col, fields, **kw), batch_format="pandas"
    )
