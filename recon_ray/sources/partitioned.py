"""Generic resumable key-partitioned Parquet sink — the "resumable
output" contract (one directory per key, never one giant file) as a
REUSABLE utility, generalizing the KG runner's shard manifests
(state/runner.py) to any Dataset + partition column.

Layout:  out_dir/{col}={value}/data.parquet + manifest.json

Resume semantics mirror recon/dataset.py:353-381 (and state/lineage.py):
a partition is skipped iff its manifest says COMPLETED *and* its
``args_hash`` matches the current run's configuration; output lands in a
temp dir renamed atomically and the manifest is written LAST, so a crash
mid-partition leaves no COMPLETED marker and the next run redoes exactly
the unfinished keys.

Scale shape: ONE pass discovers the distinct keys (per-batch combiner +
tiny groupby), ONE hash shuffle co-locates each pending key's rows, and
each partition writes from the task that owns it — the driver only ever
sees key names and counts. The partition column must be low-cardinality
(lang / source / date / shard bucket — the things you partition 100 TB
by); for row-unique keys you want the runner's fixed-width shards
instead.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pandas as pd

from recon_ray.state.lineage import COMPLETED, args_hash_for


def _part_dir(out_dir: str, col: str, value) -> str:
    # hive-style percent-encoding: a value containing '/', '..' or '=' must
    # not nest/escape directories or break the `col=` prefix scan
    from urllib.parse import quote

    return os.path.join(out_dir, f"{col}={quote(str(value), safe='')}")


def _manifest(part_dir: str) -> dict | None:
    p = os.path.join(part_dir, "manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def partition_complete(part_dir: str, args_hash: str) -> bool:
    m = _manifest(part_dir)
    return bool(m) and m["status"] == COMPLETED and m["args_hash"] == args_hash


def write_partitioned(
    ds,
    out_dir: str,
    partition_col: str,
    args: dict | None = None,
) -> dict:
    """Write ``ds`` as ``out_dir/{partition_col}={v}/data.parquet``,
    skipping partitions already COMPLETED with the same ``args``.
    Returns {"written": [values], "skipped": [values], "n_rows": int}."""
    from recon_ray.functions.relational import group_count, semi_join

    os.makedirs(out_dir, exist_ok=True)
    a_hash = args_hash_for(args or {})

    counts = group_count(ds, partition_col)  # combiner pass; tiny result
    if len(counts) == 0:
        return {"written": [], "skipped": [], "n_rows": 0}
    values = counts[partition_col].tolist()
    pending = [
        v for v in values
        if not partition_complete(_part_dir(out_dir, partition_col, v), a_hash)
    ]
    skipped = [v for v in values if v not in set(pending)]
    if not pending:
        return {"written": [], "skipped": skipped,
                "n_rows": int(counts["count"].sum())}

    sub = semi_join(ds, set(pending), on=partition_col)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        v = g[partition_col].iloc[0]
        part_dir = _part_dir(out_dir, partition_col, v)
        tmp = tempfile.mkdtemp(prefix=".tmp-part-", dir=out_dir)
        try:
            g.reset_index(drop=True).to_parquet(
                os.path.join(tmp, "data.parquet"), index=False
            )
            # manifest LAST, inside the temp dir, then one atomic rename
            with open(os.path.join(tmp, "manifest.json"), "w") as f:
                json.dump(
                    {"status": COMPLETED, "args_hash": a_hash,
                     "n_rows": int(len(g)), "value": str(v)}, f
                )
            shutil.rmtree(part_dir, ignore_errors=True)
            os.rename(tmp, part_dir)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return pd.DataFrame({partition_col: [v], "n_rows": [len(g)]})

    written = (
        sub.groupby(partition_col)
        .map_groups(write_group, batch_format="pandas")
        .to_pandas()
    )
    return {
        "written": sorted(written[partition_col].tolist()),
        "skipped": sorted(skipped),
        "n_rows": int(counts["count"].sum()),
    }


def read_partitioned(out_dir: str, partition_col: str):
    """Read back a write_partitioned layout as one Dataset (the partition
    value column is restored from each directory name's manifest)."""
    import ray.data as rd

    paths = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if name.startswith(f"{partition_col}=") and _manifest(d):
            paths.append(os.path.join(d, "data.parquet"))
    if not paths:
        raise FileNotFoundError(f"no completed partitions under {out_dir}")
    return rd.read_parquet(paths)
