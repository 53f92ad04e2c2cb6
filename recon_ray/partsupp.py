"""Deterministic synthetic ``partsupp`` table (TPC-H shape), cached under
/tmp like the KG fixtures so oracle SQL can ``read_parquet('<path>')``.

The driver's testdata lacks partsupp, which left TPC-H Q2/Q9/Q16/Q20
inexpressible (SURVEY §8).  This derives it deterministically from the
sf_dir's part + supplier tables — no external data — using the TPC-H
supplier-distribution rule (4 suppliers per part, spread so every
supplier carries parts from the whole key range; dbgen's stride formula
degenerates at fixture-scale S, so a rotated consecutive window keeps
the 4-distinct guarantee for any S ≥ 4):

    ps_suppkey(part, i) = (part * 7 + (part - 1) / S + i) % S + 1

``ps_availqty`` (1..9999) and ``ps_supplycost_c`` (integer CENTS,
100..100000 → $1.00..$1000.00) come from a stable hash of the key pair,
so the same sf_dir always yields a byte-identical table.  Costs are
generated in integer cents (the repo-wide exact-arithmetic convention);
a derived ``ps_supplycost`` DOUBLE column is included for oracles that
want dollars.

At 100 TB this table would be produced as a ``map_batches`` over the
part table (each batch emits its 4·rows supplier assignments — pure
per-row math, no shuffle); the driver-side generation here mirrors that
batch kernel at fixture scale.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PARTSUPP_VERSION = "v1"
SUPPLIERS_PER_PART = 4


def partsupp_path(sf_dir: str) -> str:
    from recon_ray.fixtures import sf_name

    return (f"/tmp/recon_ray_fixtures/partsupp_{PARTSUPP_VERSION}/"
            f"{sf_name(sf_dir)}/partsupp.parquet")


def build_partsupp(part_keys: np.ndarray, n_suppliers: int) -> pa.Table:
    """Vectorized dbgen-style assignment — this is the per-batch kernel
    a distributed generation would run inside map_batches."""
    from recon_ray.hashing import stable_u64

    s = int(n_suppliers)
    pk = np.repeat(np.asarray(part_keys, dtype=np.int64),
                   SUPPLIERS_PER_PART)
    i = np.tile(np.arange(SUPPLIERS_PER_PART, dtype=np.int64),
                len(part_keys))
    sk = (pk * 7 + (pk - 1) // s + i) % s + 1
    # per-pair deterministic attributes: one 64-bit hash drives both
    seed = np.fromiter(
        (stable_u64("partsupp", int(p), int(q)) for p, q in zip(pk, sk)),
        dtype=np.uint64, count=len(pk))
    availqty = (seed % np.uint64(9999)).astype(np.int64) + 1
    supplycost_c = ((seed >> np.uint64(16)) % np.uint64(99901)
                    ).astype(np.int64) + 100
    return pa.table({
        "ps_partkey": pa.array(pk, pa.int64()),
        "ps_suppkey": pa.array(sk, pa.int64()),
        "ps_availqty": pa.array(availqty, pa.int64()),
        "ps_supplycost_c": pa.array(supplycost_c, pa.int64()),
        "ps_supplycost": pa.array(supplycost_c / 100.0, pa.float64()),
    })


def ensure_partsupp(sf_dir: str) -> str:
    """Idempotent: generate once per sf, return the parquet path."""
    path = partsupp_path(sf_dir)
    if os.path.exists(path):
        return path
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey"])
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey"])
    keys = np.sort(part.column("p_partkey").to_numpy())
    table = build_partsupp(keys, supp.num_rows)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)  # atomic publish, safe under concurrency
    return path
