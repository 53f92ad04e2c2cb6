"""Local replica of the driver's correctness gate: run every queries()
entry AND its oracle_sql() side-by-side, compare row count, schema (column
names), and order-insensitive value hash — under TWO canonicalization
modes: the repo's float-normalizing one AND a raw ``str()`` mode that
replays the driver's round-2 failure (DuckDB HUGEINT → pandas
float64/object stringifies as ``"1234.0"`` while the engine's int64 gives
``"1234"``). A query passes only if both hashes match. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "partsupp",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame, raw: bool = False) -> str:
    """Order-insensitive: sort columns by name, canonicalize values, sort
    rows, hash. ``raw=True`` stringifies every value with bare ``str()``
    (the driver's canonicalization) — no float normalization, so a
    HUGEINT-induced float64 column hashes differently than int64."""
    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if pd.isna(v):
            return "NA"
        if raw:
            return str(v)
        if isinstance(v, float):
            return f"{v:.6f}".rstrip("0").rstrip(".")
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    rows = sorted(
        "|".join(canon(v) for v in row) for row in df.itertuples(index=False)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    # oracles resolved for THIS sf_dir (the driver uses its own fixed
    # sf; locally the partsupp paths must match the sf under test)
    from recon_ray.pipelines.queries import oracles_for

    oracles = oracles_for(sf_dir)

    con = duckdb.connect()
    for t in TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems:
            # both hash modes always run (a normalized miss must not
            # mask the raw/driver-mode result), and either kind of
            # mismatch prints the first differing row
            if value_hash(got) != value_hash(want):
                problems.append("value-hash mismatch")
            if value_hash(got, raw=True) != value_hash(want, raw=True):
                problems.append(
                    "RAW-str value-hash mismatch (driver mode)")
            if problems:
                a = got.reindex(sorted(got.columns), axis=1)
                b = want.reindex(sorted(want.columns), axis=1)
                a = a.sort_values(list(a.columns)).reset_index(drop=True)
                b = b.sort_values(list(b.columns)).reset_index(drop=True)
                try:
                    neq = (a.astype(str) != b.astype(str)).any(axis=1)
                    if neq.any():
                        i = neq.idxmax()
                        problems.append(
                            f"first diff row {i}: "
                            f"got={a.iloc[i].tolist()} "
                            f"want={b.iloc[i].tolist()}"
                        )
                except Exception:
                    pass
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"pass  {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
