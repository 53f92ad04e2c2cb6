"""partsupp generator invariants + TPC-H Q2/Q9/Q16/Q20 DuckDB parity at
sf0.001 (the full-surface oracle check runs these at sf0.01 too)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ps_path():
    from recon_ray.partsupp import ensure_partsupp

    return ensure_partsupp(SF)


def test_partsupp_shape_and_determinism(ps_path):
    t = pq.read_table(ps_path)
    part = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey"])
    assert t.num_rows == 4 * part.num_rows
    df = t.to_pandas()
    # exactly 4 DISTINCT suppliers per part
    per = df.groupby("ps_partkey")["ps_suppkey"].nunique()
    assert (per == 4).all()
    # attribute domains
    assert df["ps_availqty"].between(1, 9999).all()
    assert df["ps_supplycost_c"].between(100, 100000).all()
    assert (df["ps_supplycost"] == df["ps_supplycost_c"] / 100.0).all()
    # regeneration is byte-identical (hash the sorted frame)
    from recon_ray.partsupp import build_partsupp
    import numpy as np

    keys = np.sort(part.column("p_partkey").to_numpy())
    again = build_partsupp(keys, 10).to_pandas()
    pd.testing.assert_frame_equal(df, again)


@pytest.mark.parametrize("qname", [
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q16_supplier_part_counts",
    "q20_excess_stock",
])
def test_partsupp_queries_match_duckdb(ray_session, qname):
    from recon_ray.pipelines.queries import QUERIES, oracles_for

    got = QUERIES[qname](SF)
    sql = oracles_for(SF)[qname]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem"
              ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(sql).df()
    assert len(got) == len(want) > 0
    assert sorted(got.columns) == sorted(want.columns)
    a = got.reindex(sorted(got.columns), axis=1)
    b = want.reindex(sorted(want.columns), axis=1)
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    # raw string equality — the driver's canonicalization (int64 vs
    # HUGEINT-float must agree bytewise)
    pd.testing.assert_frame_equal(
        a.astype(str), b.astype(str), check_dtype=False)
