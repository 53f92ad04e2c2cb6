"""Mini SQL front-end (recon_ray/sql.py) differentially fuzzed against
DuckDB executing the IDENTICAL string on the identical table — grouped
aggregates with NULL keys/values, conjunctive WHERE, global aggregates,
projections, ORDER BY + LIMIT, and the parser's rejection surface."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd
from hypothesis import given, settings, strategies as st

from recon_ray.sql import SqlError, parse_sql, run_sql

GROUPED_Q = ("SELECT g, count(*) AS n, count(v) AS cv, sum(v) AS sv, "
             "min(v) AS mv, max(v) AS xv, avg(v) AS av FROM t{where} "
             "GROUP BY g")

WHERES = ["", " WHERE h >= 1", " WHERE v < 10 AND h <> 2",
          " WHERE g = 'x'", " WHERE v >= -5 AND v <= 25",
          " WHERE v BETWEEN -10 AND 20 AND h IN (0, 2)",
          " WHERE g IN ('x', 'y') AND v IS NOT NULL",
          " WHERE v IS NULL", " WHERE h NOT IN (1, 3)",
          " WHERE v BETWEEN 0 AND 30 AND g IS NOT NULL AND h <= 2"]


def _mk_df(rows):
    return pd.DataFrame(
        {"g": pd.Series([r[0] for r in rows], dtype=object),
         "h": pd.Series([r[1] for r in rows], dtype="int64"),
         "v": pd.Series([r[2] for r in rows], dtype="Float64")}
    )


def _exec_both(sql, df, parts):
    got = run_sql(sql, {"t": rd.from_pandas(df).repartition(parts)})
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(sql).fetchdf()
    return got, want


def _cmp_sorted(got, want, float_cols=()):
    assert list(got.columns) == list(want.columns)
    key = [c for c in got.columns if c not in float_cols]
    g = got.sort_values(key, na_position="last").reset_index(drop=True) \
        if key else got
    w = want.sort_values(key, na_position="last").reset_index(drop=True) \
        if key else want
    assert len(g) == len(w)
    for c in got.columns:
        gv, wv = g[c], w[c]
        assert list(gv.isna()) == list(wv.isna()), c
        if c in float_cols:
            assert np.allclose(gv.dropna().astype(float),
                               wv.dropna().astype(float)), c
        else:
            assert list(gv.dropna()) == list(wv.dropna()), c


rows_st = st.lists(
    st.tuples(
        st.sampled_from(["x", "y", None]),
        st.integers(0, 3),
        st.one_of(st.none(), st.integers(-50, 50)),
    ),
    min_size=1, max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(rows_st, st.sampled_from(WHERES),
       st.integers(min_value=1, max_value=4))
def test_grouped_aggregates_match_duckdb(rows, where, parts):
    df = _mk_df(rows)
    sql = GROUPED_Q.format(where=where)
    got, want = _exec_both(sql, df, parts)
    _cmp_sorted(got, want, float_cols=("sv", "av", "mv", "xv"))


@settings(max_examples=10, deadline=None)
@given(rows_st, st.sampled_from(WHERES),
       st.integers(min_value=1, max_value=4))
def test_global_aggregates_match_duckdb(rows, where, parts):
    df = _mk_df(rows)
    sql = ("SELECT count(*) AS n, count(v) AS cv, sum(v) AS sv, "
           "avg(v) AS av FROM t" + where)
    got, want = _exec_both(sql, df, parts)
    assert len(got) == 1 == len(want)
    _cmp_sorted(got, want, float_cols=("sv", "av"))


@settings(max_examples=8, deadline=None)
@given(rows_st, st.integers(min_value=1, max_value=4))
def test_projection_and_order_limit(rows, parts):
    df = _mk_df(rows)
    got, want = _exec_both("SELECT h, v FROM t WHERE h >= 1", df, parts)
    _cmp_sorted(got, want, float_cols=("v",))
    # unique order key -> deterministic LIMIT boundary
    df2 = df.assign(k=np.arange(len(df), dtype=np.int64))
    sql = ("SELECT k, count(*) AS n FROM t GROUP BY k "
           "ORDER BY k DESC LIMIT 3")
    got, want = _exec_both(sql, df2, parts)
    assert list(got["k"]) == list(want["k"])
    assert list(got["n"].astype("int64")) == list(want["n"])


def test_parser_rejects_out_of_scope():
    for bad in [
        "SELECT a FROM t JOIN u ON a = b",
        "SELECT a, sum(v) FROM t",                    # agg+raw, no group
        "SELECT sum(v) FROM t GROUP BY a ORDER BY zz",
        "SELECT * FROM t",
        "SELECT a FROM t WHERE v = 1 OR v = 2",
        "DELETE FROM t",
        "SELECT min(*) FROM t",
    ]:
        with pytest.raises(SqlError):
            parse_sql(bad)


def test_string_literals_and_escapes(ray_session):
    df = pd.DataFrame({"s": ["it's", "plain", None], "v": [1, 2, 3]})
    got = run_sql("SELECT v FROM t WHERE s = 'it''s'",
                  {"t": rd.from_pandas(df)})
    assert list(got["v"]) == [1]


@settings(max_examples=10, deadline=None)
@given(rows_st, st.integers(min_value=1, max_value=4))
def test_distinct_countdistinct_having(rows, parts):
    df = _mk_df(rows)
    # SELECT DISTINCT
    got, want = _exec_both("SELECT DISTINCT g, h FROM t", df, parts)
    _cmp_sorted(got, want)
    # count(DISTINCT v) grouped + HAVING on an alias
    sql = ("SELECT g, count(*) AS n, count(distinct v) AS dv "
           "FROM t GROUP BY g HAVING n >= 2")
    got, want = _exec_both(sql, df, parts)
    _cmp_sorted(got, want)
    # global count(distinct)
    got, want = _exec_both(
        "SELECT count(distinct v) AS dv, count(distinct g) AS dg FROM t",
        df, parts)
    assert list(got["dv"]) == list(want["dv"])
    assert list(got["dg"]) == list(want["dg"])
