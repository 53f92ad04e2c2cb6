"""window_over fuzzed against DuckDB's window engine — every kind, random
small frames, random layouts. DuckDB is the independent oracle: any
divergence in tie handling, frame semantics, or partition-edge behavior
fails the exact comparison (values are ints / single-division floats, so
no ulp slack is needed)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings, strategies as st

from recon_ray.functions.relational import window_over

SPECS = [
    ("row_number", None, "rn"),
    ("rank", None, "rk"),
    ("dense_rank", None, "dr"),
    ("percent_rank", None, "pr"),
    ("cume_dist", None, "cd"),
    ("running_sum", "v", "rs"),
    ("running_min", "v", "rmin"),
    ("running_max", "v", "rmax"),
    ("lag", "v", "lg"),
    ("lead", "v", "ld"),
    ("first_value", "v", "fv"),
    ("last_value", "v", "lv"),
    ("partition_sum", "v", "ps"),
    ("ntile", 3, "nt"),
]

SQL = """
SELECT id,
  row_number()    OVER w AS rn,
  rank()          OVER w AS rk,
  dense_rank()    OVER w AS dr,
  percent_rank()  OVER w AS pr,
  cume_dist()     OVER w AS cd,
  sum(v)  OVER (PARTITION BY g ORDER BY k, id ROWS UNBOUNDED PRECEDING) AS rs,
  min(v)  OVER (PARTITION BY g ORDER BY k, id ROWS UNBOUNDED PRECEDING) AS rmin,
  max(v)  OVER (PARTITION BY g ORDER BY k, id ROWS UNBOUNDED PRECEDING) AS rmax,
  lag(v)  OVER (PARTITION BY g ORDER BY k, id) AS lg,
  lead(v) OVER (PARTITION BY g ORDER BY k, id) AS ld,
  first_value(v) OVER (PARTITION BY g ORDER BY k, id) AS fv,
  last_value(v)  OVER (PARTITION BY g ORDER BY k, id
     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv,
  (sum(v) OVER (PARTITION BY g))::BIGINT AS ps,
  ntile(3) OVER (PARTITION BY g ORDER BY k, id) AS nt
FROM df
WINDOW w AS (PARTITION BY g ORDER BY k, id)
ORDER BY id
"""

rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),     # g
        st.integers(min_value=-5, max_value=5),    # k (ties likely)
        st.integers(min_value=-100, max_value=100),  # v
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(rows_st, st.integers(min_value=1, max_value=5))
def test_window_over_matches_duckdb(rows, parts):
    df = pd.DataFrame(rows, columns=["g", "k", "v"])
    df["id"] = np.arange(len(df), dtype=np.int64)

    # rank/percent_rank/cume_dist tie runs key on EVERY order column, so a
    # unique tie-break (id) makes Ray's definition coincide with SQL's
    # peer rows; ntile/lag/lead/first/last need the same total order
    got = (
        window_over(rd.from_pandas(df).repartition(parts), "g", ["k", "id"],
                    SPECS)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )

    want = duckdb.connect().execute(SQL).fetchdf()

    for _, _, name in SPECS:
        g = got[name]
        w = want[name]
        if name in ("lg", "ld"):
            # partition edges: NaN both sides
            assert g.isna().equals(w.isna()), name
            g, w = g.dropna(), w.dropna()
        np.testing.assert_array_equal(
            np.asarray(g, dtype="float64"),
            np.asarray(w, dtype="float64"),
            err_msg=name,
        )


NULL_SPECS = [
    ("first_value", "v", "fv"),
    ("last_value", "v", "lv"),
    ("lag", "v", "lg"),
    ("lead", "v", "ld"),
    ("ffill", "v", "ff"),
]

NULL_SQL = """
SELECT id,
  first_value(v) OVER w AS fv,
  last_value(v)  OVER (PARTITION BY g ORDER BY k, id
     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv,
  lag(v)  OVER w AS lg,
  lead(v) OVER w AS ld,
  last_value(v IGNORE NULLS) OVER (PARTITION BY g ORDER BY k, id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
FROM df
WINDOW w AS (PARTITION BY g ORDER BY k, id)
ORDER BY id
"""

null_rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),                    # g
        st.integers(min_value=-5, max_value=5),                   # k
        st.one_of(st.none(),
                  st.integers(min_value=-100, max_value=100)),    # v
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(null_rows_st, st.integers(min_value=1, max_value=5))
def test_window_value_kinds_respect_nulls(rows, parts):
    """SQL FIRST_VALUE/LAST_VALUE/LAG/LEAD respect NULLs: a NULL in the
    partition's boundary row IS the answer (regression for the pandas
    transform('first')/'last' skip-NaN divergence)."""
    df = pd.DataFrame(rows, columns=["g", "k", "v"])
    df["v"] = df["v"].astype("float64")  # None -> NaN
    df["id"] = np.arange(len(df), dtype=np.int64)

    got = (
        window_over(rd.from_pandas(df).repartition(parts), "g", ["k", "id"],
                    NULL_SPECS)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(NULL_SQL).fetchdf()

    for _, _, name in NULL_SPECS:
        g, w = got[name], want[name]
        assert list(g.isna()) == list(w.isna()), name
        np.testing.assert_array_equal(
            np.asarray(g.dropna(), dtype="float64"),
            np.asarray(w.dropna(), dtype="float64"),
            err_msg=name,
        )


ROLL_SPECS = [
    ("rolling_sum:3", "v", "r3s"),
    ("rolling_min:2", "v", "r2m"),
    ("rolling_max:4", "v", "r4x"),
]

ROLL_SQL = """
SELECT id,
  sum(v) OVER (PARTITION BY g ORDER BY k, id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS r3s,
  min(v) OVER (PARTITION BY g ORDER BY k, id
               ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS r2m,
  max(v) OVER (PARTITION BY g ORDER BY k, id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS r4x
FROM df ORDER BY id
"""


@settings(max_examples=12, deadline=None)
@given(rows_st, st.integers(min_value=1, max_value=5))
def test_window_rolling_frames_match_duckdb(rows, parts):
    """Bounded ROWS frames (rolling_sum/min/max:k) vs DuckDB."""
    df = pd.DataFrame(rows, columns=["g", "k", "v"])
    df["id"] = np.arange(len(df), dtype=np.int64)
    got = (
        window_over(rd.from_pandas(df).repartition(parts), "g", ["k", "id"],
                    ROLL_SPECS)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    want = duckdb.connect().execute(ROLL_SQL).fetchdf()
    for _, _, name in ROLL_SPECS:
        np.testing.assert_array_equal(
            np.asarray(got[name], dtype="float64"),
            np.asarray(want[name], dtype="float64"),
            err_msg=name,
        )
