"""Expectations suite (functions/validate.py) against planted
violations, replayed in DuckDB per rule."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
import ray.data as rd

from recon_ray.functions.validate import check_expectations


@pytest.fixture()
def dirty(ray_session):
    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 5, 7, 8],
        "v": [10.0, -3.0, 55.0, None, 120.0, 40.0, 7.5, 99.9],
        "cat": ["a", "b", "zz", None, "a", "b", "a", "q"],
        "code": ["X1", "X2", "bad", "X9", None, "X0", "also bad", "X3"],
        # nullable Int64: the fk rule joins on Arrow types, and a float64
        # FK column (pandas' None-coercion) cannot hash-join an int64 key
        "ref": pd.array([100, 101, 102, None, 999, 100, 101, 102],
                        dtype="Int64"),
    })
    refs = pd.DataFrame({"k": [100, 101, 102, 103]})
    return df, refs


def test_rules_match_duckdb(dirty):
    df, refs = dirty
    rules = [
        {"kind": "not_null", "col": "v"},
        {"kind": "range", "col": "v", "lo": 0.0, "hi": 100.0},
        {"kind": "accepted", "col": "cat", "values": ["a", "b"]},
        {"kind": "regex", "col": "code", "pattern": "^X[0-9]$"},
        {"kind": "unique", "col": "id"},
        {"kind": "fk", "col": "ref", "ref": "refs", "ref_col": "k"},
    ]
    got = check_expectations(
        rd.from_pandas(df).repartition(3), rules,
        refs={"refs": rd.from_pandas(refs)},
    )
    con = duckdb.connect()
    con.register("df", df)
    con.register("refs", refs)
    want = con.execute(r"""
SELECT rule, violations, n_checked FROM (VALUES
 ('accepted.cat',
  (SELECT count(*) FROM df WHERE cat IS NOT NULL
     AND cat NOT IN ('a','b')), (SELECT count(cat) FROM df)),
 ('fk.ref',
  (SELECT count(*) FROM df WHERE ref IS NOT NULL
     AND NOT EXISTS (SELECT 1 FROM refs WHERE k = df.ref)),
  (SELECT count(ref) FROM df)),
 ('not_null.v', (SELECT count(*) FROM df WHERE v IS NULL),
  (SELECT count(*) FROM df)),
 ('range.v',
  (SELECT count(*) FROM df WHERE v IS NOT NULL AND (v < 0 OR v > 100)),
  (SELECT count(v) FROM df)),
 ('regex.code',
  (SELECT count(*) FROM df WHERE code IS NOT NULL
     AND NOT regexp_matches(code, '^X[0-9]$')),
  (SELECT count(code) FROM df)),
 ('unique.id', (SELECT count(id) - count(DISTINCT id) FROM df),
  (SELECT count(id) FROM df))
) t(rule, violations, n_checked) ORDER BY rule
""").fetchdf()
    assert list(got["rule"]) == list(want["rule"])
    assert list(got["violations"].astype("int64")) == list(
        want["violations"].astype("int64"))
    assert list(got["n_checked"].astype("int64")) == list(
        want["n_checked"].astype("int64"))
    # the planted data actually violates: every rule but none is trivial
    assert got["violations"].sum() > 0
    assert (got.loc[got.rule == "fk.ref", "violations"] == 1).all()


def test_duplicate_rule_ids_rejected(dirty):
    df, _ = dirty
    with pytest.raises(ValueError, match="duplicate rule ids"):
        check_expectations(
            rd.from_pandas(df),
            [{"kind": "not_null", "col": "v"},
             {"kind": "not_null", "col": "v"}],
        )
