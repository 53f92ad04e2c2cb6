"""Resumable key-partitioned Parquet sink — skip/recompute semantics."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import ray.data as rd

from recon_ray.sources.partitioned import (
    read_partitioned,
    write_partitioned,
)


def _df(n=300, seed=1):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {"lang": rng.choice(["en", "de", "fr"], n),
         "doc_id": np.arange(n),
         "v": rng.randint(0, 1000, n)}
    )


def _sorted(df):
    return df.sort_values("doc_id").reset_index(drop=True)


def test_write_read_round_trip(tmp_path):
    df = _df()
    out = str(tmp_path / "o")
    res = write_partitioned(rd.from_pandas(df).repartition(5), out, "lang")
    assert sorted(res["written"]) == ["de", "en", "fr"]
    assert res["n_rows"] == len(df)
    back = read_partitioned(out, "lang").to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(back)[["lang", "doc_id", "v"]], _sorted(df)
    )


def test_resume_skips_completed(tmp_path):
    df = _df(seed=2)
    out = str(tmp_path / "o")
    ds = rd.from_pandas(df).repartition(4)
    write_partitioned(ds, out, "lang")

    # blow away one partition → only it is rewritten
    shutil.rmtree(os.path.join(out, "lang=de"))
    res = write_partitioned(ds, out, "lang")
    assert res["written"] == ["de"]
    assert res["skipped"] == ["en", "fr"]
    back = read_partitioned(out, "lang").to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(back)[["lang", "doc_id", "v"]], _sorted(df)
    )


def test_changed_args_recompute_all(tmp_path):
    df = _df(seed=3)
    out = str(tmp_path / "o")
    ds = rd.from_pandas(df).repartition(3)
    write_partitioned(ds, out, "lang", args={"v": 1})
    res = write_partitioned(ds, out, "lang", args={"v": 2})
    assert sorted(res["written"]) == ["de", "en", "fr"]
    assert res["skipped"] == []


def test_partial_crash_dir_is_recomputed(tmp_path):
    df = _df(seed=4)
    out = str(tmp_path / "o")
    ds = rd.from_pandas(df).repartition(3)
    write_partitioned(ds, out, "lang")
    # simulate a crash: data present but manifest (written LAST) missing
    os.remove(os.path.join(out, "lang=en", "manifest.json"))
    res = write_partitioned(ds, out, "lang")
    assert res["written"] == ["en"]


def test_empty_dataset(tmp_path):
    ds = rd.from_pandas(
        pd.DataFrame({"lang": pd.Series([], dtype="object"),
                      "doc_id": pd.Series([], dtype="int64"),
                      "v": pd.Series([], dtype="int64")})
    )
    res = write_partitioned(ds, str(tmp_path / "o"), "lang")
    assert res == {"written": [], "skipped": [], "n_rows": 0}


def test_partition_values_with_slash_are_safe(tmp_path):
    df = pd.DataFrame({"lang": ["zh/TW", "en", "zh/TW"],
                       "doc_id": [1, 2, 3], "v": [1, 2, 3]})
    out = str(tmp_path / "o")
    res = write_partitioned(rd.from_pandas(df), out, "lang")
    assert sorted(res["written"]) == ["en", "zh/TW"]
    back = read_partitioned(out, "lang").to_pandas()
    assert sorted(back["lang"].tolist()) == ["en", "zh/TW", "zh/TW"]
    # second run skips both
    res2 = write_partitioned(rd.from_pandas(df), out, "lang")
    assert res2["written"] == [] and sorted(res2["skipped"]) == ["en", "zh/TW"]
