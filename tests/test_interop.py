"""CSV / Arrow-IPC interchange (sources/interop.py): hostile-string
round-trips, IPC schema exactness, the documented NULL→'' CSV edge, and
the CLI convert verbs."""

from __future__ import annotations

import os
import subprocess
import sys

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from recon_ray.sources.interop import (
    read_csv_shards,
    read_ipc_shards,
    write_csv_shards,
    write_ipc_shards,
)

NASTY = [
    'plain',
    'comma, inside',
    'quote " inside',
    'both ", and"" again',
    'newline\ninside',
    'tab\tinside',
    'unicode — naïve 日本語 🚀',
    '{"json": ["a,b", "c\\"d"]}',
    '',
]


@pytest.fixture()
def nasty_df():
    return pd.DataFrame({
        "id": range(len(NASTY)),
        "txt": NASTY,
        "val": [i * 1.5 for i in range(len(NASTY))],
    })


def test_csv_roundtrip_hostile_strings(tmp_path, ray_session, nasty_df):
    d = str(tmp_path / "csv")
    n = write_csv_shards(rd.from_pandas(nasty_df).repartition(3), d)
    assert n == len(nasty_df)
    got = read_csv_shards(d, column_types={
        "id": pa.int64(), "txt": pa.string(), "val": pa.float64()}
    ).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, nasty_df.reset_index(drop=True))


def test_ipc_roundtrip_schema_exact(tmp_path, ray_session, nasty_df):
    d = str(tmp_path / "ipc")
    n = write_ipc_shards(rd.from_pandas(nasty_df).repartition(3), d)
    assert n == len(nasty_df)
    back = read_ipc_shards(d)
    assert [str(t) for t in back.schema().types] == [
        "int64", "string", "double"]
    got = back.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, nasty_df.reset_index(drop=True))


def test_csv_null_becomes_empty_string(tmp_path, ray_session):
    """The documented CSV loss: NULL and '' both serialize as '' — a
    pinned behavior, not a surprise."""
    df = pd.DataFrame({"id": [0, 1], "txt": [None, ""]})
    d = str(tmp_path / "csvnull")
    write_csv_shards(rd.from_pandas(df), d)
    got = read_csv_shards(d, column_types={
        "id": pa.int64(), "txt": pa.string()}
    ).to_pandas().sort_values("id")
    assert list(got["txt"]) == ["", ""]


def test_write_is_idempotent_per_content(tmp_path, ray_session, nasty_df):
    d = str(tmp_path / "idem")
    write_ipc_shards(rd.from_pandas(nasty_df), d)
    first = sorted(os.listdir(d))
    write_ipc_shards(rd.from_pandas(nasty_df), d)
    assert sorted(os.listdir(d)) == first  # same bytes → same part names


def test_cli_convert_parquet_csv_ipc(tmp_path, ray_session, nasty_df):
    src = str(tmp_path / "src.parquet")
    nasty_df.to_parquet(src)
    env = {**os.environ, "RAY_ADDRESS": "local"}
    d_csv, d_ipc, back = (str(tmp_path / x) for x in
                          ("csv", "ipc", "back"))
    for pair, s, dst in [("parquet-to-csv", src, d_csv),
                         ("parquet-to-ipc", src, d_ipc),
                         ("ipc-to-parquet", d_ipc, back)]:
        r = subprocess.run(
            [sys.executable, "-m", "recon_ray", "convert", pair, s, dst],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300)
        assert r.returncode == 0, r.stderr[-500:]
        assert '"rows"' in r.stdout
    got = pd.read_parquet(back).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, nasty_df.reset_index(drop=True))


def test_orc_roundtrip_schema_exact(tmp_path, ray_session, nasty_df):
    from recon_ray.sources.interop import read_orc_shards, write_orc_shards

    d = str(tmp_path / "orc")
    n = write_orc_shards(rd.from_pandas(nasty_df).repartition(3), d)
    assert n == len(nasty_df)
    back = read_orc_shards(d)
    assert [str(t) for t in back.schema().types] == [
        "int64", "string", "double"]
    got = back.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, nasty_df.reset_index(drop=True))


def test_orc_nulls_survive_and_writes_idempotent(tmp_path, ray_session):
    """Unlike CSV, ORC keeps NULL distinct from '' — and the serialized
    bytes are deterministic, so the content-addressed retry contract
    holds (same bytes → same part names on a re-run)."""
    from recon_ray.sources.interop import read_orc_shards, write_orc_shards

    df = pd.DataFrame({"id": [0, 1, 2], "txt": [None, "", "x"],
                       "val": [None, 1.5, 2.5]})
    d = str(tmp_path / "orcnull")
    write_orc_shards(rd.from_pandas(df), d)
    first = sorted(os.listdir(d))
    write_orc_shards(rd.from_pandas(df), d)
    assert sorted(os.listdir(d)) == first
    got = read_orc_shards(d).to_pandas().sort_values("id").reset_index(
        drop=True)
    assert got["txt"].isna().tolist() == [True, False, False]
    assert list(got["txt"][1:]) == ["", "x"]
    assert got["val"].isna().tolist() == [True, False, False]


def test_cli_convert_parquet_orc(tmp_path, ray_session, nasty_df):
    src = str(tmp_path / "src.parquet")
    nasty_df.to_parquet(src)
    env = {**os.environ, "RAY_ADDRESS": "local"}
    d_orc, back = str(tmp_path / "orc"), str(tmp_path / "back")
    for pair, s, dst in [("parquet-to-orc", src, d_orc),
                         ("orc-to-parquet", d_orc, back)]:
        r = subprocess.run(
            [sys.executable, "-m", "recon_ray", "convert", pair, s, dst],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300)
        assert r.returncode == 0, r.stderr[-500:]
        assert '"rows"' in r.stdout
    got = pd.read_parquet(back).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, nasty_df.reset_index(drop=True))


# ---------------------------------------------------------------------------
# Schema-evolution Parquet reader (sources/evolve.py)
# ---------------------------------------------------------------------------


def _write_pq(path, **cols):
    import pyarrow.parquet as pq

    pq.write_table(pa.table(cols), str(path))


def test_unify_schemas_promotion():
    from recon_ray.sources.evolve import unify_schemas

    s1 = pa.schema([("a", pa.int32()), ("b", pa.string())])
    s2 = pa.schema([("a", pa.int64()), ("c", pa.float32())])
    s3 = pa.schema([("c", pa.int64()), ("d", pa.null())])
    u = unify_schemas([s1, s2, s3])
    assert u.names == ["a", "b", "c", "d"]  # first-seen order
    assert u.field("a").type == pa.int64()      # int widen
    assert u.field("c").type == pa.float64()    # float wins the pair
    assert u.field("d").type == pa.null()
    # string vs int is a migration, not a cast
    with pytest.raises(ValueError, match="promote"):
        unify_schemas([pa.schema([("x", pa.string())]),
                       pa.schema([("x", pa.int64())])])


def test_read_parquet_evolved_union_fill_promote(tmp_path, ray_session):
    from recon_ray.sources.evolve import read_parquet_evolved

    _write_pq(tmp_path / "v0.parquet",
              k=pa.array([1, 2], pa.int64()),
              a=pa.array([10, 20], pa.int32()))
    _write_pq(tmp_path / "v1.parquet",
              a=pa.array([30], pa.int64()),   # widened + reordered
              k=pa.array([3], pa.int64()),
              tag=pa.array(["x"], pa.string()))
    ds = read_parquet_evolved(str(tmp_path))
    sch = ds.schema()
    assert sch.names == ["k", "a", "tag"]
    df = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert df["a"].tolist() == [10, 20, 30]
    assert df["tag"].isna().tolist() == [True, True, False]
    # pruning: a group carrying NONE of the requested columns still
    # contributes its rows as typed nulls
    only_tag = read_parquet_evolved(str(tmp_path), columns=["tag"])
    t = only_tag.to_pandas()
    assert len(t) == 3 and t["tag"].notna().sum() == 1
    with pytest.raises(ValueError, match="not in unified"):
        read_parquet_evolved(str(tmp_path), columns=["nope"])
    with pytest.raises(FileNotFoundError):
        read_parquet_evolved(str(tmp_path / "empty"))
