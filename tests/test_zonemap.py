"""Zone-map layout (sources/zonemap.py): Morton key parity vs a per-row
reference, real file skipping on a clustered grid, result equality vs
in-memory filtering, schema-correct all-pruned reads, and rewrite
idempotence (content-addressed parts)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from recon_ray.sources.zonemap import (
    prune_files,
    read_zonemapped,
    write_zonemapped,
    zvalue,
)


def _zvalue_ref(x: int, y: int, bits: int = 21) -> int:
    x = min(max(int(x), 0), (1 << bits) - 1)
    y = min(max(int(y), 0), (1 << bits) - 1)
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zvalue_matches_per_row_reference():
    rng = np.random.RandomState(7)
    xs = rng.randint(0, 1 << 21, size=200).astype(np.int64)
    ys = rng.randint(0, 1 << 21, size=200).astype(np.int64)
    got = zvalue(xs, ys)
    want = np.array([_zvalue_ref(a, b) for a, b in zip(xs, ys)],
                    dtype=np.uint64)
    assert np.array_equal(got, want)
    # clipping: negatives and overflow clamp, never wrap
    assert zvalue(np.array([-5]), np.array([1 << 40]))[0] == _zvalue_ref(
        0, (1 << 21) - 1)


@pytest.fixture()
def grid_dir(tmp_path, ray_session):
    """64×64 (x, y) grid, z-order clustered into 16-file layout."""
    n = 64
    df = pd.DataFrame({
        "x": np.repeat(np.arange(n), n).astype(np.int64),
        "y": np.tile(np.arange(n), n).astype(np.int64),
    })
    df["payload"] = df["x"] * 1000 + df["y"]
    out = str(tmp_path / "zm")
    write_zonemapped(rd.from_pandas(df).repartition(4), out,
                     stat_cols=["x", "y"], zorder_cols=("x", "y"),
                     rows_per_file=256)
    return out, df


def test_box_query_prunes_and_matches(grid_dir):
    out, df = grid_dir
    box = {"x": (10, 20), "y": (40, 50)}
    kept, total = prune_files(out, box)
    assert total >= 16  # Ray batching may split a couple of boundaries
    # an 11×11 box on a z-clustered 64×64 grid must skip most files
    assert 0 < len(kept) <= total // 2
    got = read_zonemapped(out, box).to_pandas().sort_values(
        ["x", "y"]).reset_index(drop=True)
    want = df[(df.x.between(10, 20)) & (df.y.between(40, 50))].sort_values(
        ["x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["x", "y", "payload"]], want)


def test_single_column_predicate_prunes(grid_dir):
    out, df = grid_dir
    kept, total = prune_files(out, {"x": (0, 7)})
    assert len(kept) < total
    got = read_zonemapped(out, {"x": (0, 7)}).to_pandas()
    assert len(got) == len(df[df.x <= 7])
    assert got["x"].max() == 7


def test_all_pruned_read_keeps_schema(grid_dir):
    out, _df = grid_dir
    ds = read_zonemapped(out, {"x": (9000, 9999)})
    # Dataset-level schema survives (to_pandas() of an all-empty dataset
    # drops columns — a Ray quirk; the schema is what downstream stages
    # and joins consume)
    assert ds.schema().names == ["x", "y", "payload"]
    assert ds.count() == 0


def test_no_predicate_reads_everything(grid_dir):
    out, df = grid_dir
    assert read_zonemapped(out).count() == len(df)


def test_rewrite_is_consistent(grid_dir, tmp_path):
    """A rewrite over the same directory may batch differently, but the
    published state must stay exact: on-disk parts == manifest parts
    (orphans from the previous layout are swept), total rows preserved,
    and a pruned query still answers identically."""
    out, df = grid_dir
    m2 = write_zonemapped(
        rd.from_pandas(df).repartition(4), out,
        stat_cols=["x", "y"], zorder_cols=("x", "y"), rows_per_file=256)
    after = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert after == sorted(f["file"] for f in m2["files"])
    assert m2["n_rows"] == len(df)
    total = sum(
        pq.read_metadata(os.path.join(out, f)).num_rows for f in after)
    assert total == len(df)
    got = read_zonemapped(out, {"x": (3, 5), "y": (3, 5)}).to_pandas()
    assert len(got) == 9


def test_null_stats_prune_all_null_files(tmp_path, ray_session):
    df = pd.DataFrame({
        "k": pd.array([None] * 50 + list(range(50)), dtype="Int64"),
        "v": np.arange(100, dtype=np.int64),
    })
    out = str(tmp_path / "zm_null")
    write_zonemapped(rd.from_pandas(df), out, stat_cols=["k"],
                     rows_per_file=25)
    kept, total = prune_files(out, {"k": (0, 100)})
    assert len(kept) < total  # the all-NULL files are provably empty
    got = read_zonemapped(out, {"k": (0, 100)}).to_pandas()
    assert len(got) == 50  # NULL rows never match a range predicate


def test_time_travel_and_vacuum(tmp_path, ray_session):
    """Snapshot versioning: v1 stays byte-readable after v2 overwrites
    (structural sharing via content-addressed parts), version manifests
    prune independently, and vacuum expires old snapshots plus their
    now-unreferenced parts."""
    from recon_ray.sources.zonemap import list_versions, vacuum

    df1 = pd.DataFrame({"x": np.arange(100, dtype=np.int64),
                        "v": np.arange(100, dtype=np.int64)})
    out = str(tmp_path / "tt")
    write_zonemapped(rd.from_pandas(df1), out, stat_cols=["x"],
                     rows_per_file=25, keep_history=True)
    df2 = df1.copy()
    df2.loc[df2.x >= 50, "v"] += 1000  # second half changes, first half
    write_zonemapped(rd.from_pandas(df2), out, stat_cols=["x"],
                     rows_per_file=25, keep_history=True)  # shares parts
    assert list_versions(out) == [1, 2]

    old = read_zonemapped(out, version=1).to_pandas().sort_values("x")
    new = read_zonemapped(out).to_pandas().sort_values("x")
    assert list(old["v"]) == list(df1.sort_values("x")["v"])
    assert list(new["v"]) == list(df2.sort_values("x")["v"])
    # pruning works against a historical snapshot too
    kept1, total1 = prune_files(out, {"x": (0, 10)}, version=1)
    assert 0 < len(kept1) < total1

    # unchanged first-half parts are SHARED: fewer files on disk than
    # 2 × files-per-version
    n_parts = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    _, total2 = prune_files(out, {})
    assert n_parts < total1 + total2

    res = vacuum(out, keep_last=1)
    assert res["versions_dropped"] == 1 and res["files_deleted"] > 0
    assert list_versions(out) == [2]
    # head still fully readable after expiry
    assert read_zonemapped(out).count() == 100


def test_bloom_point_lookup_skips_files(tmp_path, ray_session):
    """Natural (unsorted) layout: user min/max windows span the domain
    (range pruning keeps everything), the per-file bloom prunes point
    lookups — no false negatives for ANY present user, and an absent
    user prunes every file yet still returns an empty, schema-correct
    result."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from recon_ray.sources.zonemap import (prune_files, read_zonemapped,
                                           write_zonemapped)

    rng = np.random.RandomState(5)
    n = 6000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 800, n).astype(np.int64),
        "v": rng.randint(0, 1000, n).astype(np.int64),
    })
    out = str(tmp_path / "zb")
    write_zonemapped(rd.from_pandas(df), out, stat_cols=["user_id"],
                     rows_per_file=512, bloom_cols=["user_id"])
    # every file spans nearly the whole user domain → min/max alone
    # cannot prune a point probe
    kept_range, total = prune_files(out, {"user_id": (123, 123)})
    assert total >= 8 and len(kept_range) == total
    pruned_any = False
    for probe in (0, 123, 799, int(df["user_id"].iloc[0])):
        kept, total = prune_files(out, {}, equals={"user_id": probe})
        got = read_zonemapped(out, equals={"user_id": probe}).to_pandas()
        want = df[df["user_id"] == probe]
        # exactness: bloom may over-keep, never over-drop
        assert sorted(got["event_id"]) == sorted(want["event_id"])
        if len(kept) < total:
            pruned_any = True
    assert pruned_any  # the bloom actually skipped files somewhere
    # absent user: every file pruned, result empty but schema-correct
    kept, total = prune_files(out, {}, equals={"user_id": 10_000})
    assert kept == []
    got = read_zonemapped(out, equals={"user_id": 10_000}).to_pandas()
    assert len(got) == 0
