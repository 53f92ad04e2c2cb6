"""Global ExampleStore — the distributed analogue of the reference's
content-addressed store (recon/store.py:10-80): add is idempotent by
example hash, membership/get work across datasets, reference-format JSONL
round-trips."""

from __future__ import annotations

import json
import os

import ray.data as rd

from recon_ray.sources.jsonl import records_to_table
from recon_ray.state.example_store import ExampleStore


def _recs(tag: str, n: int) -> list[dict]:
    return [
        {
            "text": f"{tag} text {i}",
            "spans": [{"start": 0, "end": len(tag), "label": "ENT"}],
            "meta": {"source": tag},
        }
        for i in range(n)
    ]


def test_add_is_idempotent_and_deduped(tmp_path):
    store = ExampleStore(str(tmp_path / "store"), num_buckets=8)
    a = _recs("alpha", 20)
    n1 = store.add_dataset(rd.from_arrow(records_to_table(a)))
    assert n1 == 20
    # adding the same examples again (even from a different Dataset) adds 0
    n2 = store.add_dataset(rd.from_arrow(records_to_table(list(reversed(a)))))
    assert n2 == 0
    assert len(store) == 20

    # overlapping second dataset: only the novel rows land
    b = _recs("alpha", 5) + _recs("beta", 7)
    n3 = store.add_dataset(rd.from_arrow(records_to_table(b)))
    assert n3 == 7
    assert len(store) == 27


def test_membership_get_and_roundtrip(tmp_path):
    store = ExampleStore(str(tmp_path / "store"), num_buckets=4)
    t = records_to_table(_recs("gamma", 6))
    store.add_dataset(rd.from_arrow(t))
    ids = t.column("doc_id").to_pylist()

    assert all(h in store for h in ids)
    assert (ids[0] + 1) not in store
    flags = store.contains_many(ids + [ids[0] + 1])
    assert sum(flags.values()) == len(ids)

    row = store.get(ids[2])
    assert row is not None and row["text"] == "gamma text 2"
    assert store.get(ids[0] + 1) is None

    out = store.to_dataset().to_pandas()
    assert len(out) == 6
    assert sorted(out["doc_id"].astype("uint64").tolist()) == sorted(ids)

    # reference-format JSONL round-trip (recon/store.py:49-80 shape)
    path = str(tmp_path / "store.jsonl")
    store.to_disk(path)
    with open(path) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 6
    assert set(lines[0]) == {"example_hash", "example"}

    store2 = ExampleStore.from_disk(path, str(tmp_path / "store2"),
                                    num_buckets=4)
    assert len(store2) == 6
    assert all(h in store2 for h in ids)


def test_store_reopen_persists(tmp_path):
    root = str(tmp_path / "store")
    s1 = ExampleStore(root, num_buckets=16)
    s1.add_dataset(rd.from_arrow(records_to_table(_recs("delta", 3))))
    # reopen: num_buckets comes from meta.json, contents survive
    s2 = ExampleStore(root, num_buckets=999)
    assert s2.num_buckets == 16
    assert len(s2) == 3
    assert s2.add_dataset(
        rd.from_arrow(records_to_table(_recs("delta", 3)))) == 0


def test_curate_incremental_across_runs(tmp_path):
    """Run 1 curates and packs; run 2 on the SAME input is a no-op; run 3
    on a superset packs only the novel docs. The store is the cross-run
    exact-dedup boundary."""
    import ray.data as rd

    from recon_ray.pipelines.curate import curate, curate_incremental

    store = str(tmp_path / "store")
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    half = docs.filter(lambda r: r["doc_id"] < 250)

    r1 = curate_incremental(half, store)
    assert r1["n_new"] > 0
    p1 = r1["packed"].to_pandas()
    assert len(p1) == r1["n_new"]
    # packs respect the budget (oversized docs are singletons)
    sums = p1.groupby(["bucket", "seq_id"]).n_tokens.agg(["sum", "size"])
    assert ((sums["sum"] <= 512) | (sums["size"] == 1)).all()

    r2 = curate_incremental(half, store)
    assert r2["n_new"] == 0 and r2["packed"] is None

    r3 = curate_incremental(docs, store)
    assert r3["n_new"] > 0
    p3 = r3["packed"].to_pandas()
    # novel docs only: no content key from run 1 reappears
    assert not set(p3["doc_id"]) & set(p1["doc_id"])
    # total survivors across runs == one-shot curation of the full input
    one_shot = curate(docs)["curated"].count()
    assert r1["n_new"] + r3["n_new"] == one_shot


def _all_parts(root: str) -> dict[str, list[str]]:
    return {
        name: sorted(
            f for f in os.listdir(os.path.join(root, name))
            if f.endswith(".parquet")
        )
        for name in sorted(os.listdir(root))
        if name.startswith("bucket=")
    }


def test_compact_merges_parts_preserving_content(tmp_path):
    root = str(tmp_path / "store")
    store = ExampleStore(root, num_buckets=4)
    for tag in ("a", "b", "c"):
        store.add_examples(_recs(tag, 12))
    before = store.to_dataset().to_pandas().sort_values("doc_id")
    assert any(len(v) > 1 for v in _all_parts(root).values())
    stats = store.compact()
    assert stats["parts_after"] <= stats["parts_before"]
    assert all(len(v) <= 1 for v in _all_parts(root).values())
    after = store.to_dataset().to_pandas().sort_values("doc_id")
    assert before["doc_id"].tolist() == after["doc_id"].tolist()
    assert before["text"].tolist() == after["text"].tolist()
    assert len(store) == len(before)
    # second compact is a no-op
    stats2 = store.compact()
    assert stats2["buckets"] == 0


def test_compact_crash_before_publish_keeps_old_parts(tmp_path):
    """Marker written but merged part never published: the old parts are
    still the truth — no data loss, and the next compact recovers."""
    root = str(tmp_path / "store")
    store = ExampleStore(root, num_buckets=1)
    store.add_examples(_recs("x", 5))
    store.add_examples(_recs("y", 5))
    n = len(store)
    bdir = os.path.join(root, "bucket=0000")
    with open(os.path.join(bdir, ".obsolete.json"), "w") as f:
        json.dump({"merged": "part-deadbeef.parquet",
                   "obsolete": _all_parts(root)["bucket=0000"]}, f)
    assert len(store) == n          # reads ignore the ineffective marker
    store.compact()                 # recovers + merges
    assert len(store) == n
    assert len(_all_parts(root)["bucket=0000"]) == 1


def test_compact_crash_after_publish_hides_old_parts(tmp_path):
    """Merged part published, olds not yet deleted: marker retires them —
    no duplicates — and the next compact finishes the cleanup."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "store")
    store = ExampleStore(root, num_buckets=1)
    store.add_examples(_recs("x", 5))
    store.add_examples(_recs("y", 5))
    n = len(store)
    bdir = os.path.join(root, "bucket=0000")
    olds = _all_parts(root)["bucket=0000"]
    merged = pa.concat_tables(
        [pq.read_table(os.path.join(bdir, p)) for p in olds]
    ).sort_by("doc_id")
    pq.write_table(merged, os.path.join(bdir, "part-cafef00d.parquet"))
    with open(os.path.join(bdir, ".obsolete.json"), "w") as f:
        json.dump({"merged": "part-cafef00d.parquet", "obsolete": olds}, f)
    assert len(store) == n                      # no double counting
    df = store.to_dataset().to_pandas()
    assert df["doc_id"].is_unique and len(df) == n
    store.compact()                             # cleanup finishes
    assert _all_parts(root)["bucket=0000"] == ["part-cafef00d.parquet"]
    assert not os.path.exists(os.path.join(bdir, ".obsolete.json"))
    assert len(store) == n


def test_compact_sweeps_orphaned_tmp(tmp_path):
    """A crash between tmp-write and publish orphans .part-<sig>.tmp;
    the next compact's recovery sweeps it (and merges normally)."""
    root = str(tmp_path / "store")
    store = ExampleStore(root, num_buckets=1)
    store.add_examples(_recs("x", 4))
    store.add_examples(_recs("y", 4))
    n = len(store)
    bdir = os.path.join(root, "bucket=0000")
    orphan = os.path.join(bdir, ".part-0123abcd.tmp")
    with open(orphan, "wb") as f:
        f.write(b"partial parquet bytes")
    store.compact()
    assert not os.path.exists(orphan)
    assert len(store) == n
    assert len(_all_parts(root)["bucket=0000"]) == 1
