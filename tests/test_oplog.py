"""TrackedDataset apply_/rollback — port of the reference's rollback
contract (recon/dataset.py:240-289, tests/test_dataset.py:90-117): stats
change after an op, rollback restores data, stats, and commit hash."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from recon_ray.ops.mentions_io import mentions_parts, mentions_list_array
from recon_ray.state.oplog import TrackedDataset


def _docs() -> pa.Table:
    lengths = np.array([2, 1], dtype=np.int64)
    text = np.array(["foo", "bar", "baz"], dtype=object)
    start = np.array([0, 4, 0], dtype=np.int64)
    end = np.array([3, 7, 3], dtype=np.int64)
    label = np.array(["call", "CALL", "ident"], dtype=object)
    source = np.array(["t", "t", "t"], dtype=object)
    return pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "content": pa.array(["foo bar", "baz"], pa.string()),
            "mentions": mentions_list_array(
                lengths, text, start, end, label, source
            ),
        }
    )


def _labels(ds) -> list[str]:
    out: set[str] = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        _, _, _, _, label, _ = mentions_parts(b)
        out.update(label.tolist())
    return sorted(out)


def test_rollback_restores_stats_and_hash(tmp_path):
    td = TrackedDataset(rd.from_arrow(_docs()), str(tmp_path / "oplog"))
    h0 = td.commit_hash
    pre = _labels(td.data)
    assert pre == ["CALL", "call", "ident"]
    assert len(td.operations) == 0

    td.apply_("recon_ray.upcase_labels.v1")
    post = _labels(td.data)
    assert post == ["CALL", "IDENT"]
    assert len(td.operations) == 1
    assert td.commit_hash != h0

    td.rollback()
    assert len(td.operations) == 0
    assert td.commit_hash == h0
    assert _labels(td.data) == pre


def test_rollback_multiple_and_bounds(tmp_path):
    td = TrackedDataset(rd.from_arrow(_docs()), str(tmp_path / "oplog"))
    h0 = td.commit_hash
    td.apply_("recon_ray.upcase_labels.v1")
    td.apply_("recon_ray.strip_annotations.v1")
    assert len(td.operations) == 2
    with pytest.raises(ValueError):
        td.rollback(0)
    with pytest.raises(ValueError):
        td.rollback(3)
    td.rollback(2)
    assert len(td.operations) == 0
    assert td.commit_hash == h0


def test_content_addressed_store_dedup_and_gc(tmp_path):
    """Snapshots are keyed by commit hash: re-applying an op after a
    rollback reuses the stored state instead of writing a new copy; gc()
    reclaims unreferenced hashes."""
    td = TrackedDataset(rd.from_arrow(_docs()), str(tmp_path / "oplog"))
    h0 = td.commit_hash
    td.apply_("recon_ray.upcase_labels.v1")
    h1 = td.commit_hash
    assert sorted(td.store.list()) == sorted({h0, h1})
    td.rollback()
    assert h1 in td.store.list()  # content-addressed: survives rollback
    td.apply_("recon_ray.upcase_labels.v1")
    assert td.commit_hash == h1  # deterministic op → same state, reused
    assert len(td.store.list()) == 2
    td.rollback()
    assert td.gc() == [h1]
    assert td.store.list() == [h0]
    assert td.store.get(h0).count() == 2


def test_tracked_search(tmp_path):
    td = TrackedDataset(rd.from_arrow(_docs()), str(tmp_path / "oplog"))
    assert td.search("FOO").count() == 0
    assert td.search("foo").count() == 1
    assert td.search("FOO", case_sensitive=False).count() == 1


def test_load_reopens_persisted_log(tmp_path):
    """TrackedDataset.load in a 'new process': data, ops, and commit hash
    come back from ops.json + the snapshot store alone."""
    wd = str(tmp_path / "oplog")
    td = TrackedDataset(rd.from_arrow(_docs()), wd)
    td.apply_("recon_ray.upcase_labels.v1")
    h1, ops1 = td.commit_hash, [e.name for e in td.operations]

    td2 = TrackedDataset.load(wd)
    assert td2.commit_hash == h1
    assert [e.name for e in td2.operations] == ops1
    assert len(td2) == 2
    assert _labels(td2.data) == _labels(td.data)
    # rollback from the reopened handle persists for a third open
    td2.rollback()
    td3 = TrackedDataset.load(wd)
    assert len(td3.operations) == 0
    assert _labels(td3.data) == ["CALL", "call", "ident"]


def test_cli_track_verbs(tmp_path, capsys):
    """CLI face of the op log: init → apply → log → rollback → gc, driven
    in-process through cli.main (shares the session Ray)."""
    import json as _json

    from recon_ray.cli import main

    docs_dir = str(tmp_path / "docs")
    rd.from_arrow(_docs()).write_parquet(docs_dir)
    wd = str(tmp_path / "wd")

    assert main(["track", "init", wd, docs_dir]) == 0
    init = _json.loads(capsys.readouterr().out)
    assert init["n_docs"] == 2

    assert main(["track", "apply", wd, "recon_ray.upcase_labels.v1"]) == 0
    applied = _json.loads(capsys.readouterr().out)
    assert applied["commit"] != init["commit"]

    assert main(["track", "log", wd]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and "upcase_labels" in out[0]

    assert main(["track", "rollback", wd]) == 0
    rb = _json.loads(capsys.readouterr().out)
    assert rb["commit"] == init["commit"]

    assert main(["track", "gc", wd]) == 0
    gced = _json.loads(capsys.readouterr().out)
    assert gced["removed"] == [applied["commit"]]
