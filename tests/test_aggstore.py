"""Incremental grouped-aggregate state (state/aggstore.py): maintained ≡
recomputed, idempotent re-apply, crash recovery (orphan snapshot without
manifest acknowledgment), schema pinning, vacuum."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from recon_ray.state.aggstore import AggStore


def _mk(n, seed):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        "h": rng.randint(0, 3, n).astype("int64"),
        "v": rng.randint(-50, 500, n).astype("int64"),
    })


def _recompute(frames):
    full = pd.concat(frames, ignore_index=True)
    out = full.groupby(["g", "h"], as_index=False).agg(
        n_rows=("v", "size"), v_sum=("v", "sum"), v_count=("v", "count"),
        v_min=("v", "min"), v_max=("v", "max"))
    return out.sort_values(["g", "h"]).reset_index(drop=True)


def _resolved(store):
    out = store.resolved().to_pandas()
    cols = ["g", "h", "n_rows", "v_sum", "v_count", "v_min", "v_max"]
    out = out[cols].astype(
        {c: "int64" for c in cols if c not in ("g",)})
    return out.sort_values(["g", "h"]).reset_index(drop=True)


def test_maintained_equals_recomputed_and_idempotent(tmp_path, ray_session):
    store = AggStore(str(tmp_path / "s"), ["g", "h"], ["v"])
    frames = [_mk(80, 1), _mk(50, 2), _mk(30, 3)]
    for i, f in enumerate(frames):
        r = store.apply_delta(rd.from_pandas(f).repartition(3), f"d{i}")
        assert not r["skipped"] and r["version"] == i + 1
    # re-apply every delta: all no-ops, version unchanged
    for i, f in enumerate(frames):
        r = store.apply_delta(rd.from_pandas(f), f"d{i}")
        assert r["skipped"] and r["version"] == 3
    pd.testing.assert_frame_equal(_resolved(store), _recompute(frames))
    # incremental prefix also correct
    s2 = AggStore(str(tmp_path / "s2"), ["g", "h"], ["v"])
    s2.apply_delta(rd.from_pandas(frames[0]), "d0")
    pd.testing.assert_frame_equal(_resolved(s2), _recompute(frames[:1]))


def test_crash_recovery_orphan_snapshot(tmp_path, ray_session):
    """Crash between snapshot rename and manifest write: the orphan
    state_v2 exists but the manifest still says v1 — the re-run must
    redo the delta over v1 and end up correct."""
    store = AggStore(str(tmp_path / "s"), ["g"], ["v"])
    f0, f1 = _mk(40, 4), _mk(25, 5)
    store.apply_delta(rd.from_pandas(f0), "d0")
    man = json.load(open(store._manifest_path()))
    store.apply_delta(rd.from_pandas(f1), "d1")
    # simulate the crash: roll the manifest back, leave state_v2 orphaned
    with open(store._manifest_path(), "w") as f:
        json.dump(man, f)
    assert os.path.exists(store._snap_dir(2))
    r = store.apply_delta(rd.from_pandas(f1), "d1")  # re-run
    assert not r["skipped"] and r["version"] == 2
    full = pd.concat([f0, f1]).groupby("g", as_index=False)["v"].sum()
    got = (store.resolved().to_pandas()[["g", "v_sum"]]
           .sort_values("g").reset_index(drop=True))
    assert list(got["v_sum"].astype("int64")) == list(full["v"])


def test_schema_pinning_and_empty(tmp_path, ray_session):
    store = AggStore(str(tmp_path / "s"), ["g"], ["v"])
    store.apply_delta(rd.from_pandas(_mk(10, 6)), "d0")
    with pytest.raises(ValueError):
        AggStore(str(tmp_path / "s"), ["g", "h"], ["v"]).version
    with pytest.raises(ValueError):
        AggStore(str(tmp_path / "empty"), ["g"], ["v"]).resolved()


def test_vacuum(tmp_path, ray_session):
    store = AggStore(str(tmp_path / "s"), ["g"], ["v"])
    for i in range(3):
        store.apply_delta(rd.from_pandas(_mk(20, i)), f"d{i}")
    assert store.vacuum(keep=1) == 2
    assert not os.path.exists(store._snap_dir(1))
    assert os.path.exists(store._snap_dir(3))
    assert len(store.resolved().to_pandas()) > 0


def test_cli_aggstate(tmp_path, ray_session):
    import subprocess
    import sys

    d0 = str(tmp_path / "d0.parquet")
    _mk(30, 9).to_parquet(d0)
    store = str(tmp_path / "store")
    env = {**os.environ, "RAY_ADDRESS": "local"}
    for i in range(2):  # second apply = idempotent no-op
        r = subprocess.run(
            [sys.executable, "-m", "recon_ray", "aggstate", "apply",
             store, "--keys", "g,h", "--cols", "v", "--delta", d0],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300)
        assert r.returncode == 0, r.stderr[-500:]
        assert f'"skipped": {"true" if i else "false"}' in r.stdout, \
            r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "recon_ray", "aggstate", "show", store,
         "--keys", "g,h", "--cols", "v"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    assert "v_sum" in r.stdout and "n_rows" in r.stdout
