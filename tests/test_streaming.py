"""Watermark streaming window (stages/streaming.py): ordered-replay
parity with the batch tumbling aggregate, late-drop semantics on
crafted out-of-order streams, and the bounded-state invariant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from recon_ray.stages.streaming import stream_tumbling_agg

H = 3_600_000_000  # one hour in us


def _ev(rows):
    """rows: (ts_hours, event_type, value) → events frame."""
    return pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [int(h * H) for h, _t, _v in rows], unit="us"),
            "event_type": [t for _h, t, _v in rows],
            "value": [float(v) for _h, _t, v in rows],
        }
    )


def _collect(out):
    df = out["result"].to_pandas()
    return (
        df.sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )


def test_ordered_replay_matches_batch_groupby(ray_session):
    rng = np.random.RandomState(11)
    hours = rng.uniform(0, 72, size=500)
    types = rng.choice(["click", "view", "buy"], size=500)
    vals = np.round(rng.uniform(0, 50, size=500), 2)
    df = _ev(list(zip(hours, types, vals)))
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(5), window="6h", lateness="0s",
        n_partitions=4, ordered=True)
    got = _collect(out)
    assert out["n_late_dropped"] == 0

    want = (
        df.assign(window_start=df["ts"].dt.floor("6h"))
        .groupby(["window_start", "event_type"], as_index=False)
        .agg(n_events=("value", "size"), total_value=("value", "sum"))
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert list(got["n_events"]) == list(want["n_events"])
    assert np.allclose(got["total_value"], want["total_value"])
    assert list(got["window_start"]) == list(want["window_start"])


def test_late_event_dropped_without_lateness(ray_session):
    # feed order: t=1h, t=7h (watermark → 7h, window [0,6h) seals and
    # emits), then t=5h arrives for the SEALED window → dropped
    rows = [(1, "a", 10.0), (7, "a", 1.0), (5, "a", 100.0)]
    df = _ev(rows)
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(3), window="6h", lateness="0s",
        n_partitions=1, ordered=False)
    got = _collect(out)
    assert out["n_late_dropped"] == 1
    w0 = got[got["window_start"] == pd.Timestamp(0)]
    assert int(w0["n_events"].iloc[0]) == 1  # only the t=1h event
    assert float(w0["total_value"].iloc[0]) == 10.0


def test_lateness_horizon_admits_disorder(ray_session):
    # same stream, lateness 3h: after t=7h the watermark is 4h < 6h,
    # window [0,6h) is still open → the t=5h event is admitted
    rows = [(1, "a", 10.0), (7, "a", 1.0), (5, "a", 100.0)]
    df = _ev(rows)
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(3), window="6h", lateness="3h",
        n_partitions=1, ordered=False)
    got = _collect(out)
    assert out["n_late_dropped"] == 0
    w0 = got[got["window_start"] == pd.Timestamp(0)]
    assert int(w0["n_events"].iloc[0]) == 2
    assert float(w0["total_value"].iloc[0]) == 110.0


def test_state_stays_bounded_by_horizon(ray_session):
    # 100 sequential hourly windows, ordered feed, zero lateness: the
    # watermark tracks the stream head, so at most a couple of windows
    # are ever open per actor — state must NOT grow with stream length
    rows = [(h + 0.5, "a", 1.0) for h in range(100)]
    df = _ev(rows)
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(10), window="1h", lateness="0s",
        n_partitions=1, ordered=True)
    got = _collect(out)
    assert len(got) == 100
    assert out["max_open_windows"] <= 3
    assert out["n_late_dropped"] == 0


def test_keys_partition_cleanly(ray_session):
    # many keys across 4 actors: every (window, key) aggregate appears
    # exactly once — the hash split never divides a key across actors
    rows = [(h % 5 + 0.1 * k, f"k{k}", 1.0)
            for h in range(5) for k in range(13)]
    df = _ev(rows)
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(4), window="1h", lateness="0s",
        n_partitions=4, ordered=True)
    got = _collect(out)
    dup = got.duplicated(["window_start", "event_type"]).any()
    assert not dup
    assert int(got["n_events"].sum()) == len(rows)


def _sev(rows):
    """rows: (ts_minutes, user_id) → events-shaped frame."""
    M = 60_000_000
    return pd.DataFrame(
        {
            "ts": pd.to_datetime([int(m * M) for m, _u in rows],
                                 unit="us"),
            "user_id": pd.Series([u for _m, u in rows], dtype="int64"),
        }
    )


def test_stream_sessions_ordered_matches_batch(ray_session):
    from recon_ray.stages.streaming import stream_session_windows

    rng = np.random.RandomState(5)
    rows = [(float(rng.uniform(0, 600)), int(rng.randint(0, 20)))
            for _ in range(400)]
    df = _sev(rows)
    out = stream_session_windows(
        rd.from_pandas(df).repartition(5), gap="30m", lateness="0s",
        n_partitions=4, ordered=True)
    got = out["result"].to_pandas()
    agg = (got.groupby("user_id", as_index=False)
           .agg(n_sessions=("session_start", "size"),
                n_events=("n_events", "sum"))
           .sort_values("user_id").reset_index(drop=True))

    d = df.sort_values(["user_id", "ts"])
    new = d["user_id"].ne(d["user_id"].shift()) | (
        d["ts"].diff() > pd.Timedelta(minutes=30))
    want = (d.assign(__ns=new).groupby("user_id", as_index=False)
            .agg(n_sessions=("__ns", "sum"), n_events=("__ns", "size"))
            .sort_values("user_id").reset_index(drop=True))
    assert list(agg["n_sessions"]) == list(want["n_sessions"])
    assert list(agg["n_events"]) == list(want["n_events"])
    assert out["n_late_dropped"] == 0


def test_stream_sessions_bridge_merge(ray_session):
    """A late-but-admissible event lands BETWEEN two open sessions and
    must merge them into one (the merging-window case)."""
    from recon_ray.stages.streaming import stream_session_windows

    # feed order: t=0m, t=50m (two sessions, gap 30m), then t=25m —
    # within 30m of both ⇒ all three unify into ONE session
    rows = [(0.0, 7), (50.0, 7), (25.0, 7)]
    out = stream_session_windows(
        rd.from_pandas(_sev(rows)).repartition(3), gap="30m",
        lateness="2h", n_partitions=1, ordered=False)
    got = out["result"].to_pandas()
    assert len(got) == 1
    assert int(got["n_events"].iloc[0]) == 3
    assert out["n_late_dropped"] == 0


def test_stream_sessions_late_drop(ray_session):
    """Zero lateness: an event below the watermark is dropped, and the
    two punctual events stay separate sessions."""
    from recon_ray.stages.streaming import stream_session_windows

    rows = [(0.0, 7), (50.0, 7), (25.0, 7)]
    out = stream_session_windows(
        rd.from_pandas(_sev(rows)).repartition(3), gap="30m",
        lateness="0s", n_partitions=1, ordered=False)
    got = out["result"].to_pandas()
    assert out["n_late_dropped"] == 1  # t=25m < watermark 50m
    assert len(got) == 2
    assert list(got["n_events"]) == [1, 1]


def test_hopping_windows_match_batch(ray_session):
    """6h windows sliding every 2h: each event lands in exactly 3
    windows; the streamed aggregate equals the brute-force batch form."""
    rng = np.random.RandomState(3)
    hours = rng.uniform(0, 48, size=300)
    types = rng.choice(["a", "b"], size=300)
    vals = np.round(rng.uniform(0, 9, size=300), 2)
    df = _ev(list(zip(hours, types, vals)))
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(4), window="6h", slide="2h",
        lateness="0s", n_partitions=2, ordered=True)
    got = _collect(out)
    assert out["n_late_dropped"] == 0

    frames = []
    for k in range(3):
        shifted = df.assign(window_start=(
            (df["ts"] - pd.Timedelta(hours=2 * k)).dt.floor("2h")))
        frames.append(shifted)
    want = (
        pd.concat(frames)
        .groupby(["window_start", "event_type"], as_index=False)
        .agg(n_events=("value", "size"), total_value=("value", "sum"))
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert list(got["n_events"]) == list(want["n_events"])
    assert np.allclose(got["total_value"], want["total_value"])
    assert list(got["window_start"]) == list(want["window_start"])


def test_stream_distinct_exact_and_hll(ray_session):
    """Exact mode equals the batch nunique; HLL mode lands within the
    2^12-register error envelope and survives disorder (register max
    is order-free)."""
    from recon_ray.stages.streaming import stream_distinct_agg

    rng = np.random.RandomState(17)
    n = 2000
    df = pd.DataFrame({
        "ts": pd.to_datetime(
            (rng.uniform(0, 24, n) * H).astype("int64"), unit="us"),
        "event_type": rng.choice(["a", "b"], size=n),
        "user_id": pd.Series(rng.randint(0, 500, size=n),
                             dtype="int64"),
    })
    want = (df.assign(window_start=df["ts"].dt.floor("6h"))
            .groupby(["window_start", "event_type"])["user_id"]
            .nunique().reset_index(name="n_distinct")
            .sort_values(["window_start", "event_type"])
            .reset_index(drop=True))

    out = stream_distinct_agg(
        rd.from_pandas(df).repartition(4), window="6h",
        distinct_col="user_id", mode="exact", n_partitions=2,
        ordered=True)
    got = (out["result"].to_pandas()
           .sort_values(["window_start", "event_type"])
           .reset_index(drop=True))
    assert list(got["n_distinct"].astype("int64")) == list(
        want["n_distinct"])

    # HLL: unordered feed with generous lateness — estimates must stay
    # within ~5% of truth at p=12 (1.04/sqrt(4096) ≈ 1.6% expected)
    out_h = stream_distinct_agg(
        rd.from_pandas(df).repartition(4), window="6h",
        distinct_col="user_id", mode="hll", lateness="24h",
        n_partitions=2, ordered=False)
    got_h = (out_h["result"].to_pandas()
             .sort_values(["window_start", "event_type"])
             .reset_index(drop=True))
    assert len(got_h) == len(want)
    rel = np.abs(got_h["n_distinct"].to_numpy()
                 - want["n_distinct"].to_numpy()) / np.maximum(
        want["n_distinct"].to_numpy(), 1)
    assert float(rel.max()) < 0.05


def test_stream_topk_exact_and_mg(ray_session):
    """Exact mode equals the batch per-window top-k (count DESC, item
    ASC); Misra-Gries mode on a skewed stream keeps every true heavy
    hitter (frequency > n/capacity guarantee) in rank order."""
    from recon_ray.stages.streaming import stream_topk_agg

    rng = np.random.RandomState(23)
    n = 3000
    # skewed items: 3 heavies own ~60% of each window
    items = np.where(rng.uniform(size=n) < 0.6,
                     rng.randint(0, 3, size=n),
                     rng.randint(3, 200, size=n))
    df = pd.DataFrame({
        "ts": pd.to_datetime(
            (rng.uniform(0, 24, n) * H).astype("int64"), unit="us"),
        "user_id": pd.Series(items, dtype="int64"),
    })

    def batch_topk(k):
        c = (df.assign(window_start=df["ts"].dt.floor("6h"))
             .groupby(["window_start", "user_id"])
             .size().reset_index(name="n"))
        c = c.sort_values(["window_start", "n", "user_id"],
                          ascending=[True, False, True])
        return (c.groupby("window_start").head(k)
                .reset_index(drop=True))

    out = stream_topk_agg(
        rd.from_pandas(df).repartition(4), window="6h", k=5,
        item_col="user_id", mode="exact", n_partitions=2, ordered=True)
    got = (out["result"].to_pandas()
           .sort_values(["window_start", "n", "item"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    want = batch_topk(5)
    assert list(got["item"]) == list(want["user_id"])
    assert list(got["n"].astype("int64")) == list(want["n"])

    out_mg = stream_topk_agg(
        rd.from_pandas(df).repartition(4), window="6h", k=3,
        item_col="user_id", mode="mg", capacity=64, n_partitions=2,
        ordered=True)
    got_mg = out_mg["result"].to_pandas()
    want3 = batch_topk(3)
    for w0, grp in want3.groupby("window_start"):
        mg_items = list(
            got_mg[got_mg["window_start"] == w0]["item"])
        # each window's ~20%-frequency heavies are far above the
        # n/capacity survival bound — ALL true top-3 must be present
        assert set(grp["user_id"]).issubset(set(mg_items)), (
            w0, mg_items, list(grp["user_id"]))


def test_stream_interval_join_matches_batch(ray_session):
    """Exactly-once pair emission vs the brute-force batch interval
    join, both ordered and with a disordered feed under a lateness
    budget (a pair must emit once no matter which side arrives
    second)."""
    from recon_ray.stages.streaming import stream_interval_join

    rng = np.random.RandomState(31)
    n = 400
    base = pd.DataFrame({
        "ts": pd.to_datetime(
            (rng.uniform(0, 96, n) * H).astype("int64"), unit="us"),
        "user_id": pd.Series(rng.randint(0, 12, n), dtype="int64"),
        "event_id": pd.Series(np.arange(n), dtype="int64"),
    })
    L = base.iloc[: n // 2].reset_index(drop=True)
    R = base.iloc[n // 2:].reset_index(drop=True)

    want = (L.merge(R, on="user_id", suffixes=("_l", "_r")))
    want = want[(want["ts_r"] >= want["ts_l"])
                & (want["ts_r"] <= want["ts_l"]
                   + pd.Timedelta(hours=12))]
    want = set(zip(want["event_id_l"], want["event_id_r"]))

    for ordered, lateness in ((True, "0s"), (False, "96h")):
        out = stream_interval_join(
            rd.from_pandas(L).repartition(4),
            rd.from_pandas(R).repartition(3),
            key_col="user_id", horizon="12h", lateness=lateness,
            n_partitions=3, ordered=ordered)
        df = out["result"].to_pandas()
        got = list(zip(df["left_id"], df["right_id"]))
        assert len(got) == len(set(got)), "duplicate pair emitted"
        assert set(got) == want
        assert out["n_late_dropped"] == 0


def test_stream_interval_join_buffer_bounded(ray_session):
    """With an ordered feed and a small horizon, buffered state stays
    bounded by the horizon population, not stream length."""
    from recon_ray.stages.streaming import stream_interval_join

    n = 1000
    L = pd.DataFrame({
        "ts": pd.to_datetime(np.arange(n, dtype="int64") * H, unit="us"),
        "user_id": pd.Series(np.zeros(n), dtype="int64"),
        "event_id": pd.Series(np.arange(n), dtype="int64"),
    })
    R = L.assign(event_id=L["event_id"] + n)
    out = stream_interval_join(
        rd.from_pandas(L).repartition(20),
        rd.from_pandas(R).repartition(20),
        key_col="user_id", horizon="2h", lateness="0s",
        n_partitions=1, ordered=True)
    df = out["result"].to_pandas()
    # each left matches rights at +0h,+1h,+2h (except the tail)
    assert len(df) == 3 * n - 3
    assert out["max_buffered"] < 300  # ≪ 2n total events

def test_unordered_stream_matches_batch_with_lateness(ray_session):
    """The PRODUCTION path: ordered=False (no sort, no source
    materialization — blocks stream straight off the execution) with a
    lateness that covers the stream's disorder must equal the batch
    aggregate exactly, with zero late drops."""
    rng = np.random.RandomState(29)
    hours = rng.uniform(0, 48, size=800)  # unsorted: disorder ≈ 48h
    types = rng.choice(["click", "view", "buy"], size=800)
    vals = np.round(rng.uniform(0, 50, size=800), 2)
    df = _ev(list(zip(hours, types, vals)))
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(6), window="6h", lateness="48h",
        n_partitions=4, ordered=False)
    got = _collect(out)
    assert out["n_late_dropped"] == 0
    want = (
        df.assign(window_start=df["ts"].dt.floor("6h"))
        .groupby(["window_start", "event_type"], as_index=False)
        .agg(n_events=("value", "size"), total_value=("value", "sum"))
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert list(got["n_events"]) == list(want["n_events"])
    assert np.allclose(got["total_value"], want["total_value"])
    assert list(got["window_start"]) == list(want["window_start"])


def test_high_cardinality_int_key(ray_session):
    """A stream keyed by an int64 row-cardinality column (user_id):
    (a) the emitted key column carries the INPUT dtype (int64, not a
    hard-coded string — this used to crash at emit time), and (b) the
    columnar state fold handles groups ≈ rows correctly."""
    rng = np.random.RandomState(31)
    n = 2000
    df = pd.DataFrame({
        "ts": pd.to_datetime(
            (rng.uniform(0, 24, n) * H).astype("int64"), unit="us"),
        "user_id": pd.Series(rng.randint(0, 1500, n), dtype="int64"),
        "value": np.round(rng.uniform(0, 10, n), 2),
    })
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(4), window="6h",
        key_cols=("user_id",), lateness="0s", n_partitions=4,
        ordered=True)
    got = (out["result"].to_pandas()
           .sort_values(["window_start", "user_id"])
           .reset_index(drop=True))
    assert str(got["user_id"].dtype) == "int64"
    want = (
        df.assign(window_start=df["ts"].dt.floor("6h"))
        .groupby(["window_start", "user_id"], as_index=False)
        .agg(n_events=("value", "size"), total_value=("value", "sum"))
        .sort_values(["window_start", "user_id"])
        .reset_index(drop=True)
    )
    assert list(got["user_id"]) == list(want["user_id"])
    assert list(got["n_events"]) == list(want["n_events"])
    assert np.allclose(got["total_value"], want["total_value"])


def test_topk_string_items(ray_session):
    """TopKWindowActor with a STRING item column (used to hard-code
    int64 and crash): exact mode equals the batch per-window top-k."""
    from recon_ray.stages.streaming import stream_topk_agg

    rng = np.random.RandomState(37)
    n = 1200
    items = rng.choice([f"page{i}" for i in range(40)], size=n)
    df = pd.DataFrame({
        "ts": pd.to_datetime(
            (rng.uniform(0, 18, n) * H).astype("int64"), unit="us"),
        "page": pd.Series(items, dtype="object"),
    })
    out = stream_topk_agg(
        rd.from_pandas(df).repartition(3), window="6h", k=4,
        item_col="page", mode="exact", n_partitions=2, ordered=True)
    got = (out["result"].to_pandas()
           .sort_values(["window_start", "n", "item"],
                        ascending=[True, False, True])
           .reset_index(drop=True))
    c = (df.assign(window_start=df["ts"].dt.floor("6h"))
         .groupby(["window_start", "page"]).size().reset_index(name="n")
         .sort_values(["window_start", "n", "page"],
                      ascending=[True, False, True]))
    want = c.groupby("window_start").head(4).reset_index(drop=True)
    assert list(got["item"]) == list(want["page"])
    assert list(got["n"].astype("int64")) == list(want["n"])


def test_distinct_hll_high_cardinality_key(ray_session):
    """HLL mode keyed by int64 user_id (groups ≈ rows): the register-
    matrix fold must agree with per-group exact counts within HLL
    error, and emitted keys carry int64."""
    from recon_ray.stages.streaming import stream_distinct_agg

    rng = np.random.RandomState(41)
    n = 3000
    df = pd.DataFrame({
        "ts": pd.to_datetime(
            (rng.uniform(0, 12, n) * H).astype("int64"), unit="us"),
        "user_id": pd.Series(rng.randint(0, 50, n), dtype="int64"),
        "item": pd.Series(rng.randint(0, 400, n), dtype="int64"),
    })
    out = stream_distinct_agg(
        rd.from_pandas(df).repartition(4), window="6h",
        key_cols=("user_id",), distinct_col="item", mode="hll",
        n_partitions=2, ordered=True)
    got = (out["result"].to_pandas()
           .sort_values(["window_start", "user_id"])
           .reset_index(drop=True))
    assert str(got["user_id"].dtype) == "int64"
    want = (df.assign(window_start=df["ts"].dt.floor("6h"))
            .groupby(["window_start", "user_id"])["item"]
            .nunique().reset_index(name="n_distinct")
            .sort_values(["window_start", "user_id"])
            .reset_index(drop=True))
    assert len(got) == len(want)
    rel = np.abs(got["n_distinct"].to_numpy()
                 - want["n_distinct"].to_numpy()) / np.maximum(
        want["n_distinct"].to_numpy(), 1)
    assert float(rel.max()) < 0.12  # 2^12 registers, small sets


def test_stream_sessions_unordered_matches_batch(ray_session):
    """Sessions through the TRUE streaming feed (ordered=False, blocks
    off the executor) with a lateness covering the disorder equal the
    batch sessionization; int64 keys emit int64."""
    from recon_ray.stages.streaming import stream_session_windows

    rng = np.random.RandomState(43)
    rows = [(float(rng.uniform(0, 600)), int(rng.randint(0, 15)))
            for _ in range(600)]
    df = _sev(rows)
    out = stream_session_windows(
        rd.from_pandas(df).repartition(5), gap="20m", lateness="10h",
        n_partitions=3, ordered=False)
    got = (out["result"].to_pandas()
           .sort_values(["user_id", "session_start"])
           .reset_index(drop=True))
    assert out["n_late_dropped"] == 0
    assert str(got["user_id"].dtype) == "int64"
    d = df.sort_values(["user_id", "ts"])
    brk = (d["user_id"].ne(d["user_id"].shift())
           | (d["ts"].diff() > pd.Timedelta(minutes=20)))
    sid = brk.cumsum()
    want = (d.groupby(sid).agg(
        user_id=("user_id", "first"), session_start=("ts", "min"),
        session_end=("ts", "max"), n_events=("ts", "size"))
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True))
    assert list(got["user_id"]) == list(want["user_id"])
    assert list(got["session_start"]) == list(want["session_start"])
    assert list(got["session_end"]) == list(want["session_end"])
    assert list(got["n_events"]) == list(want["n_events"])
