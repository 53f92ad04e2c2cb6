"""Watermark-based streaming window aggregation — the STATEFUL
streaming analogue of the batch tumbling window
(`pipelines/queries.py:q_events_tumbling_6h`).

The reference has no streaming surface (it is a bounded in-memory
library); this operator exists for the engine's own 100-TB shape: an
event stream that cannot be materialized, arriving as micro-batches
with bounded disorder. The Dataset API cannot express it in one pass
— per-window partial state must live ACROSS batches — so this is the
documented actor escape hatch (SURVEY §4: stateful stages are actors).

Semantics (the Flink/Beam event-time model):

- Tumbling windows ``[k·W, (k+1)·W)`` over an event-time column.
- Each of ``n_partitions`` actors owns a hash slice of the KEY space
  and keeps only its OPEN windows: ``(window_start, key) → [count,
  sum]``. Memory is bounded by the disorder horizon (windows newer
  than the watermark), never by stream length.
- Watermark per actor = ``max(ts seen) − allowed_lateness``. When the
  watermark passes a window's END, the window emits exactly once and
  its state is freed.
- An event for an already-sealed window (``window_end ≤ watermark``
  at arrival) is COUNTED AND DROPPED — the late-data contract.
- With an ordered feed (or ``lateness ≥`` the stream's max disorder)
  the emitted aggregate equals the batch tumbling groupby bit-for-bit
  — that equivalence is the operator's DuckDB oracle
  (`q_events_stream_tumbling_6h`); late-drop behavior is pinned by
  handcrafted out-of-order streams in tests/test_streaming.py.

Scale shape: the driver never touches event data — blocks split into
per-partition sub-tables in a remote task (``num_returns=P``) and the
sub-table REFS route to actors in submission order (Ray actors
execute a caller's tasks in submission order, so the ordered feed
survives the async pipeline). Emitted windows stay in the object
store (``from_arrow_refs``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _dur_us(spec: str) -> int:
    """'6h' / '30m' / '10s' / '250ms' → microseconds."""
    spec = spec.strip().lower()
    for suf, mul in (("ms", 1_000), ("s", 1_000_000),
                     ("m", 60_000_000), ("h", 3_600_000_000),
                     ("d", 86_400_000_000)):
        if spec.endswith(suf) and spec[: -len(suf)].isdigit():
            return int(spec[: -len(suf)]) * mul
    raise ValueError(f"bad duration {spec!r} (use e.g. '6h', '30m')")


def _emit_schema(key_cols: list[str]) -> pa.Schema:
    return pa.schema(
        [("window_start", pa.timestamp("us"))]
        + [(k, pa.string()) for k in key_cols]
        + [("n_events", pa.int64()), ("total_value", pa.float64())]
    )


@ray.remote
class WindowStateActor:
    """One hash-partition of the key space: open-window partials,
    watermark, late-drop counter. All per-batch work is vectorized
    (one pandas groupby per ingest); the state merge iterates the
    GROUPS of the batch (distinct window×key combos), never rows."""

    def __init__(self, window_us: int, lateness_us: int,
                 ts_col: str, key_cols: list[str], value_col: str,
                 slide_us: "int | None" = None):
        self.w = window_us
        # hopping windows: starts aligned to ``slide``; every event
        # belongs to w/slide overlapping windows. slide == window (the
        # default) degenerates to tumbling.
        self.slide = slide_us or window_us
        if self.w % self.slide:
            raise ValueError("window must be a multiple of slide")
        self.hops = self.w // self.slide
        self.late = lateness_us
        self.ts_col = ts_col
        self.key_cols = list(key_cols)
        self.value_col = value_col
        self.state: dict = {}  # (win_start_us, *keys) → [n, sum]
        self.horizon = None  # emitted-through watermark (us)
        self.max_ts = None
        self.n_dropped = 0
        self.max_open = 0

    def _emit_ready(self) -> pa.Table:
        wm = (self.max_ts - self.late) if self.max_ts is not None else None
        rows = []
        if wm is not None:
            for k in sorted(self.state):
                if k[0] + self.w <= wm:
                    rows.append((k, self.state.pop(k)))
            self.horizon = wm
        return self._table(rows)

    def _table(self, rows) -> pa.Table:
        sch = _emit_schema(self.key_cols)
        if not rows:
            return sch.empty_table()
        cols = {
            "window_start": pa.array(
                [r[0][0] for r in rows], pa.timestamp("us")),
            "n_events": pa.array([r[1][0] for r in rows], pa.int64()),
            "total_value": pa.array([r[1][1] for r in rows],
                                    pa.float64()),
        }
        for i, kc in enumerate(self.key_cols):
            cols[kc] = pa.array([r[0][1 + i] for r in rows], pa.string())
        return pa.table({f.name: cols[f.name] for f in sch})

    def ingest(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _emit_schema(self.key_cols).empty_table()
        df = tbl.to_pandas()
        ts = (df[self.ts_col].astype("datetime64[us]")
              .astype("int64").to_numpy())
        base = (ts // self.slide) * self.slide
        # one (event, window) assignment per hop — vectorized tile;
        # tumbling (hops == 1) replicates nothing. Lateness applies per
        # ASSIGNMENT: an event can be late for its oldest hop window
        # yet timely for newer ones (n_dropped counts assignments).
        win = np.concatenate(
            [base - k * self.slide for k in range(self.hops)])
        rep = np.tile(np.arange(len(ts)), self.hops)
        if self.horizon is not None:
            late = (win + self.w) <= self.horizon
            n_late = int(late.sum())
            if n_late:
                self.n_dropped += n_late
                keep = ~late
                win, rep = win[keep], rep[keep]
        if len(rep):
            vals = df[self.value_col].to_numpy()
            g = (
                pd.DataFrame({
                    "__w": win,
                    **{k: df[k].to_numpy()[rep]
                       for k in self.key_cols},
                    "__v": vals[rep],
                })
                .groupby(["__w"] + self.key_cols, sort=False)
                .agg(__n=("__v", "size"), __s=("__v", "sum"))
                .reset_index()
            )
            for wv, nv, sv, *keys in zip(
                g["__w"].to_numpy(), g["__n"].to_numpy(),
                g["__s"].to_numpy(),
                *[g[k].to_numpy() for k in self.key_cols],
            ):
                key = (int(wv),) + tuple(keys)
                cur = self.state.get(key)
                if cur is None:
                    self.state[key] = [int(nv), float(sv)]
                else:
                    cur[0] += int(nv)
                    cur[1] += float(sv)
            mx = int(ts.max())
            self.max_ts = mx if self.max_ts is None else max(
                self.max_ts, mx)
        out = self._emit_ready()
        # the bounded-state invariant is about what PERSISTS across
        # micro-batches (open windows inside the disorder horizon);
        # within-batch transient entries emit in the same call
        self.max_open = max(self.max_open, len(self.state))
        return out

    def flush(self) -> pa.Table:
        rows = [(k, self.state.pop(k)) for k in sorted(self.state)]
        return self._table(rows)

    def stats(self) -> dict:
        return {"n_dropped": self.n_dropped, "max_open": self.max_open,
                "open_now": len(self.state)}


@ray.remote
def _split_by_key(tbl: pa.Table, key_cols, n_parts: int):
    """Hash-split one block by key so every key lands on ONE actor
    (the same dtype-normalized hash as the bucket join exchange)."""
    if tbl.num_rows == 0:
        # Ray's sort synthesizes zero-column empty blocks on tiny
        # inputs; the actors no-op on empty tables, so just fan the
        # empty block out
        out = tuple(tbl for _ in range(n_parts))
        return out if n_parts > 1 else out[0]
    df = tbl.select(list(key_cols)).to_pandas()
    df.columns = range(len(df.columns))
    for c in df.columns:
        if isinstance(df[c].dtype, pd.CategoricalDtype):
            df[c] = df[c].astype(object)
        elif pd.api.types.is_bool_dtype(df[c]) or \
                pd.api.types.is_numeric_dtype(df[c]):
            df[c] = pd.to_numeric(df[c]).astype("float64")
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    b = (h % np.uint64(n_parts)).astype(np.int64)
    out = tuple(tbl.take(np.flatnonzero(b == i)) for i in range(n_parts))
    return out if n_parts > 1 else out[0]


def stream_tumbling_agg(
    ds,
    *,
    ts_col: str = "ts",
    key_cols=("event_type",),
    value_col: str = "value",
    window: str = "6h",
    slide: "str | None" = None,
    lateness: str = "0s",
    n_partitions: int = 8,
    ordered: bool = True,
):
    """Feed a Dataset through key-partitioned window actors in arrival
    order. Returns ``{"result": Dataset of emitted windows,
    "n_late_dropped": int, "max_open_windows": int}``.

    ``slide``: hop interval for HOPPING (sliding) windows — window
    starts align to ``slide`` and every event contributes to
    ``window/slide`` overlapping windows. None (default) = tumbling.

    ``ordered=True`` sorts the stream by event time first — the
    deterministic replay mode (oracle parity; no event is ever late).
    ``ordered=False`` feeds blocks as they come: results equal the
    batch aggregate iff ``lateness`` covers the stream's disorder;
    beyond it, late events are counted and dropped (inspect
    ``n_late_dropped``)."""
    key_cols = list(key_cols)
    w_us, l_us = _dur_us(window), _dur_us(lateness)
    s_us = _dur_us(slide) if slide else None
    actors = [
        WindowStateActor.remote(w_us, l_us, ts_col, key_cols, value_col,
                                slide_us=s_us)
        for _ in range(n_partitions)
    ]
    src = ds.sort(ts_col) if ordered else ds
    refs = src.materialize().to_arrow_refs()  # sorted block order = feed order
    emitted = []
    for blk in refs:
        subs = _split_by_key.options(
            num_returns=n_partitions if n_partitions > 1 else 1
        ).remote(blk, tuple(key_cols), n_partitions)
        if n_partitions == 1:
            subs = [subs]
        for i in range(n_partitions):
            emitted.append(actors[i].ingest.remote(subs[i]))
    emitted.extend(a.flush.remote() for a in actors)
    stats = ray.get([a.stats.remote() for a in actors])
    result = rd.from_arrow_refs(emitted)
    return {
        "result": result,
        "n_late_dropped": int(sum(s["n_dropped"] for s in stats)),
        "max_open_windows": int(max(s["max_open"] for s in stats)),
    }


@ray.remote
class SessionStateActor:
    """One hash-partition of the key space for GAP-based session
    windows (the merging-window case tumbling windows don't have).

    Per batch the event rows collapse VECTORIZED into mini-sessions
    (sort + diff + cumsum → one row per contiguous run), and only the
    mini-sessions — sessions-bounded, never event-bounded — merge into
    the open-session state with the textbook interval rule: two
    sessions (or a session and a mini-session) unify when their gap
    distance is ≤ the session gap, so a late event can BRIDGE two open
    sessions into one. A session seals and emits when
    ``last_event + gap ≤ watermark`` (no admissible event can extend
    it: admissible means ``ts ≥ watermark``, which would start a new
    session); late events below the watermark are counted and
    dropped."""

    def __init__(self, gap_us: int, lateness_us: int,
                 ts_col: str, key_col: str, key_type: str = "int64"):
        self.gap = gap_us
        self.late = lateness_us
        self.ts_col = ts_col
        self.key_col = key_col
        self.key_type = key_type
        self.open: dict = {}  # key → sorted list of [start, last, n]
        self.max_ts = None
        self.n_dropped = 0
        self.max_open = 0

    def _schema(self) -> pa.Schema:
        kt = pa.int64() if self.key_type == "int64" else pa.string()
        return pa.schema([
            (self.key_col, kt),
            ("session_start", pa.timestamp("us")),
            ("session_end", pa.timestamp("us")),
            ("n_events", pa.int64()),
        ])

    def _table(self, rows) -> pa.Table:
        sch = self._schema()
        if not rows:
            return sch.empty_table()
        return pa.table({
            self.key_col: pa.array([r[0] for r in rows], sch.types[0]),
            "session_start": pa.array([r[1] for r in rows],
                                      pa.timestamp("us")),
            "session_end": pa.array([r[2] for r in rows],
                                    pa.timestamp("us")),
            "n_events": pa.array([r[3] for r in rows], pa.int64()),
        })

    def ingest(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return self._schema().empty_table()
        df = tbl.to_pandas()
        ts = df[self.ts_col].astype("datetime64[us]").astype("int64")
        if self.max_ts is not None:
            horizon = self.max_ts - self.late
            late = ts < horizon
            n_late = int(late.sum())
            if n_late:
                self.n_dropped += n_late
                keep = ~late
                df, ts = df[keep], ts[keep]
        if len(df):
            d = pd.DataFrame({"k": df[self.key_col].to_numpy(),
                              "t": ts.to_numpy()}).sort_values(["k", "t"],
                                                               kind="mergesort")
            brk = d["k"].ne(d["k"].shift()) | (d["t"].diff() > self.gap)
            sid = brk.cumsum()
            mini = d.groupby(sid, sort=False).agg(
                k=("k", "first"), start=("t", "min"),
                last=("t", "max"), n=("t", "size"))
            for k, start, last, n in zip(
                    mini["k"].to_numpy(), mini["start"].to_numpy(),
                    mini["last"].to_numpy(), mini["n"].to_numpy()):
                lst = self.open.setdefault(k, [])
                merged = [int(start), int(last), int(n)]
                rest = []
                for s in lst:
                    if (merged[0] - s[1] > self.gap
                            or s[0] - merged[1] > self.gap):
                        rest.append(s)  # disjoint beyond the gap
                    else:  # bridge/extend: unify intervals and counts
                        merged = [min(merged[0], s[0]),
                                  max(merged[1], s[1]),
                                  merged[2] + s[2]]
                rest.append(merged)
                rest.sort(key=lambda s: s[0])
                self.open[k] = rest
            mx = int(ts.max())
            self.max_ts = mx if self.max_ts is None else max(
                self.max_ts, mx)
        # seal: no admissible event (ts ≥ watermark) can extend a
        # session whose last + gap < watermark
        rows = []
        if self.max_ts is not None:
            wm = self.max_ts - self.late
            for k in list(self.open):
                still = []
                for s in self.open[k]:
                    if s[1] + self.gap < wm:
                        rows.append((k, s[0], s[1], s[2]))
                    else:
                        still.append(s)
                if still:
                    self.open[k] = still
                else:
                    del self.open[k]
        self.max_open = max(self.max_open,
                            sum(len(v) for v in self.open.values()))
        rows.sort()
        return self._table(rows)

    def flush(self) -> pa.Table:
        rows = [(k, s[0], s[1], s[2])
                for k in sorted(self.open) for s in self.open[k]]
        self.open.clear()
        return self._table(rows)

    def stats(self) -> dict:
        return {"n_dropped": self.n_dropped, "max_open": self.max_open,
                "open_now": sum(len(v) for v in self.open.values())}


def stream_session_windows(
    ds,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30m",
    lateness: str = "0s",
    n_partitions: int = 8,
    ordered: bool = True,
    key_type: str = "int64",
):
    """Gap-based streaming sessionization. Returns ``{"result":
    Dataset of (key, session_start, session_end, n_events) rows,
    "n_late_dropped": int, "max_open_sessions": int}``. Same feed
    contract as :func:`stream_tumbling_agg`; an ordered replay (or
    ``lateness`` ≥ the stream's disorder) reproduces the batch
    sessionization exactly — that equivalence is the operator's DuckDB
    oracle (`q_events_stream_sessions`)."""
    gap_us, l_us = _dur_us(gap), _dur_us(lateness)
    actors = [
        SessionStateActor.remote(gap_us, l_us, ts_col, key_col,
                                 key_type)
        for _ in range(n_partitions)
    ]
    src = ds.sort(ts_col) if ordered else ds
    refs = src.materialize().to_arrow_refs()
    emitted = []
    for blk in refs:
        subs = _split_by_key.options(
            num_returns=n_partitions if n_partitions > 1 else 1
        ).remote(blk, (key_col,), n_partitions)
        if n_partitions == 1:
            subs = [subs]
        for i in range(n_partitions):
            emitted.append(actors[i].ingest.remote(subs[i]))
    emitted.extend(a.flush.remote() for a in actors)
    stats = ray.get([a.stats.remote() for a in actors])
    return {
        "result": rd.from_arrow_refs(emitted),
        "n_late_dropped": int(sum(s["n_dropped"] for s in stats)),
        "max_open_sessions": int(max(s["max_open"] for s in stats)),
    }


def _hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimator (same form as
    functions/sketches.py:hll_distinct, small-range linear counting)."""
    m = len(regs)
    r = regs.astype(np.float64)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -r))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


@ray.remote
class DistinctWindowActor:
    """Watermarked tumbling windows over COUNT(DISTINCT col): per
    (window, key) the state is either the exact value set
    (``mode="exact"`` — right while per-window cardinality is
    driver-heap-ish) or a 2^p-register HyperLogLog (``mode="hll"`` —
    the 100-TB path: fixed bytes per open window regardless of
    cardinality; registers merge by elementwise max, so disorder and
    re-batching never change the estimate). Same watermark/lateness
    contract as WindowStateActor."""

    def __init__(self, window_us: int, lateness_us: int, ts_col: str,
                 key_cols: list[str], distinct_col: str,
                 mode: str = "exact", p: int = 12):
        from recon_ray.functions.sketches import _col_hashes

        self._hashes = _col_hashes
        self.w = window_us
        self.late = lateness_us
        self.ts_col = ts_col
        self.key_cols = list(key_cols)
        self.dcol = distinct_col
        self.mode = mode
        self.p = p
        self.state: dict = {}  # (win, *keys) → set | registers
        self.horizon = None
        self.max_ts = None
        self.n_dropped = 0
        self.max_open = 0

    def _schema(self) -> pa.Schema:
        return pa.schema(
            [("window_start", pa.timestamp("us"))]
            + [(k, pa.string()) for k in self.key_cols]
            + [("n_distinct", pa.int64() if self.mode == "exact"
                else pa.float64())]
        )

    def _table(self, rows) -> pa.Table:
        sch = self._schema()
        if not rows:
            return sch.empty_table()
        vals = [
            (len(st) if self.mode == "exact" else _hll_estimate(st))
            for _k, st in rows
        ]
        cols = {
            "window_start": pa.array([r[0][0] for r in rows],
                                     pa.timestamp("us")),
            "n_distinct": pa.array(vals, sch.types[-1]),
        }
        for i, kc in enumerate(self.key_cols):
            cols[kc] = pa.array([r[0][1 + i] for r in rows],
                                pa.string())
        return pa.table({f.name: cols[f.name] for f in sch})

    def ingest(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return self._schema().empty_table()
        df = tbl.to_pandas()
        ts = (df[self.ts_col].astype("datetime64[us]")
              .astype("int64").to_numpy())
        win = (ts // self.w) * self.w
        if self.horizon is not None:
            late = (win + self.w) <= self.horizon
            n_late = int(late.sum())
            if n_late:
                self.n_dropped += n_late
                keep = ~late
                df, ts, win = df[keep], ts[keep], win[keep]
        if len(df):
            d = pd.DataFrame({
                "__w": win,
                **{k: df[k].to_numpy() for k in self.key_cols},
                "__v": df[self.dcol].to_numpy(),
            })
            # one group per distinct (window, key) in the batch; the
            # per-group update is vectorized over that group's rows
            for gk, g in d.groupby(["__w"] + self.key_cols,
                                   sort=False):
                gk = gk if isinstance(gk, tuple) else (gk,)
                key = (int(gk[0]),) + tuple(gk[1:])
                if self.mode == "exact":
                    st = self.state.setdefault(key, set())
                    st.update(g["__v"].unique().tolist())
                else:
                    h = self._hashes(g.rename(columns={"__v": "c"}),
                                     "c")
                    m = 1 << self.p
                    idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
                    rest = h << np.uint64(self.p)
                    nbits = 64 - self.p
                    lz = np.full(len(h), nbits, dtype=np.int64)
                    cur = rest.copy()
                    found = np.zeros(len(h), dtype=bool)
                    for b in range(nbits):
                        top = (cur >> np.uint64(63)) & np.uint64(1)
                        hit = (~found) & (top == 1)
                        lz[hit] = b
                        found |= hit
                        cur = cur << np.uint64(1)
                    regs = self.state.setdefault(
                        key, np.zeros(m, dtype=np.int8))
                    np.maximum.at(regs, idx,
                                  (lz + 1).astype(np.int8))
            mx = int(ts.max())
            self.max_ts = mx if self.max_ts is None else max(
                self.max_ts, mx)
        rows = []
        if self.max_ts is not None:
            wm = self.max_ts - self.late
            for k in sorted(self.state):
                if k[0] + self.w <= wm:
                    rows.append((k, self.state.pop(k)))
            self.horizon = wm
        out = self._table(rows)
        self.max_open = max(self.max_open, len(self.state))
        return out

    def flush(self) -> pa.Table:
        rows = [(k, self.state.pop(k)) for k in sorted(self.state)]
        return self._table(rows)

    def stats(self) -> dict:
        return {"n_dropped": self.n_dropped, "max_open": self.max_open,
                "open_now": len(self.state)}


def stream_distinct_agg(
    ds,
    *,
    ts_col: str = "ts",
    key_cols=("event_type",),
    distinct_col: str = "user_id",
    window: str = "6h",
    lateness: str = "0s",
    mode: str = "exact",
    p: int = 12,
    n_partitions: int = 8,
    ordered: bool = True,
):
    """Watermarked COUNT(DISTINCT) per tumbling window. ``mode="exact"``
    keeps per-window value sets (oracle-able); ``mode="hll"`` keeps
    fixed-size mergeable registers — the scale path (disorder-proof:
    register max is order-free). Same feed contract as
    :func:`stream_tumbling_agg`."""
    key_cols = list(key_cols)
    w_us, l_us = _dur_us(window), _dur_us(lateness)
    actors = [
        DistinctWindowActor.remote(w_us, l_us, ts_col, key_cols,
                                   distinct_col, mode, p)
        for _ in range(n_partitions)
    ]
    src = ds.sort(ts_col) if ordered else ds
    refs = src.materialize().to_arrow_refs()
    emitted = []
    for blk in refs:
        subs = _split_by_key.options(
            num_returns=n_partitions if n_partitions > 1 else 1
        ).remote(blk, tuple(key_cols), n_partitions)
        if n_partitions == 1:
            subs = [subs]
        for i in range(n_partitions):
            emitted.append(actors[i].ingest.remote(subs[i]))
    emitted.extend(a.flush.remote() for a in actors)
    stats = ray.get([a.stats.remote() for a in actors])
    return {
        "result": rd.from_arrow_refs(emitted),
        "n_late_dropped": int(sum(s["n_dropped"] for s in stats)),
        "max_open_windows": int(max(s["max_open"] for s in stats)),
    }


@ray.remote
def _split_by_window(tbl: pa.Table, ts_col: str, w_us: int,
                     n_parts: int):
    """Hash-split one block by WINDOW assignment (floor(ts/w)) — for
    per-window rankings every row of a window must land on one actor
    (keys alone won't do: ranking is global within the window)."""
    if tbl.num_rows == 0:
        out = tuple(tbl for _ in range(n_parts))
        return out if n_parts > 1 else out[0]
    ts = (tbl.column(ts_col).to_pandas()
          .astype("datetime64[us]").astype("int64").to_numpy())
    win = (ts // w_us) * w_us
    h = pd.util.hash_pandas_object(
        pd.Series(win), index=False).to_numpy()
    b = (h % np.uint64(n_parts)).astype(np.int64)
    out = tuple(tbl.take(np.flatnonzero(b == i)) for i in range(n_parts))
    return out if n_parts > 1 else out[0]


@ray.remote
class TopKWindowActor:
    """Per-window top-k items. ``mode="exact"``: a full item→count map
    per open window (oracle-able; right while per-window cardinality is
    heap-ish). ``mode="mg"``: a Misra-Gries summary of ``capacity``
    counters per window — fixed memory; any item with true frequency
    > window_n/capacity is guaranteed present (the classic heavy-hitter
    bound), so the true top-k survives on skewed streams. Emission
    ranks by (count DESC, item ASC) and keeps k rows per window."""

    def __init__(self, window_us: int, lateness_us: int, ts_col: str,
                 item_col: str, k: int, mode: str = "exact",
                 capacity: int = 256):
        self.w = window_us
        self.late = lateness_us
        self.ts_col = ts_col
        self.item_col = item_col
        self.k = k
        self.mode = mode
        self.cap = capacity
        self.state: dict = {}  # win_start → {item: count}
        self.horizon = None
        self.max_ts = None
        self.n_dropped = 0
        self.max_open = 0

    def _schema(self) -> pa.Schema:
        return pa.schema([
            ("window_start", pa.timestamp("us")),
            ("item", pa.int64()),
            ("n", pa.int64()),
        ])

    def _table(self, rows) -> pa.Table:
        sch = self._schema()
        if not rows:
            return sch.empty_table()
        return pa.table({
            "window_start": pa.array([r[0] for r in rows],
                                     pa.timestamp("us")),
            "item": pa.array([r[1] for r in rows], pa.int64()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
        })

    def ingest(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return self._schema().empty_table()
        df = tbl.to_pandas()
        ts = (df[self.ts_col].astype("datetime64[us]")
              .astype("int64").to_numpy())
        win = (ts // self.w) * self.w
        if self.horizon is not None:
            late = (win + self.w) <= self.horizon
            n_late = int(late.sum())
            if n_late:
                self.n_dropped += n_late
                keep = ~late
                df, ts, win = df[keep], ts[keep], win[keep]
        if len(df):
            counts = (
                pd.DataFrame({"__w": win,
                              "__i": df[self.item_col].to_numpy()})
                .groupby(["__w", "__i"], sort=False)
                .size().reset_index(name="__n")
            )
            # merge loop is (window × distinct-item-in-batch)-bounded
            for wv, iv, nv in zip(counts["__w"].to_numpy(),
                                  counts["__i"].to_numpy(),
                                  counts["__n"].to_numpy()):
                st = self.state.setdefault(int(wv), {})
                item, add = int(iv), int(nv)
                if item in st or self.mode == "exact" \
                        or len(st) < self.cap:
                    st[item] = st.get(item, 0) + add
                else:
                    # Misra-Gries decrement: new item with a full
                    # summary → subtract min(add, current minimum)
                    # from EVERY counter, evicting zeros; survivors'
                    # counts stay lower bounds within n/capacity
                    dec = min(add, min(st.values()))
                    st = {i: c - dec for i, c in st.items() if c > dec}
                    if add > dec:
                        st[item] = add - dec
                    self.state[int(wv)] = st
            mx = int(ts.max())
            self.max_ts = mx if self.max_ts is None else max(
                self.max_ts, mx)
        rows = []
        if self.max_ts is not None:
            wm = self.max_ts - self.late
            for w0 in sorted(self.state):
                if w0 + self.w <= wm:
                    st = self.state.pop(w0)
                    top = sorted(st.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[: self.k]
                    rows.extend((w0, i, c) for i, c in top)
            self.horizon = wm
        out = self._table(rows)
        self.max_open = max(self.max_open, len(self.state))
        return out

    def flush(self) -> pa.Table:
        rows = []
        for w0 in sorted(self.state):
            st = self.state.pop(w0)
            top = sorted(st.items(),
                         key=lambda kv: (-kv[1], kv[0]))[: self.k]
            rows.extend((w0, i, c) for i, c in top)
        return self._table(rows)

    def stats(self) -> dict:
        return {"n_dropped": self.n_dropped, "max_open": self.max_open,
                "open_now": len(self.state)}


def stream_topk_agg(
    ds,
    *,
    ts_col: str = "ts",
    item_col: str = "user_id",
    window: str = "6h",
    k: int = 5,
    lateness: str = "0s",
    mode: str = "exact",
    capacity: int = 256,
    n_partitions: int = 8,
    ordered: bool = True,
):
    """Watermarked per-window top-k items. Rows split by WINDOW (a
    ranking needs its whole window on one actor), so actors own whole
    windows and emit exactly k (count DESC, item ASC) rows per sealed
    window. ``mode="mg"`` bounds per-window memory with a Misra-Gries
    summary (heavy hitters guaranteed above n/capacity)."""
    w_us, l_us = _dur_us(window), _dur_us(lateness)
    actors = [
        TopKWindowActor.remote(w_us, l_us, ts_col, item_col, k, mode,
                               capacity)
        for _ in range(n_partitions)
    ]
    src = ds.sort(ts_col) if ordered else ds
    refs = src.materialize().to_arrow_refs()
    emitted = []
    for blk in refs:
        subs = _split_by_window.options(
            num_returns=n_partitions if n_partitions > 1 else 1
        ).remote(blk, ts_col, w_us, n_partitions)
        if n_partitions == 1:
            subs = [subs]
        for i in range(n_partitions):
            emitted.append(actors[i].ingest.remote(subs[i]))
    emitted.extend(a.flush.remote() for a in actors)
    stats = ray.get([a.stats.remote() for a in actors])
    return {
        "result": rd.from_arrow_refs(emitted),
        "n_late_dropped": int(sum(s["n_dropped"] for s in stats)),
        "max_open_windows": int(max(s["max_open"] for s in stats)),
    }


@ray.remote
class IntervalJoinActor:
    """Stream-stream event-time interval join (the attribution shape):
    emit (left_id, right_id) for every left/right pair of the same KEY
    with ``right.ts ∈ [left.ts, left.ts + horizon]`` — e.g. purchases
    attributed to a preceding view within 24 h.

    Per key the actor buffers BOTH sides inside their liveness
    horizons (a left dies when ``ts + horizon < watermark``, a right
    when ``ts < watermark`` — no admissible future partner exists
    beyond those). Matching is fully vectorized per (key, batch):
    pairs(all) − pairs(buffered-only) via ``searchsorted`` window
    bounds, so each pair emits exactly once no matter which side
    arrives second (disorder within the lateness budget included)."""

    def __init__(self, horizon_us: int, lateness_us: int):
        self.h = horizon_us
        self.late = lateness_us
        # key → (np.ndarray ts, np.ndarray id) per side, ts-sorted
        self.left: dict = {}
        self.right: dict = {}
        # two-input watermark = min(per-side max ts) − lateness (the
        # Flink rule): one stream running ahead must not expire the
        # other's still-admissible partners
        self.max_l = None
        self.max_r = None
        self.n_dropped = 0
        self.max_buffered = 0

    def _wm(self):
        if self.max_l is None or self.max_r is None:
            return None
        return min(self.max_l, self.max_r) - self.late

    @staticmethod
    def _schema() -> pa.Schema:
        return pa.schema([("left_id", pa.int64()),
                          ("right_id", pa.int64())])

    @staticmethod
    def _pairs(lt, li, rt, ri, h):
        """All (left_id, right_id) with rt ∈ [lt, lt+h]; inputs
        ts-sorted per side. Vectorized: per left, a searchsorted
        window over the right array."""
        if not len(lt) or not len(rt):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        lo = np.searchsorted(rt, lt, side="left")
        hi = np.searchsorted(rt, lt + h, side="right")
        counts = hi - lo
        keep = counts > 0
        if not keep.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        lo, hi, counts = lo[keep], hi[keep], counts[keep]
        lids = np.repeat(li[keep], counts)
        offs = np.concatenate([np.arange(a, b) for a, b in zip(lo, hi)])
        return lids, ri[offs]

    def ingest(self, ltbl: pa.Table, rtbl: pa.Table) -> pa.Table:
        la_t, la_i = self._extract(ltbl)
        ra_t, ra_i = self._extract(rtbl)
        wm_in = self._wm()
        if wm_in is not None:
            for side in ("L", "R"):
                t, i = (la_t, la_i) if side == "L" else (ra_t, ra_i)
                m = t < wm_in
                nd = int(m.sum())
                if nd:
                    self.n_dropped += nd
                    if side == "L":
                        la_t, la_i = t[~m], i[~m]
                    else:
                        ra_t, ra_i = t[~m], i[~m]
        out_l, out_r = [], []
        keys = set()
        kl = self._group(ltbl, la_t, la_i)
        kr = self._group(rtbl, ra_t, ra_i)
        keys = set(kl) | set(kr)
        for k in keys:
            nlt, nli = kl.get(k, (np.empty(0, np.int64),
                                  np.empty(0, np.int64)))
            nrt, nri = kr.get(k, (np.empty(0, np.int64),
                                  np.empty(0, np.int64)))
            olt, oli = self.left.get(k, (np.empty(0, np.int64),
                                         np.empty(0, np.int64)))
            ort, ori = self.right.get(k, (np.empty(0, np.int64),
                                          np.empty(0, np.int64)))
            alt = np.concatenate([olt, nlt])
            ali = np.concatenate([oli, nli])
            art = np.concatenate([ort, nrt])
            ari = np.concatenate([ori, nri])
            o = np.argsort(alt, kind="stable")
            alt, ali = alt[o], ali[o]
            o = np.argsort(art, kind="stable")
            art, ari = art[o], ari[o]
            # exactly-once: pairs(all) minus pairs(old, old)
            l_all, r_all = self._pairs(alt, ali, art, ari, self.h)
            l_old, r_old = self._pairs(olt, oli, ort, ori, self.h)
            if len(l_old):
                seen = set(zip(l_old.tolist(), r_old.tolist()))
                keep = [j for j in range(len(l_all))
                        if (int(l_all[j]), int(r_all[j])) not in seen]
                l_all, r_all = l_all[keep], r_all[keep]
            out_l.append(l_all)
            out_r.append(r_all)
            self.left[k] = (alt, ali)
            self.right[k] = (art, ari)
        if len(la_t):
            mx = int(la_t.max())
            self.max_l = mx if self.max_l is None else max(
                self.max_l, mx)
        if len(ra_t):
            mx = int(ra_t.max())
            self.max_r = mx if self.max_r is None else max(
                self.max_r, mx)
        # evict dead buffer entries (no admissible future partner)
        wm = self._wm()
        if wm is not None:
            for k in list(self.left):
                t, i = self.left[k]
                m = t + self.h >= wm
                if m.all():
                    continue
                if m.any():
                    self.left[k] = (t[m], i[m])
                else:
                    del self.left[k]
            for k in list(self.right):
                t, i = self.right[k]
                m = t >= wm
                if m.all():
                    continue
                if m.any():
                    self.right[k] = (t[m], i[m])
                else:
                    del self.right[k]
        self.max_buffered = max(
            self.max_buffered,
            sum(len(t) for t, _ in self.left.values())
            + sum(len(t) for t, _ in self.right.values()))
        if out_l:
            lcat = np.concatenate(out_l)
            rcat = np.concatenate(out_r)
        else:
            lcat = rcat = np.empty(0, np.int64)
        return pa.table({"left_id": pa.array(lcat, pa.int64()),
                         "right_id": pa.array(rcat, pa.int64())})

    @staticmethod
    def _extract(tbl: pa.Table):
        if tbl.num_rows == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        df = tbl.to_pandas()
        ts = (df["__ts"].astype("datetime64[us]")
              .astype("int64").to_numpy())
        return ts, df["__id"].to_numpy().astype(np.int64)

    @staticmethod
    def _group(tbl: pa.Table, ts: np.ndarray, ids: np.ndarray):
        out: dict = {}
        if tbl.num_rows == 0 or not len(ts):
            return out
        keys = tbl.to_pandas()["__k"].to_numpy()
        # ts/ids may be pre-filtered shorter than tbl (late drops):
        # align by re-reading through the same mask is unnecessary —
        # the caller passes ts/ids EXTRACTED from tbl, then filtered;
        # regroup on the filtered ids via an id→position map
        if len(ts) != len(keys):
            pos = {int(i): j for j, i in enumerate(
                tbl.to_pandas()["__id"].to_numpy())}
            keys = np.asarray([keys[pos[int(i)]] for i in ids])
        order = np.argsort(keys, kind="stable")
        ks, t_s, i_s = keys[order], ts[order], ids[order]
        bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        for b, e in zip(bounds, np.r_[bounds[1:], len(ks)]):
            out[ks[b]] = (t_s[b:e], i_s[b:e])
        return out

    def stats(self) -> dict:
        return {"n_dropped": self.n_dropped,
                "max_buffered": self.max_buffered}


def stream_interval_join(
    left_ds,
    right_ds,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    horizon: str = "24h",
    lateness: str = "0s",
    n_partitions: int = 8,
    ordered: bool = True,
):
    """Stream-stream event-time interval join: (left_id, right_id) for
    same-key pairs with ``right.ts ∈ [left.ts, left.ts + horizon]``.
    Both streams hash-split by KEY to the same actor set; each actor
    buffers only events inside their liveness horizons, so memory is
    bounded by (active keys × horizon rate), never stream length.
    Pairs emit exactly once regardless of arrival order within the
    lateness budget. Returns {"result": Dataset(left_id, right_id),
    "n_late_dropped": int, "max_buffered": int}."""
    h_us, l_us = _dur_us(horizon), _dur_us(lateness)
    actors = [IntervalJoinActor.remote(h_us, l_us)
              for _ in range(n_partitions)]

    def prep(ds):
        ds = ds.map_batches(
            lambda t, kc=key_col, tc=ts_col, ic=id_col: pa.table({
                "__k": t.column(kc), "__ts": t.column(tc),
                "__id": t.column(ic)}),
            batch_format="pyarrow", zero_copy_batch=True)
        if ordered:
            ds = ds.sort("__ts")
        # order-preserving coalesce: ingest-call count is blocks ×
        # partitions, and the per-call buffered-pair subtraction is
        # recomputed per micro-batch — fewer, bigger micro-batches
        # amortize both
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow",
                            batch_size=32768)
        return ds.materialize().to_arrow_refs()

    lrefs, rrefs = prep(left_ds), prep(right_ds)
    # zip the two streams' blocks into joint micro-batches (pad the
    # shorter side with empty tables)
    empty = pa.table({"__k": pa.array([], pa.int64()),
                      "__ts": pa.array([], pa.timestamp("us")),
                      "__id": pa.array([], pa.int64())})
    emitted = []
    for j in range(max(len(lrefs), len(rrefs))):
        lb = lrefs[j] if j < len(lrefs) else ray.put(empty)
        rb = rrefs[j] if j < len(rrefs) else ray.put(empty)
        lsub = _split_by_key.options(
            num_returns=n_partitions if n_partitions > 1 else 1
        ).remote(lb, ("__k",), n_partitions)
        rsub = _split_by_key.options(
            num_returns=n_partitions if n_partitions > 1 else 1
        ).remote(rb, ("__k",), n_partitions)
        if n_partitions == 1:
            lsub, rsub = [lsub], [rsub]
        for i in range(n_partitions):
            emitted.append(actors[i].ingest.remote(lsub[i], rsub[i]))
    stats = ray.get([a.stats.remote() for a in actors])
    return {
        "result": rd.from_arrow_refs(emitted),
        "n_late_dropped": int(sum(s["n_dropped"] for s in stats)),
        "max_buffered": int(max(s["max_buffered"] for s in stats)),
    }
