"""Mergeable sketches — the approximate-aggregate toolkit a 100-TB table
needs when exact answers would shuffle the world:

- ``hll_distinct``: HyperLogLog distinct count. Each batch emits one
  2^p-byte register row; registers merge by elementwise max (order-free),
  so the reduce is a tiny driver fold no matter the input size.
- ``exact_quantiles``: EXACT distributed quantiles in two streaming
  passes — a per-batch histogram (order-free int64 partial sums) locates
  the bucket holding each quantile, then one filtered pass collects only
  those buckets' values (≈ n/n_buckets rows) and picks the exact order
  statistic. No global sort, no full materialization.
- ``heavy_hitters``: Misra-Gries candidates (pass 1, mergeable summaries
  with the frequency > n/capacity survival guarantee) + an exact count of
  the candidate set (pass 2, broadcast membership) → exact top-k with
  exact counts, without ever shuffling the full key universe.

All results are deterministic under any execution order: partials are
integers (max / sum), so the reduce is associative-commutative exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _hash64(arr: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64 finalizer) of an int64/uint64
    array; strings must be pre-hashed by the caller."""
    h = arr.astype(np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _hash_strings(values) -> np.ndarray:
    import hashlib

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.sha1(str(v).encode()).digest()[:8], "little"
        )
    return out


def _col_hashes(batch: pd.DataFrame, col: str) -> np.ndarray:
    v = batch[col]
    if pd.api.types.is_integer_dtype(v):
        return _hash64(v.to_numpy())
    return _hash_strings(v.to_numpy())


def hll_distinct(ds, col: str, p: int = 12) -> dict:
    """HyperLogLog distinct count of ``ds[col]`` (standard bias-corrected
    estimator, 2^p registers → ~1.04/√2^p relative error). One streaming
    pass; each batch contributes a register row, merged by max."""
    m = 1 << p

    def registers(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"regs": []})
        h = _col_hashes(batch, col)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)  # remaining bits, MSB-aligned
        # rank = position of first set bit in the remaining 64-p bits + 1
        nbits = 64 - p
        lz = np.full(len(h), nbits, dtype=np.int64)
        cur = rest.copy()
        found = np.zeros(len(h), dtype=bool)
        for b in range(nbits):
            top = (cur >> np.uint64(63)) & np.uint64(1)
            hit = (~found) & (top == 1)
            lz[hit] = b
            found |= hit
            cur = cur << np.uint64(1)
        rank = lz + 1
        regs = np.zeros(m, dtype=np.int8)
        np.maximum.at(regs, idx, rank.astype(np.int8))
        return pd.DataFrame({"regs": [regs.tobytes()]})

    parts = ds.map_batches(registers, batch_format="pandas").to_pandas()
    regs = np.zeros(m, dtype=np.int8)
    for b in parts["regs"]:
        regs = np.maximum(regs, np.frombuffer(b, dtype=np.int8))
    r = regs.astype(np.float64)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -r))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return {"estimate": float(est), "registers": regs, "p": p}


def exact_quantiles(ds, col: str, qs: list, n_buckets: int = 4096,
                    mode: str = "disc") -> list:
    """EXACT quantiles in two streaming passes. ``mode="disc"``
    (default): the element at (0-based) rank ``ceil(q·n) - 1``
    (clamped) of the sorted column — DuckDB's ``quantile_disc``
    definition. ``mode="cont"``: linear interpolation between the two
    order statistics bracketing position ``RN=(n-1)·q`` as
    ``lo·(CRN−RN) + hi·(RN−FRN)`` — DuckDB's ``quantile_cont`` /
    ``median`` Interpolator op order, so either form is
    SQL-oracle-verifiable bit-for-bit against the NATIVE aggregate.

    Pass 1: global [min, max] + a fixed-width int64 histogram (per-batch
    partial sums → order-free reduce). Pass 2: only rows falling in the
    buckets that contain requested ranks are collected (≈ n/n_buckets
    values per quantile), and the exact order statistic is read off. NaNs
    are ignored, matching SQL aggregate semantics."""
    stat = ds.map_batches(
        lambda b: pd.DataFrame(
            {
                "lo": [np.nanmin(b[col].to_numpy(np.float64))]
                if len(b) else [np.inf],
                "hi": [np.nanmax(b[col].to_numpy(np.float64))]
                if len(b) else [-np.inf],
                "n": [int(b[col].notna().sum())],
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    lo, hi, n = float(stat["lo"].min()), float(stat["hi"].max()), int(stat["n"].sum())
    if n == 0:
        return [None] * len(qs)
    if lo == hi:
        return [lo] * len(qs)
    width = (hi - lo) / n_buckets

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, n_buckets - 1)
        counts = np.bincount(idx, minlength=n_buckets).astype(np.int64)
        return pd.DataFrame({"counts": [counts.tobytes()]})

    parts = ds.map_batches(hist, batch_format="pandas").to_pandas()
    counts = np.zeros(n_buckets, dtype=np.int64)
    for b in parts["counts"]:
        counts += np.frombuffer(b, dtype=np.int64)
    cum = np.cumsum(counts)
    # per q: (rank_lo, rank_hi, frac) — disc needs one rank (frac 0),
    # cont brackets position (n-1)·q with two adjacent order statistics
    specs = []
    for q in qs:
        if mode == "cont":
            pos = (n - 1) * float(q)
            r_lo = min(max(int(np.floor(pos)), 0), n - 1)
            r_hi = min(max(int(np.ceil(pos)), 0), n - 1)
            specs.append((r_lo, r_hi, pos))
        else:
            r = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
            specs.append((r, r, None))
    ranks = sorted({r for s in specs for r in s[:2]})
    need_set = {int(np.searchsorted(cum, r + 1)) for r in ranks}
    ref = ray.put(need_set)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        v = batch[col].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, n_buckets - 1)
        mask = np.isin(idx, list(want))
        return pd.DataFrame({"v": v[mask], "bucket": idx[mask]})

    picked = ds.map_batches(pick, batch_format="pandas").to_pandas()

    def stat(r: int) -> float:
        b = int(np.searchsorted(cum, r + 1))
        before = int(cum[b - 1]) if b > 0 else 0
        vals = np.sort(picked.loc[picked["bucket"] == b, "v"].to_numpy())
        return float(vals[r - before])

    out = []
    for (r_lo, r_hi, pos) in specs:
        v_lo = stat(r_lo)
        if pos is None or r_hi == r_lo:
            out.append(v_lo)
        else:
            # DuckDB's Interpolator op order:
            # lo·(CRN−RN) + hi·(RN−FRN)
            frn, crn = float(r_lo), float(r_hi)
            out.append(v_lo * (crn - pos) + stat(r_hi) * (pos - frn))
    return out


def grouped_quantiles(ds, key: str, col: str, qs: list,
                      mode: str = "disc") -> pd.DataFrame:
    """EXACT per-group quantiles. ``mode="disc"`` (default): the
    element at 0-based rank ceil(q·n)−1 of each group's sorted column
    (DuckDB ``quantile_disc``). ``mode="cont"``: linear interpolation
    ``lo·(CRN−RN) + hi·(RN−FRN)`` around RN=(n−1)·q (DuckDB's
    ``quantile_cont`` / ``median`` Interpolator op order —
    bit-reproducible against the native aggregate). One hash shuffle on the group key, then each
    bucket resolves ALL its groups vectorized: one sort, per-group
    offsets via cumsum, one fancy index per q — no per-group Python.

    Partitioning assumption: a group's rows fit one bucket frame (groups
    hash-spread across buckets). A single object-store-sized group would
    need the histogram-refinement path (:func:`exact_quantiles`) run
    per hot group instead.

    Returns (key, q, value) sorted by (key, q); NaN VALUES ignored per
    SQL aggregate semantics; empty groups (all-NaN values) drop. A
    NULL KEY forms its own group, like SQL's GROUP BY."""
    from recon_ray.functions.relational import bucketed_group_apply

    qs = [float(q) for q in qs]

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=[col]).sort_values(
            [key, col], kind="mergesort", na_position="last")
        if g.empty:
            return pd.DataFrame({key: pd.Series(dtype=g[key].dtype),
                                 "q": pd.Series(dtype="float64"),
                                 "value": pd.Series(dtype="float64")})
        sizes = g.groupby(key, sort=True, dropna=False).size()
        n = sizes.to_numpy()
        starts = np.concatenate([[0], np.cumsum(n)[:-1]])
        vals = g[col].to_numpy(np.float64)
        keys_out, q_out, v_out = [], [], []
        for q in qs:
            if mode == "cont":
                # DuckDB's Interpolator: RN=(n−1)·q, FRN=floor,
                # CRN=ceil; CRN==FRN → the element, else
                # lo·(CRN−RN) + hi·(RN−FRN) — that exact op order
                pos = (n - 1).astype(np.float64) * q
                frn = np.floor(pos)
                crn = np.ceil(pos)
                lo = np.clip(frn.astype(np.int64), 0, n - 1)
                hi = np.clip(crn.astype(np.int64), 0, n - 1)
                v_lo = vals[starts + lo]
                v_hi = vals[starts + hi]
                v = np.where(crn == frn, v_lo,
                             v_lo * (crn - pos) + v_hi * (pos - frn))
            else:
                ranks = np.clip(
                    np.ceil(q * n).astype(np.int64) - 1, 0, n - 1)
                v = vals[starts + ranks]
            keys_out.append(sizes.index.to_numpy())
            q_out.append(np.full(len(n), q))
            v_out.append(v)
        return pd.DataFrame({key: np.concatenate(keys_out),
                             "q": np.concatenate(q_out),
                             "value": np.concatenate(v_out)})

    out = bucketed_group_apply(
        ds.select_columns([key, col]), key, bucket_fn
    ).to_pandas()
    if out.empty:
        # Ray's all-empty to_pandas drops columns entirely — rebuild
        # the (key, q, value) shape (all groups were empty/all-NaN)
        return pd.DataFrame({key: pd.Series(dtype=object),
                             "q": pd.Series(dtype="float64"),
                             "value": pd.Series(dtype="float64")})
    return out.sort_values([key, "q"]).reset_index(drop=True)


def heavy_hitters(ds, col: str, k: int = 20, capacity: int = 4096) -> pd.DataFrame:
    """Exact top-k (value, count) without shuffling the key universe:
    Misra-Gries summaries per batch (pass 1) merge into a candidate set —
    any value with true frequency > n/capacity is guaranteed present —
    then pass 2 exact-counts ONLY the candidates via broadcast membership.
    Deterministic tie-break: count desc, value asc. Correct whenever the
    true k-th count exceeds n/capacity (loudly asserted)."""

    def mg(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].astype(str).to_numpy()
        u, c = np.unique(v, return_counts=True)
        if len(u) > capacity:  # per-batch truncation keeps summaries small;
            top = np.argsort(-c, kind="stable")[:capacity]
            # the decrement step of classic MG — subtracting the (cap+1)-th
            # count keeps the survival guarantee
            cut = np.sort(c)[::-1][capacity]
            u, c = u[top], np.maximum(c[top] - cut, 0)
            keep = c > 0
            u, c = u[keep], c[keep]
        return pd.DataFrame({"value": u, "cnt": c.astype(np.int64)})

    summaries = ds.map_batches(mg, batch_format="pandas").to_pandas()
    # every value surviving ANY batch summary is a candidate (≤
    # n_batches × capacity rows — bounded, broadcastable); the per-batch
    # guarantee (freq > n_batch/capacity survives) then sums to the
    # global freq > n/capacity guarantee
    cand = set(summaries["value"].unique())
    ref = ray.put(cand)

    def exact(batch: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        v = batch[col].astype(str).to_numpy()
        n_total = len(v)
        mask = np.fromiter((x in want for x in v), dtype=bool, count=len(v))
        u, c = np.unique(v[mask], return_counts=True)
        return pd.DataFrame(
            {"value": np.append(u, "\x00total"),
             "cnt": np.append(c, n_total).astype(np.int64)}
        )

    counts = ds.map_batches(exact, batch_format="pandas").to_pandas()
    agg2 = counts.groupby("value", sort=False)["cnt"].sum()
    n = int(agg2.pop("\x00total"))
    out = (
        agg2.reset_index()
        .rename(columns={"cnt": "count"})
        .sort_values(["count", "value"], ascending=[False, True],
                     kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    if len(out) == k and int(out["count"].iloc[-1]) * capacity <= n:
        raise AssertionError(
            "heavy_hitters guarantee violated: k-th count ≤ n/capacity — "
            "raise capacity"
        )
    out["count"] = out["count"].astype("int64")
    return out


def approx_quantiles(ds, col: str, qs: list, k: int = 2048) -> list:
    """ONE-pass mergeable approximate quantiles via a deterministic
    bottom-k (KMV) sample: every batch keeps its k values with the
    LOWEST splitmix64 hash of (value, tie-salt); partials merge by
    re-taking the global bottom-k (associative, commutative, exact —
    the same rows survive under any layout), and quantiles read off the
    sorted sample. A hash-ordered bottom-k is a uniform sample without
    RNG, so the estimate is deterministic AND layout-invariant, with
    standard KMV error ~1/√k. Use `exact_quantiles` when two passes are
    affordable; this is the single-pass 100-TB fallback (e.g. feeding
    `window_over` bounds or curation gates where ±1% is fine).

    Duplicate values hash identically, so without a tie-breaker heavy
    duplicates are under-represented; pass ``col=(value_col, id_col)``
    to salt each row with its globally-unique id (still deterministic
    and layout-invariant — the salt must be a ROW property, never a
    batch-local counter).
    """
    id_col = None
    if isinstance(col, tuple):
        col, id_col = col

    def bottomk(batch: pd.DataFrame) -> pd.DataFrame:
        keep = ~pd.isna(batch[col].to_numpy())
        batch = batch.loc[keep]  # NaNs ignored, like exact_quantiles
        v = batch[col].to_numpy()
        if len(v) == 0:
            return pd.DataFrame({"__h": np.array([], np.uint64),
                                 "__v": np.array([], np.float64)})
        if id_col is not None:
            h = _hash64(
                _hash64(np.asarray(v, np.float64).view(np.int64))
                ^ _hash64(batch[id_col].to_numpy().astype(np.int64))
            )
        else:
            h = _hash64(np.asarray(v, np.float64).view(np.int64))
        take = np.argsort(h, kind="stable")[:k]
        return pd.DataFrame({"__h": h[take],
                             "__v": np.asarray(v, np.float64)[take]})

    parts = ds.map_batches(bottomk, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return [float("nan")] * len(qs)
    # global bottom-k: exact same survivors under any batching
    parts = parts.sort_values(["__h", "__v"], kind="mergesort").head(k)
    sample = np.sort(parts["__v"].to_numpy())
    idx = np.minimum(
        (np.asarray(qs, np.float64) * (len(sample) - 1)).round().astype(int),
        len(sample) - 1,
    )
    return [float(sample[i]) for i in idx]


def histogram(ds, col: str, lo: float, hi: float, n_bins: int = 32
              ) -> pd.DataFrame:
    """Fixed-width histogram over [lo, hi): per-batch int64 bin counts
    (np.bincount) summed across blocks — one combiner pass, no shuffle,
    exact under any layout. Out-of-range values land in the
    underflow/overflow bins (-1 and n_bins, including -inf/+inf); NaN rows
    are dropped. Returns (bin, lo, hi, count) with every bin present,
    zero or not."""
    width = (hi - lo) / n_bins

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        # branch on range FIRST so ±inf never feeds the float->int64 cast
        # (which is undefined for non-finite inputs)
        idx = np.full(len(v), -1, dtype=np.int64)
        mid = (v >= lo) & (v < hi)
        idx[mid] = np.minimum(
            np.floor((v[mid] - lo) / width).astype(np.int64), n_bins - 1
        )
        idx[v >= hi] = n_bins
        c = np.bincount(idx + 1, minlength=n_bins + 2).astype(np.int64)
        return pd.DataFrame({"bin": np.arange(-1, n_bins + 1), "n": c})

    parts = ds.map_batches(counts, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        agg = pd.Series(0, index=np.arange(-1, n_bins + 1), dtype="int64")
    else:
        agg = parts.groupby("bin")["n"].sum().reindex(
            np.arange(-1, n_bins + 1), fill_value=0
        )
    out = pd.DataFrame(
        {"bin": agg.index.to_numpy(np.int64),
         "count": agg.to_numpy(np.int64)}
    )
    out["lo"] = np.where(out["bin"] < 0, -np.inf, lo + out["bin"] * width)
    out["hi"] = np.where(out["bin"] >= n_bins, np.inf,
                         lo + (out["bin"] + 1) * width)
    return out[["bin", "lo", "hi", "count"]].reset_index(drop=True)


def count_min_partials(ds, col: str, depth: int = 4, width: int = 2048):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of ``ds[col]`` as a
    mergeable partial: each batch emits ONE depth×width int64 matrix row
    (frequencies of the batch's values under ``depth`` independent hash
    rows); matrices merge by elementwise SUM, so the reduce is exact,
    order-free, and sized by (depth·width), never by the input.

    Returns the merged ``depth×width`` numpy matrix plus ``n`` (total
    rows). Point estimates overcount by at most εn with probability
    1-δ, ε = e/width, δ = e^-depth."""
    shape = (depth, width)
    # row seeds: fixed xor masks (deterministic across runs/layouts). Each
    # row REMIXES the value hash through _hash64(h ^ seed) — an odd
    # multiplier mod a power-of-two width would make every row a function
    # of h mod width alone (all rows collide together, effective depth 1)
    seeds = _hash64(np.arange(1, depth + 1, dtype=np.uint64))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"cms": [], "n": []})
        h = _col_hashes(batch, col)
        mat = np.zeros(shape, dtype=np.int64)
        for d in range(depth):
            idx = (_hash64(h ^ seeds[d]) % np.uint64(width)).astype(np.int64)
            np.add.at(mat[d], idx, 1)
        return pd.DataFrame({"cms": [mat.tobytes()], "n": [len(batch)]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    mat = np.zeros(shape, dtype=np.int64)
    n = 0
    for b, bn in zip(parts["cms"], parts["n"]):
        mat += np.frombuffer(b, dtype=np.int64).reshape(shape)
        n += int(bn)
    return {"cms": mat, "n": n, "depth": depth, "width": width,
            "seeds": seeds}


def count_min_estimate(sketch: dict, values) -> pd.DataFrame:
    """Point-frequency estimates for ``values`` from a merged Count-Min
    sketch: min over the depth rows (never underestimates)."""
    import hashlib

    vals = list(values)
    if not vals:
        return pd.DataFrame({"value": [], "estimate": []})
    if all(isinstance(v, (int, np.integer)) for v in vals):
        h = _hash64(np.asarray(vals, dtype=np.int64))
    else:
        h = np.empty(len(vals), dtype=np.uint64)
        for i, v in enumerate(vals):
            h[i] = int.from_bytes(
                hashlib.sha1(str(v).encode()).digest()[:8], "little"
            )
    mat, seeds = sketch["cms"], sketch["seeds"]
    width = np.uint64(sketch["width"])
    est = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(sketch["depth"]):
        idx = (_hash64(h ^ seeds[d]) % width).astype(np.int64)
        est = np.minimum(est, mat[d, idx])
    return pd.DataFrame({"value": vals, "estimate": est})


def _bloom_positions(h: np.ndarray, k: int, m: int) -> np.ndarray:
    """k bit positions per input hash via double hashing (Kirsch &
    Mitzenmacher 2006): pos_i = (h1 + i·h2) mod m — shape (len(h), k)."""
    h1 = h
    h2 = _hash64(h ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m)).astype(np.int64)


def bloom_partials(ds, col: str, m_bits: int = 1 << 20, k: int = 7) -> dict:
    """Bloom filter of ``ds[col]`` as a mergeable partial: each batch
    emits ONE packed bit array (m_bits/8 bytes); partials merge by
    bitwise OR, so the reduce is exact, order-free, and sized by the
    filter, never by the input. Guarantee: NO false negatives; false
    positives at rate ≈ (1 - e^{-kn/m})^k. Use m_bits ≈ 10·n and k=7 for
    ~1% FPR. The filter ships to workers via ``ray.put`` for membership
    stages (decontamination / semi-join pre-filters at scale)."""
    m = int(m_bits)
    nbytes = (m + 7) // 8

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"bits": [], "n": []})
        pos = _bloom_positions(_col_hashes(batch, col), k, m).ravel()
        bits = np.zeros(nbytes, dtype=np.uint8)
        np.bitwise_or.at(bits, pos >> 3,
                         np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
        return pd.DataFrame({"bits": [bits.tobytes()], "n": [len(batch)]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    bits = np.zeros(nbytes, dtype=np.uint8)
    n = 0
    for b, bn in zip(parts["bits"], parts["n"]):
        bits |= np.frombuffer(b, dtype=np.uint8)
        n += int(bn)
    return {"bits": bits, "m": m, "k": k, "n": n}


def bloom_contains(sketch: dict, values) -> pd.DataFrame:
    """Membership probe: True ⇒ maybe present (FP possible), False ⇒
    DEFINITELY absent. Vectorized over the probe list."""
    vals = list(values)
    if not vals:
        return pd.DataFrame({"value": [], "present": []})
    if all(isinstance(v, (int, np.integer)) for v in vals):
        h = _hash64(np.asarray(vals, dtype=np.int64))
    else:
        h = _hash_strings(vals)
    pos = _bloom_positions(h, sketch["k"], sketch["m"])
    bits = sketch["bits"]
    hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return pd.DataFrame({"value": vals, "present": hit.all(axis=1)})


def _hll_rank_idx(h: np.ndarray, p: int):
    """(register index, rank) per hash — shared by the global and grouped
    HLL builders."""
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    nbits = 64 - p
    lz = np.full(len(h), nbits, dtype=np.int64)
    cur = rest.copy()
    found = np.zeros(len(h), dtype=bool)
    for b in range(nbits):
        top = (cur >> np.uint64(63)) & np.uint64(1)
        hit = (~found) & (top == 1)
        lz[hit] = b
        found |= hit
        cur = cur << np.uint64(1)
    return idx, (lz + 1).astype(np.int8), m


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    r = regs.astype(np.float64)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -r))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def grouped_hll_distinct(ds, key, col: str, p: int = 12):
    """Per-GROUP approximate distinct count (HLL registers per group).
    Each batch emits one 2^p-byte register row per group it saw; rows
    merge per group by elementwise max in a bucketed vectorized pass
    (Python calls bounded by hash buckets, not by distinct groups), then
    the estimator runs per group. The shuffle moves register rows —
    (groups-in-batch × 2^p bytes) — never the raw values. Returns a lazy
    Dataset of (key..., estimate). Use a smaller ``p`` (e.g. 10 → 1 KiB
    per group-row, ~3% error) when groups are numerous."""
    from recon_ray.functions.relational import bucketed_group_apply

    keys_ = [key] if isinstance(key, str) else list(key)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {**{k: pd.Series(dtype="object") for k in keys_},
                 "__regs": pd.Series(dtype="object")}
            )
        h = _col_hashes(batch, col)
        idx, rank, m = _hll_rank_idx(h, p)
        codes, uniques = pd.factorize(
            pd.Series(list(zip(*(batch[k] for k in keys_))))
            if len(keys_) > 1 else batch[keys_[0]], sort=False
        )
        regs = np.zeros((len(uniques), m), dtype=np.int8)
        np.maximum.at(regs, (codes, idx), rank)
        out = pd.DataFrame({"__regs": [r.tobytes() for r in regs]})
        if len(keys_) > 1:
            for i, k in enumerate(keys_):
                out[k] = [u[i] for u in uniques]
        else:
            out[keys_[0]] = uniques
        return out[keys_ + ["__regs"]]

    rows = ds.map_batches(partial, batch_format="pandas")

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for kv, grp in bucket.groupby(keys_, sort=False):
            stack = np.stack(
                [np.frombuffer(b, dtype=np.int8) for b in grp["__regs"]]
            )
            est = _hll_estimate(stack.max(axis=0))
            kv = kv if isinstance(kv, tuple) else (kv,)
            recs.append((*kv, est))
        return pd.DataFrame(recs, columns=keys_ + ["estimate"])

    return bucketed_group_apply(rows, keys_, merge)
