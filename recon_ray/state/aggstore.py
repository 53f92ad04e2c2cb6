"""Incremental grouped-aggregate maintenance — the materialized-view
pattern a 100-TB pipeline needs: yesterday's rollup is STATE, today's
data is a DELTA, and the new rollup is state ⊕ delta — one combiner pass
over the delta plus one groups-sized merge shuffle, never a recompute
over the full history. Generalizes the reference's incremental
``Dataset.apply`` bookkeeping (recon/dataset.py:353-381 — skip what's
done, do what's new) from operations to aggregates.

Maintained partials per value column: sum / count / min / max (all
mergeable under append-only deltas; mean resolves as sum/count at read
time). State lives as versioned Parquet snapshots:

    path/state_v{N}/part-*.parquet  +  path/manifest.json

written snapshot-first, manifest-LAST (atomic rename), so a crash
mid-apply leaves the previous version intact and the re-run redoes the
delta. Every delta carries a caller ``delta_id``; applying an
already-recorded id is a no-op — re-running yesterday's job cannot
double-count (idempotence is under the oracle gate via
``q_events_incremental_agg``, which re-applies a delta on purpose).

Scale shape: the delta is reduced by a per-batch combiner (map_batches,
zero shuffle) to group-partial rows; the merge unions those partials
with the previous snapshot (groups-sized, read distributed) through ONE
bucketed hash shuffle (`bucketed_group_apply` — vectorized per bucket,
never per group) and writes the new snapshot with Ray's parallel
Parquet writer. The driver only ever sees the manifest.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd


def _combiner(keys: list[str], cols: list[str]):
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(keys, dropna=False, as_index=False)
        out = g.size().rename(columns={"size": "__n"})
        for c in cols:
            agg = b.groupby(keys, dropna=False, as_index=False)[c].agg(
                ["sum", "count", "min", "max"])
            out[f"__s_{c}"] = agg["sum"].to_numpy()
            out[f"__c_{c}"] = agg["count"].to_numpy()
            out[f"__mn_{c}"] = agg["min"].to_numpy()
            out[f"__mx_{c}"] = agg["max"].to_numpy()
        return out

    return partial


def _merger(keys: list[str], cols: list[str]):
    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(keys, dropna=False, as_index=False)
        out = g["__n"].sum()
        for c in cols:
            agg = bucket.groupby(keys, dropna=False, as_index=False).agg(
                **{f"__s_{c}": (f"__s_{c}", "sum"),
                   f"__c_{c}": (f"__c_{c}", "sum"),
                   f"__mn_{c}": (f"__mn_{c}", "min"),
                   f"__mx_{c}": (f"__mx_{c}", "max")})
            for col in (f"__s_{c}", f"__c_{c}", f"__mn_{c}", f"__mx_{c}"):
                out[col] = agg[col].to_numpy()
        return out

    return merge


class AggStore:
    """Versioned incremental grouped-aggregate state. ``value_cols`` are
    the numeric columns whose sum/count/min/max are maintained per
    ``keys`` group."""

    def __init__(self, path: str, keys: list[str], value_cols: list[str]):
        self.path = path
        self.keys = list(keys)
        self.cols = list(value_cols)
        os.makedirs(path, exist_ok=True)

    # -- manifest -------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def _manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"version": 0, "applied": [], "keys": self.keys,
                    "value_cols": self.cols}
        with open(p) as f:
            m = json.load(f)
        if m["keys"] != self.keys or m["value_cols"] != self.cols:
            raise ValueError(
                f"AggStore at {self.path} was built with "
                f"keys={m['keys']} value_cols={m['value_cols']}")
        return m

    def _snap_dir(self, version: int) -> str:
        return os.path.join(self.path, f"state_v{version}")

    @property
    def version(self) -> int:
        return self._manifest()["version"]

    # -- write path -----------------------------------------------------
    def apply_delta(self, delta_ds, delta_id: str) -> dict:
        """Fold ``delta_ds`` (raw rows) into the state. Returns
        ``{"version": N, "skipped": bool}``; an already-applied
        ``delta_id`` is a no-op (idempotent re-runs)."""
        import ray.data

        from recon_ray.functions.relational import bucketed_group_apply

        m = self._manifest()
        if delta_id in m["applied"]:
            return {"version": m["version"], "skipped": True}

        partials = delta_ds.map_batches(
            _combiner(self.keys, self.cols), batch_format="pandas")
        if m["version"] > 0:
            base = ray.data.read_parquet(self._snap_dir(m["version"]))
            # normalize to pandas blocks: union of Arrow (parquet) and
            # pandas (combiner) blocks trips Ray's single-block-type
            # assertion in the downstream groupby
            base = base.map_batches(lambda b: b, batch_format="pandas")
            partials = base.union(partials)
        merged = bucketed_group_apply(
            partials, self.keys, _merger(self.keys, self.cols))

        new_v = m["version"] + 1
        tmp = self._snap_dir(new_v) + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        merged.write_parquet(tmp)
        if os.path.exists(self._snap_dir(new_v)):
            # orphan from a crash after snapshot rename but before the
            # manifest write — the manifest never acknowledged it
            shutil.rmtree(self._snap_dir(new_v))
        os.replace(tmp, self._snap_dir(new_v))
        m["version"] = new_v
        m["applied"] = list(m["applied"]) + [delta_id]
        mt = self._manifest_path() + ".tmp"
        with open(mt, "w") as f:
            json.dump(m, f)
        os.replace(mt, self._manifest_path())  # manifest LAST
        return {"version": new_v, "skipped": False}

    # -- read path ------------------------------------------------------
    def resolved(self):
        """The maintained aggregate as a lazy Dataset: keys, ``n_rows``
        and per value column ``{c}_sum/_count/_min/_max/_mean``."""
        import ray.data

        m = self._manifest()
        if m["version"] == 0:
            raise ValueError("empty AggStore: apply a delta first")
        state = ray.data.read_parquet(self._snap_dir(m["version"]))
        keys, cols = self.keys, self.cols

        def finish(b: pd.DataFrame) -> pd.DataFrame:
            out = b[keys].copy()
            out["n_rows"] = b["__n"].astype("int64")
            for c in cols:
                cnt = b[f"__c_{c}"].to_numpy()
                out[f"{c}_sum"] = b[f"__s_{c}"].to_numpy()
                out[f"{c}_count"] = cnt.astype(np.int64)
                out[f"{c}_min"] = b[f"__mn_{c}"].to_numpy()
                out[f"{c}_max"] = b[f"__mx_{c}"].to_numpy()
                with np.errstate(invalid="ignore", divide="ignore"):
                    out[f"{c}_mean"] = np.where(
                        cnt > 0, b[f"__s_{c}"].to_numpy() / np.maximum(
                            cnt, 1), np.nan)
            return out

        return state.map_batches(finish, batch_format="pandas")

    def vacuum(self, keep: int = 1) -> int:
        """Delete snapshots older than the newest ``keep``; returns the
        number removed. The manifest never references them again."""
        m = self._manifest()
        removed = 0
        for v in range(1, m["version"] - keep + 1):
            d = self._snap_dir(v)
            if os.path.exists(d):
                shutil.rmtree(d)
                removed += 1
        return removed
