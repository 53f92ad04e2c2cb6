"""Global content-addressed ExampleStore — the distributed analogue of the
reference's ``ExampleStore`` (reference recon/store.py:10-80: a hash→Example
dict with add/contains/from_disk/to_disk), shared ACROSS datasets.

The reference keeps every example in driver memory; at 100 TB that is a
non-starter. Here the store is a directory of hash-partitioned parquet
buckets (``bucket = doc_id % num_buckets``):

    root/
      meta.json                     {"num_buckets": N}
      bucket=0007/part-<sha>.parquet

* ``add_dataset(ds)`` stages the incoming Dataset partitioned by bucket
  (a parquet write with ``partition_cols`` — rows route to their bucket at
  write time, no global shuffle), then runs ONE Ray task per touched
  bucket that anti-joins staged doc_ids against the bucket's existing ids
  and appends only the novel rows as a new content-addressed part file.
  Work and memory are bounded per bucket, never per store.
* Membership / length stream only the ``doc_id`` column of the touched
  buckets (column pruning at the read).
* Part files are content-addressed (sha of their doc_id set), so a
  retried merge task rewrites identical bytes to the same name —
  idempotent under Ray retries.

Concurrency: adds from ONE driver are serial and fully deduped; racing
adds from multiple drivers to the same store need external coordination
(the reference's dict-backed store has the same contract).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterable, Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

_META = "meta.json"


def _bucket_dir(root: str, b: int) -> str:
    return os.path.join(root, f"bucket={b:04d}")


_OBSOLETE = ".obsolete.json"


def _unlink_quiet(path: str) -> None:
    try:
        os.unlink(path)
    except FileNotFoundError:
        pass


def _live_parts(bucket_dir: str) -> list[str]:
    """Part filenames that are LIVE under the compaction protocol. A
    compaction marker lists parts superseded by a merged part — but it
    only takes effect once the merged part actually exists (a crash
    between writing the marker and publishing the merged part must not
    lose the old parts), so visibility flips atomically with the merged
    part's rename."""
    if not os.path.isdir(bucket_dir):
        return []
    names = sorted(
        n for n in os.listdir(bucket_dir) if n.endswith(".parquet")
    )
    marker = os.path.join(bucket_dir, _OBSOLETE)
    if os.path.exists(marker):
        with open(marker) as f:
            m = json.load(f)
        if m.get("merged") in names:
            dead = set(m.get("obsolete", []))
            names = [n for n in names if n not in dead]
    return names


def _part_ids(bucket_dir: str) -> set[int]:
    """All doc_ids already stored in a bucket (doc_id column only)."""
    ids: set[int] = set()
    for name in _live_parts(bucket_dir):
        col = pq.read_table(
            os.path.join(bucket_dir, name), columns=["doc_id"]
        ).column("doc_id")
        ids.update(col.to_pylist())
    return ids


@ray.remote
def _compact_bucket(bucket_dir: str) -> tuple[int, int, int]:
    """Merge a bucket's live part files into ONE content-addressed part.
    Crash-safe ordering: (1) finish any interrupted previous compaction,
    (2) write the merged part to a tmp name, (3) write the obsolete
    marker naming the merged file, (4) publish the merged part with one
    atomic rename — the moment it appears, the marker retires the old
    parts — then (5) delete the old parts and the marker. A crash at any
    point leaves either the old parts live (merged absent) or exactly
    the merged part live (marker + merged present): never loss, never
    duplicates. Returns (parts_before, parts_after, rows).

    Single-compactor contract: at most ONE compact() may run against a
    store root at a time (the CLI verb is that one process). Readers and
    appenders are safe concurrently; a SECOND concurrent compactor could
    retire the first one's marker mid-protocol. Unlinks are tolerant
    (missing_ok) so even that misuse degrades to extra work, not a
    crash."""
    marker_path = os.path.join(bucket_dir, _OBSOLETE)
    # finish an interrupted run first
    if os.path.exists(marker_path):
        with open(marker_path) as f:
            m = json.load(f)
        on_disk = {
            n for n in os.listdir(bucket_dir) if n.endswith(".parquet")
        }
        if m.get("merged") in on_disk:
            # previous run published its merged part: the olds are dead
            for n in m.get("obsolete", []):
                _unlink_quiet(os.path.join(bucket_dir, n))
        # else: died before publishing — the olds are still the truth
        _unlink_quiet(marker_path)
    # a crash between tmp-write and publish orphans .part-<sig>.tmp;
    # recovery is the only writer of those names, so sweep them here
    for n in os.listdir(bucket_dir):
        if n.startswith(".part-") and n.endswith(".tmp"):
            _unlink_quiet(os.path.join(bucket_dir, n))
    live = _live_parts(bucket_dir)
    if len(live) <= 1:
        n_rows = sum(
            pq.read_metadata(os.path.join(bucket_dir, n)).num_rows
            for n in live
        )
        return (len(live), len(live), n_rows)
    merged = pa.concat_tables(
        [pq.read_table(os.path.join(bucket_dir, n)) for n in live]
    ).sort_by("doc_id")
    ids = merged.column("doc_id").to_pylist()
    sig = hashlib.sha256(
        b"".join(int(h).to_bytes(8, "little") for h in sorted(ids))
    ).hexdigest()[:16]
    final_name = f"part-{sig}.parquet"
    tmp = os.path.join(bucket_dir, f".part-{sig}.tmp")
    pq.write_table(merged, tmp)
    obsolete = [n for n in live if n != final_name]
    mtmp = marker_path + ".tmp"
    with open(mtmp, "w") as f:
        json.dump({"merged": final_name, "obsolete": obsolete}, f)
    os.replace(mtmp, marker_path)
    os.replace(tmp, os.path.join(bucket_dir, final_name))  # publish
    for n in obsolete:
        _unlink_quiet(os.path.join(bucket_dir, n))
    _unlink_quiet(marker_path)
    return (len(live), 1, merged.num_rows)


@ray.remote
def _merge_bucket(staging_bucket: str, store_bucket: str):
    """Anti-join one staged bucket against the stored bucket and append the
    novel rows as a content-addressed part. Returns (rows_added,
    part_path | None) — the path lets incremental consumers (e.g.
    curate_incremental) read back exactly this run's novel rows."""
    parts = [
        os.path.join(staging_bucket, n)
        for n in sorted(os.listdir(staging_bucket))
        if n.endswith(".parquet")
    ]
    if not parts:
        return (0, None)
    staged = pa.concat_tables([pq.read_table(p) for p in parts])
    if staged.num_rows == 0:
        return (0, None)
    # first occurrence per doc_id within the staged rows
    ids = staged.column("doc_id").to_pylist()
    existing = _part_ids(store_bucket)
    keep = []
    seen: set[int] = set()
    for i, h in enumerate(ids):
        if h not in existing and h not in seen:
            seen.add(h)
            keep.append(i)
    if not keep:
        return (0, None)
    novel = staged.take(pa.array(keep, pa.int64()))
    os.makedirs(store_bucket, exist_ok=True)
    sig = hashlib.sha256(
        b"".join(int(h).to_bytes(8, "little") for h in sorted(seen))
    ).hexdigest()[:16]
    tmp = os.path.join(store_bucket, f".part-{sig}.tmp")
    pq.write_table(novel, tmp)
    final = os.path.join(store_bucket, f"part-{sig}.parquet")
    os.replace(tmp, final)
    return (novel.num_rows, final)


class ExampleStore:
    """Content-addressed, hash-bucketed store of examples keyed by ``doc_id``
    (the reference's ``example_hash``). See module docstring for layout."""

    def __init__(self, root: str, num_buckets: int = 64):
        self.root = root
        os.makedirs(root, exist_ok=True)
        meta_path = os.path.join(root, _META)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.num_buckets = int(json.load(f)["num_buckets"])
        else:
            self.num_buckets = num_buckets
            with open(meta_path, "w") as f:
                json.dump({"num_buckets": num_buckets}, f)

    # -- write path ---------------------------------------------------------

    def add_dataset(self, ds, staging_dir: Optional[str] = None,
                    return_parts: bool = False):
        """Add every example of a docs Dataset (columns incl. ``doc_id``)
        not already present. Returns the number of rows added — or, with
        ``return_parts=True``, ``(added, [part paths written])`` so the
        caller can stream back exactly this add's novel rows."""
        import tempfile

        n_buckets = self.num_buckets

        def tag(batch: pa.Table) -> pa.Table:
            b = pc.cast(
                pc.bit_wise_and(
                    batch.column("doc_id"), pa.scalar(2**63 - 1, pa.uint64())
                ),
                pa.int64(),
            )
            bucket = pc.cast(
                pc.subtract(
                    b, pc.multiply(pc.divide(b, n_buckets), n_buckets)
                ),
                pa.int32(),
            )
            return batch.append_column("bucket", bucket)

        staging = staging_dir or tempfile.mkdtemp(prefix="example_store_stage_")
        ds.map_batches(
            tag, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(staging, partition_cols=["bucket"])

        refs = []
        for name in sorted(os.listdir(staging)):
            if not name.startswith("bucket="):
                continue
            b = int(name.split("=", 1)[1])
            refs.append(
                _merge_bucket.remote(
                    os.path.join(staging, name), _bucket_dir(self.root, b)
                )
            )
        results = ray.get(refs)
        added = sum(n for (n, _) in results)
        import shutil

        if staging_dir is None:
            shutil.rmtree(staging, ignore_errors=True)
        if return_parts:
            return added, [p for (_, p) in results if p]
        return added

    def compact(self) -> dict:
        """Merge each bucket's accumulated part files into one — the
        small-file maintenance pass a long-lived incremental store needs
        (every ``add_dataset`` run appends one part per touched bucket;
        after N delta runs a 100-TB store is N× the file count and every
        membership probe pays N opens). One Ray task per multi-part
        bucket, bounded by bucket size; crash-safe via the marker
        protocol on ``_compact_bucket``. Returns
        {"buckets": touched, "parts_before": int, "parts_after": int}."""
        refs = []
        for name in sorted(os.listdir(self.root)):
            if not name.startswith("bucket="):
                continue
            bdir = os.path.join(self.root, name)
            if len(_live_parts(bdir)) > 1 or os.path.exists(
                os.path.join(bdir, _OBSOLETE)
            ):
                refs.append(_compact_bucket.remote(bdir))
        results = ray.get(refs)
        return {
            "buckets": len(results),
            "parts_before": sum(b for (b, _, _) in results),
            "parts_after": sum(a for (_, a, _) in results),
        }

    def add_examples(self, records: list[dict]) -> int:
        """Driver-side convenience for a handful of raw example dicts
        (reference ExampleStore.add); bulk adds go through add_dataset."""
        from recon_ray.sources.jsonl import records_to_table

        return self.add_dataset(rd.from_arrow(records_to_table(records)))

    # -- read path ----------------------------------------------------------

    def _bucket_of(self, doc_id: int) -> int:
        return (int(doc_id) & (2**63 - 1)) % self.num_buckets

    def __contains__(self, doc_id: int) -> bool:
        return int(doc_id) in _part_ids(
            _bucket_dir(self.root, self._bucket_of(doc_id))
        )

    def contains_many(self, doc_ids: Iterable[int]) -> dict[int, bool]:
        """Membership for a set of hashes, reading each touched bucket once."""
        by_bucket: dict[int, list[int]] = {}
        for h in doc_ids:
            by_bucket.setdefault(self._bucket_of(h), []).append(int(h))
        out: dict[int, bool] = {}
        for b, hs in by_bucket.items():
            ids = _part_ids(_bucket_dir(self.root, b))
            for h in hs:
                out[h] = h in ids
        return out

    def get(self, doc_id: int) -> Optional[dict]:
        """Fetch one example row by hash (reference __getitem__); None when
        absent. Reads only the one bucket."""
        bdir = _bucket_dir(self.root, self._bucket_of(doc_id))
        for name in _live_parts(bdir):
            t = pq.read_table(os.path.join(bdir, name))
            mask = pc.equal(t.column("doc_id"), pa.scalar(int(doc_id), pa.uint64()))
            hit = t.filter(mask)
            if hit.num_rows:
                return hit.slice(0, 1).to_pylist()[0]
        return None

    def __len__(self) -> int:
        n = 0
        for name in os.listdir(self.root):
            if name.startswith("bucket="):
                bdir = os.path.join(self.root, name)
                n += len(_part_ids(bdir))
        return n

    def to_dataset(self):
        """The whole store as a Dataset. Uniqueness per doc_id is a store
        invariant: each id routes to exactly one bucket and ``_merge_bucket``
        anti-joins every add against the bucket's existing parts. (Like the
        reference's dict-backed store, concurrent adds to the SAME store
        need external coordination.)"""
        parts = [
            os.path.join(self.root, name, fn)
            for name in sorted(os.listdir(self.root))
            if name.startswith("bucket=")
            for fn in _live_parts(os.path.join(self.root, name))
        ]
        if not parts:
            return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.uint64())}))
        return rd.read_parquet(parts)

    # -- reference-format interop ------------------------------------------

    def to_disk(self, path: str) -> None:
        """Serialize as the reference JSONL shape
        ``{"example_hash": ..., "example": {text, spans, meta}}``
        (reference recon/store.py:68-80) — small-store interop only."""
        from recon_ray.sources.jsonl import write_jsonl_examples

        tmp = path + ".docs"
        write_jsonl_examples(self.to_dataset(), tmp)
        records = []
        for name in sorted(os.listdir(tmp)):
            with open(os.path.join(tmp, name)) as f:
                for line in f:
                    records.append(json.loads(line))
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        from recon_ray.sources.jsonl import records_to_table

        t = records_to_table(records)
        ids = t.column("doc_id").to_pylist()
        with open(path, "w") as f:
            for h, rec in zip(ids, records):
                f.write(
                    json.dumps({"example_hash": int(h), "example": rec},
                               sort_keys=True) + "\n"
                )

    @classmethod
    def from_disk(cls, path: str, root: str, num_buckets: int = 64
                  ) -> "ExampleStore":
        """Load a reference-format JSONL store file into a new bucketed
        store (reference recon/store.py:49-66)."""
        store = cls(root, num_buckets=num_buckets)
        with open(path) as f:
            records = [json.loads(line)["example"] for line in f if line.strip()]
        if records:
            store.add_examples(records)
        return store
