"""The flagship KG-construction pipeline (SURVEY §7.1):

    read_parquet(files)
      → add content_sha256 / doc_id                [stateless map_batches]
      → MentionDetector actor pool                 [raw spans]
      → correction chain (upcase → rename → strip
        → filter_overlaps → fix_annotations)       [vectorized kernels]
      → drop content (sha256 travels on)           [block slimming]
      → TripleLinker actor pool (broadcast symbol
        dictionary built by a DEF-only pre-scan)   [stateful actors]
      → canonicalize (combiner + groupby + sort)   [shuffle]
    plus the exploded mentions table for stats/insights.

Everything stays a lazy streaming ``ray.data.Dataset`` until the caller
consumes (write_parquet / iter_batches / aggregate); nothing materializes
the full corpus. The correction chain is load-bearing: raw labels are
lowercase, CALL spans carry trailing whitespace, keyword false-positives
must be deleted — skipping any step changes the emitted triples
(P/R gate vs recon_ray/reference_extractor.py).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import ray
import ray.data as rd

from recon_ray.ops import LineageTracker, pipe
from recon_ray.ops.spans import CORRECTION_CHAIN
from recon_ray.stages.canonicalize import canonicalize
from recon_ray.stages.detect import MentionDetector, SymbolScanner
from recon_ray.stages.explode import explode_mentions
from recon_ray.stages.link import TripleLinker, build_symbol_broadcast

#: docs per detector batch — source files average ~1-4 KB here; at 100 TB
#: with multi-MB files, budget by bytes (target ≲ 32 MiB of content/batch).
DEFAULT_BATCH_SIZE = 128


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def _pool_sizes(cpus: int) -> tuple[int, int]:
    """(detector_pool, linker_pool) actor counts. Actor pools must NOT
    reserve every CPU or the read/shuffle tasks starve and the streaming
    executor deadlocks — keep ≥25% of the node for stateless tasks."""
    detector = max(1, cpus // 2)
    linker = max(1, cpus // 4)
    return detector, linker


def _default_concurrency() -> int:
    return _pool_sizes(_cluster_cpus())[0]


def read_files(input_path: str, parallelism: Optional[int] = None):
    """Source: the input_hint Parquet table. All five columns are needed
    (content for detection, the rest for provenance/keys) so no column
    pruning applies here; downstream stages drop ``content`` as soon as
    detection has run."""
    kwargs = {}
    if parallelism:
        kwargs["override_num_blocks"] = parallelism
    return rd.read_parquet(input_path, **kwargs)


def scan_symbols(files_ds) -> pa.Table:
    """Pass 1: DEF-only scan → small distinct (repo, module, name) table
    collected to the driver (orders of magnitude smaller than the corpus;
    see link.py scale note for the partitioned variant)."""
    symbol_ds = files_ds.map_batches(
        SymbolScanner,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=DEFAULT_BATCH_SIZE,
        concurrency=_default_concurrency(),
    )
    blocks = ray.get(symbol_ds.to_arrow_refs())
    blocks = [b for b in blocks if b.num_rows] or [
        pa.table(
            {"repo": pa.array([], pa.string()),
             "module": pa.array([], pa.string()),
             "name": pa.array([], pa.string())}
        )
    ]
    return pa.concat_tables(blocks)


def run_kg(
    input_path: str,
    *,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: Optional[int] = None,
    linker_concurrency: Optional[int] = None,
    track_lineage: bool = False,
    sort_output: bool = True,
    materialize_docs: bool = False,
    symbols_ref=None,
) -> dict:
    """Assemble the lazy pipeline; returns the component Datasets plus the
    lineage tracker (all unconsumed — callers write/collect).

    ``symbols_ref``: pass a pre-broadcast symbol dictionary (ray.put ref) to
    skip the DEF pre-scan — the checkpointed runner scans once globally,
    then reuses the ref across shards."""
    det_default, link_default = _pool_sizes(_cluster_cpus())
    concurrency = concurrency or det_default
    linker_concurrency = linker_concurrency or link_default
    tracker = LineageTracker.remote() if track_lineage else None

    files = read_files(input_path)
    if symbols_ref is None:
        symbols_table = scan_symbols(files)
        symbols_ref, symbols_dict = build_symbol_broadcast(symbols_table)
    else:
        symbols_table, symbols_dict = None, None

    docs = files.map_batches(
        MentionDetector,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    docs = pipe(docs, CORRECTION_CHAIN, tracker=tracker, batch_size=batch_size)
    docs = docs.drop_columns(["content"])
    if materialize_docs:
        # Pin the corrected docs so the two consumers (triples + mentions)
        # don't re-execute detection/corrections (and double-count lineage).
        # Only sane for bounded inputs — the checkpointed runner does this
        # per SHARD, never on the whole corpus (state/runner.py).
        docs = docs.materialize()

    triples = docs.map_batches(
        TripleLinker,
        fn_constructor_kwargs={"symbols_ref": symbols_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=linker_concurrency,
    )
    canonical = canonicalize(triples, sort=sort_output)
    mentions = explode_mentions(docs)

    return {
        "files": files,
        "docs": docs,
        "mentions": mentions,
        "triples": triples,
        "canonical": canonical,
        "symbols_table": symbols_table,
        "symbols_dict": symbols_dict,
        "tracker": tracker,
    }


def lineage_summary(tracker) -> list[dict]:
    return ray.get(tracker.summary.remote()) if tracker is not None else []
