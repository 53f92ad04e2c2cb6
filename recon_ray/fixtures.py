"""Deterministic KG fixtures derived from the scale factor (no external
data, per BASELINE.json input_hint): the synthetic code corpus plus the
sequential reference extractor's GOLD outputs, cached under /tmp so the
driver's oracle SQL can read them with ``read_parquet('<path>')``.

The gold parquet files ARE the oracle for the KG queries: the driver's
side-by-side compare (Ray pipeline vs. SQL over gold) is therefore exactly
the P/R-vs-reference acceptance check of BASELINE.json, expressed through
the oracle machinery.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

#: bump CORPUS_VERSION whenever corpusgen/spec output changes — the version
#: is part of the cache path, so stale /tmp fixtures from an older generator
#: can never be read by a newer engine (or vice versa)
CORPUS_VERSION = "v2"
FIXTURE_ROOT = f"/tmp/recon_ray_fixtures/{CORPUS_VERSION}"

#: corpus size per driver scale factor (sf0.01 is the correctness gate;
#: kept modest so gold extraction stays fast at import time)
N_FILES = {"sf0.001": 300, "sf0.01": 1200, "sf0.1": 96000}
SEED = 42


#: The KG fixture scale is PINNED: oracle_sql() strings bake absolute gold
#: paths and take no sf argument, so the KG queries must resolve to the same
#: corpus regardless of the sf_dir the driver passes. sf0.01 is the driver's
#: correctness scale. (entry() addresses the sf0.001 fixture directly via
#: files_dir, bypassing this pin.)
PINNED_KG_SF = "sf0.01"


def sf_name(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return name if name in N_FILES else "sf0.01"


def fixture_dir(sf_dir: str) -> str:
    return os.path.join(FIXTURE_ROOT, sf_name(sf_dir))


def files_dir(sf_dir: str) -> str:
    return os.path.join(fixture_dir(sf_dir), "files")


def gold_path(sf_dir: str, which: str) -> str:
    return os.path.join(fixture_dir(sf_dir), f"gold_{which}.parquet")


def ensure_fixtures(sf_dir: str, files_only: bool = False) -> str:
    """Idempotent: generate corpus (+ gold outputs unless ``files_only``)
    once per sf; returns the fixture dir. Pure single-process Python (no
    Ray needed). ``files_only`` skips the sequential gold extraction —
    used by bench at sf0.1, where the oracle compare doesn't run and the
    single-process extractor would dominate setup time."""
    root = fixture_dir(sf_dir)
    done = os.path.join(root, ".done")
    files_done = os.path.join(root, ".files_done")
    if os.path.exists(done) or (files_only and os.path.exists(files_done)):
        return root
    from recon_ray import reference_extractor as rx
    from recon_ray.corpusgen import generate_corpus

    n = N_FILES[sf_name(sf_dir)]
    os.makedirs(files_dir(sf_dir), exist_ok=True)
    table = generate_corpus(n, seed=SEED)
    if not os.path.exists(files_done):
        frag = max(64, n // 16)
        for i, start in enumerate(range(0, table.num_rows, frag)):
            pq.write_table(
                table.slice(start, frag),
                os.path.join(files_dir(sf_dir), f"part-{i:05d}.parquet"),
            )
        with open(files_done, "w") as f:
            f.write("ok")
    if files_only:
        return root
    gold = rx.extract_corpus(table.to_pylist())
    pq.write_table(
        pa.Table.from_pylist(gold["canonical"]), gold_path(sf_dir, "canonical")
    )
    pq.write_table(
        pa.Table.from_pylist(gold["mentions"]), gold_path(sf_dir, "mentions")
    )
    pq.write_table(
        pa.Table.from_pylist(gold["symbols"]), gold_path(sf_dir, "symbols")
    )
    with open(done, "w") as f:
        f.write("ok")
    return root
