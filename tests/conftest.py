"""Session-scoped Ray init (ONE cluster for the whole pytest run) plus
shared corpus fixtures."""

from __future__ import annotations

import logging

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def unit_corpus_table():
    """sf-unit corpus: ~120 files, deterministic (seed 42)."""
    from recon_ray.corpusgen import generate_corpus

    return generate_corpus(120, seed=42)


@pytest.fixture(scope="session")
def unit_corpus_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    from recon_ray.corpusgen import generate_corpus

    d = tmp_path_factory.mktemp("files")
    table = generate_corpus(120, seed=42)
    for i in range(0, table.num_rows, 40):
        pq.write_table(table.slice(i, 40), str(d / f"part-{i:05d}.parquet"))
    return str(d)


@pytest.fixture(scope="session")
def gold_extraction(unit_corpus_table):
    from recon_ray import reference_extractor as rx

    return rx.extract_corpus(unit_corpus_table.to_pylist())
