"""Augmentation + split-unit operator semantics: offset integrity,
determinism, explode accounting."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from recon_ray.ops import OPS
from recon_ray.ops.mentions_io import mentions_parts
from recon_ray.pipelines.kg import read_files
from recon_ray.stages.detect import MentionDetector
from recon_ray.ops.spans import CORRECTION_CHAIN


@pytest.fixture(scope="module")
def corrected_docs(unit_corpus_dir):
    from recon_ray.ops import pipe

    docs = read_files(unit_corpus_dir).map_batches(
        MentionDetector, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    docs = pipe(docs, CORRECTION_CHAIN)
    # keep content (augment/split need it); small corpus → materialize fine
    return docs.materialize()


def _check_offsets(batch: pa.Table):
    """Every mention text must equal content[start:end]."""
    contents = batch.column("content").to_pylist()
    lengths, text, start, end, label, _ = mentions_parts(batch)
    pos = 0
    for i, c in enumerate(contents):
        for j in range(pos, pos + int(lengths[i])):
            assert c[start[j]:end[j]] == text[j], (i, text[j])
        pos += int(lengths[i])
    return batch


def test_ent_label_sub(corrected_docs):
    aug = OPS["recon_ray.augment.ent_label_sub.v1"].apply(
        corrected_docs, label="CALL", subs=["sub_fn_a", "sub_fn_b"]
    )
    n_in = corrected_docs.count()
    t = pa.concat_tables(
        [b for b in aug.iter_batches(batch_format="pyarrow", batch_size=4096)],
        promote_options="default",
    )
    assert t.num_rows > n_in  # explode happened
    _check_offsets(t)
    # determinism across executions
    t2 = pa.concat_tables(
        [
            b
            for b in OPS["recon_ray.augment.ent_label_sub.v1"]
            .apply(corrected_docs, label="CALL", subs=["sub_fn_a", "sub_fn_b"])
            .iter_batches(batch_format="pyarrow", batch_size=4096)
        ],
        promote_options="default",
    )
    ids1 = sorted(t.column("doc_id").to_pylist())
    ids2 = sorted(t2.column("doc_id").to_pylist())
    assert ids1 == ids2


def test_kb_expansion(corrected_docs):
    aliases = {"alpha": ["alpha_v2"], "process": ["process_fast", "process_slow"]}
    aug = OPS["recon_ray.augment.kb_expansion.v1"].apply(
        corrected_docs, label="CALL", aliases=aliases
    )
    t = pa.concat_tables(
        [b for b in aug.iter_batches(batch_format="pyarrow", batch_size=4096)],
        promote_options="default",
    )
    _check_offsets(t)
    n_aug = t.num_rows - corrected_docs.count()
    assert n_aug > 0
    # substituted texts only come from the alias lists
    lengths, text, start, end, label, _ = mentions_parts(t)
    subs_seen = {x for x in text if x in {"alpha_v2", "process_fast", "process_slow"}}
    assert subs_seen


def test_split_units(corrected_docs):
    split = OPS["recon_ray.split_units.v1"].apply(corrected_docs)
    t = pa.concat_tables(
        [b for b in split.iter_batches(batch_format="pyarrow", batch_size=4096)],
        promote_options="default",
    )
    assert t.num_rows > corrected_docs.count()
    _check_offsets(t)
    # unit paths are derived and unit contents partition the originals
    paths = t.column("path").to_pylist()
    assert all("#u" in p for p in paths)
    # mention conservation: no mention lost (units partition files)
    n_before = sum(
        sum(b.column("mentions").combine_chunks().value_lengths().fill_null(0).to_pylist())
        for b in corrected_docs.iter_batches(batch_format="pyarrow", batch_size=4096)
    )
    n_after = int(mentions_parts(t)[0].sum())
    assert n_after == n_before
