"""Corpus (train/dev/test) save/load — the analogue of
``Corpus.to_disk/from_disk`` (recon/corpus.py:191-261): three Datasets +
a meta.json, laid out as partitioned Parquet.

    <dir>/meta.json                {"name": ..., "splits": [...]}
    <dir>/<split>/*.parquet

``corpus_all`` is the union of the splits (Corpus.all,
recon/corpus.py:117-124); ``corpus_apply`` fans a callable over each split
plus "all" (Corpus.apply, recon/corpus.py:142-164).
"""

from __future__ import annotations

import json
import os

import ray.data as rd

SPLITS = ("train", "dev", "test")


def save_corpus(datasets: dict, out_dir: str, name: str = "corpus") -> None:
    os.makedirs(out_dir, exist_ok=True)
    for split, ds in datasets.items():
        ds.write_parquet(os.path.join(out_dir, split))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"name": name, "splits": sorted(datasets)}, f)


def load_corpus(in_dir: str) -> dict:
    with open(os.path.join(in_dir, "meta.json")) as f:
        meta = json.load(f)
    out = {"__meta__": meta}
    for split in meta["splits"]:
        out[split] = rd.read_parquet(os.path.join(in_dir, split))
    return out


def corpus_all(corpus: dict):
    splits = [corpus[s] for s in corpus["__meta__"]["splits"]]
    ds = splits[0]
    for other in splits[1:]:
        ds = ds.union(other)
    return ds


def corpus_apply(corpus: dict, fn) -> dict:
    """fn over each split and the union — returns {split: fn(ds)}."""
    out = {}
    for split in corpus["__meta__"]["splits"]:
        out[split] = fn(corpus[split])
    out["all"] = fn(corpus_all(corpus))
    return out
