"""JSONL/BIO sources, corpus IO, mention scorer, CLI."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pandas as pd
import pytest
import ray.data as rd


def test_jsonl_roundtrip(tmp_path):
    from recon_ray.sources.jsonl import read_jsonl_examples, write_jsonl_examples

    records = [
        # span text back-filled from offsets (recon/types.py:85-96)
        {"text": "Denver, Colorado is a city.",
         "spans": [{"start": 0, "end": 6, "label": "GPE"}],
         "meta": "Cities Data"},  # str meta → {"source": ...}
        {"text": "no spans here", "spans": [], "meta": {"k": "v"}},
        {"text": "ab cd", "spans": [{"start": 3, "end": 5, "label": "X",
                                     "text": "cd"}]},
    ]
    src = tmp_path / "in.jsonl"
    src.write_text("\n".join(json.dumps(r) for r in records))
    docs = read_jsonl_examples(str(src))
    t = docs.to_pandas().sort_values("text").reset_index(drop=True)
    assert len(t) == 3
    denver = t[t["text"].str.startswith("Denver")].iloc[0]
    assert denver["mentions"][0]["text"] == "Denver"
    assert json.loads(denver["meta_json"]) == {"source": "Cities Data"}
    out = tmp_path / "out"
    write_jsonl_examples(docs, str(out))
    back = read_jsonl_examples(str(out))
    assert sorted(back.to_pandas()["doc_id"]) == sorted(t["doc_id"])


def test_bio_decode():
    from recon_ray.sources.bio import decode_bio_row, read_bio_dataset

    tokens = ["John", "Smith", "works", "at", "Acme", "Corp", "."]
    tags = ["B-PER", "I-PER", "O", "O", "B-ORG", "I-ORG", "O"]
    text, spans = decode_bio_row(tokens, tags)
    assert text == "John Smith works at Acme Corp ."
    assert spans == [
        ("John Smith", 0, 10, "PER"),
        ("Acme Corp", 20, 29, "ORG"),
    ]
    ds = rd.from_items([{"tokens": tokens, "tags": tags}])
    docs = read_bio_dataset(ds).to_pandas()
    assert docs.iloc[0]["mentions"][0]["label"] == "PER"
    # adjacent B- spans, trailing entity
    _, s2 = decode_bio_row(["a", "b"], ["B-X", "B-X"])
    assert [(x[1], x[2]) for x in s2] == [(0, 1), (2, 3)]
    _, s3 = decode_bio_row(["a", "b"], ["O", "B-Y"])
    assert s3 == [("b", 2, 3, "Y")]


def test_corpus_io(tmp_path, unit_corpus_dir):
    from recon_ray.sources.corpus_io import (
        corpus_all,
        corpus_apply,
        load_corpus,
        save_corpus,
    )

    files = rd.read_parquet(unit_corpus_dir)
    n = files.count()
    train, rest = files.split_proportionately([0.6])
    dev, test = rest.split_proportionately([0.5])
    save_corpus({"train": train, "dev": dev, "test": test}, str(tmp_path / "c"))
    corpus = load_corpus(str(tmp_path / "c"))
    assert corpus["__meta__"]["splits"] == ["dev", "test", "train"]
    assert corpus_all(corpus).count() == n
    counts = corpus_apply(corpus, lambda ds: ds.count())
    assert counts["all"] == n
    assert counts["train"] + counts["dev"] + counts["test"] == n


def test_score_mentions():
    from recon_ray.functions.scoring import score_mentions_frames

    gold = pd.DataFrame(
        {"doc_id": [1, 1, 2], "start": [0, 5, 0], "end": [3, 8, 2],
         "label": ["A", "B", "A"]}
    )
    pred = pd.DataFrame(
        {"doc_id": [1, 1, 2], "start": [0, 5, 1], "end": [3, 8, 2],
         "label": ["A", "B", "A"]}
    )
    s = score_mentions_frames(pred, gold)
    assert s["precision"] == pytest.approx(2 / 3)
    assert s["recall"] == pytest.approx(2 / 3)
    assert s["per_label"]["B"]["f1"] == 1.0


def test_cli_score_and_stats(tmp_path, unit_corpus_dir, gold_extraction):
    gold = pd.DataFrame(gold_extraction["canonical"])
    p1 = tmp_path / "pred.parquet"
    p2 = tmp_path / "gold.parquet"
    gold.to_parquet(p1)
    gold.to_parquet(p2)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "recon_ray", "score", str(p1), str(p2)],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=120,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert json.loads(r.stdout)["f1"] == 1.0


def test_cli_search(unit_corpus_dir):
    """search verb: streaming substring match over file contents (the
    Dataset.search analogue, recon/dataset.py:291-311)."""
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "recon_ray", "search", unit_corpus_dir,
         "import numpy"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) > 0
    assert all("\t" in ln for ln in lines)  # repo\tpath rows
    # case sensitivity: uppercase query only hits with -i
    r2 = subprocess.run(
        [sys.executable, "-m", "recon_ray", "search", unit_corpus_dir,
         "IMPORT NUMPY"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r2.returncode == 0
    assert not [ln for ln in r2.stdout.splitlines() if ln.strip()]
    r3 = subprocess.run(
        [sys.executable, "-m", "recon_ray", "search", "-i", unit_corpus_dir,
         "IMPORT NUMPY"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r3.returncode == 0
    assert len([ln for ln in r3.stdout.splitlines() if ln.strip()]) == len(lines)


def test_cli_curate(tmp_path):
    """curate verb: documents parquet → packed-sequence parquet, budget
    respected, JSON summary on stdout."""
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = tmp_path / "packed"
    r = subprocess.run(
        [sys.executable, "-m", "recon_ray", "curate",
         "/root/testdata/sf0.001/documents.parquet", str(out)],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    df = pd.concat(
        pd.read_parquet(p) for p in out.glob("*.parquet")
    )
    assert summary["n_docs_packed"] == len(df) > 0
    assert df.groupby(["bucket", "seq_id"]).n_tokens.sum().max() <= 512
