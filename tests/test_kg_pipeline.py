"""End-to-end parity: the Ray Data pipeline must reproduce the sequential
reference extractor's canonical triples EXACTLY (the P/R≥0.95 gate of
BASELINE.json, met at P=R=1.0), plus lineage and scoring checks."""

from __future__ import annotations

import pandas as pd
import pytest

from recon_ray.pipelines.kg import lineage_summary, run_kg

COLS = [
    "subj", "pred", "obj", "subj_type", "obj_type", "n_mentions",
    "repo", "path", "commit", "content_sha256", "extractor",
]


@pytest.fixture(scope="module")
def kg_result(unit_corpus_dir):
    res = run_kg(
        unit_corpus_dir, track_lineage=True, concurrency=2, materialize_docs=True
    )
    canonical = res["canonical"].to_pandas()
    mentions = res["mentions"].to_pandas()
    return res, canonical, mentions


def test_canonical_exact_match(kg_result, gold_extraction):
    _, canonical, _ = kg_result
    gold = pd.DataFrame(gold_extraction["canonical"])
    a = canonical[COLS].sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = gold[COLS].sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_canonical_sorted_output(kg_result):
    _, canonical, _ = kg_result
    keys = list(zip(canonical["subj"], canonical["pred"], canonical["obj"]))
    assert keys == sorted(keys)


def test_mentions_match_gold(kg_result, gold_extraction):
    _, _, mentions = kg_result
    gold = pd.DataFrame(gold_extraction["mentions"])
    cols = ["repo", "path", "text", "start", "end", "label"]
    a = mentions[cols].sort_values(cols).reset_index(drop=True)
    b = gold[cols].sort_values(cols).reset_index(drop=True)
    a["start"] = a["start"].astype("int64")
    a["end"] = a["end"].astype("int64")
    b["start"] = b["start"].astype("int64")
    b["end"] = b["end"].astype("int64")
    pd.testing.assert_frame_equal(a, b)


def test_triple_prf_gate(kg_result, gold_extraction):
    from recon_ray.functions.scoring import score_triples_frames

    _, canonical, _ = kg_result
    gold = pd.DataFrame(gold_extraction["canonical"])
    scores = score_triples_frames(canonical, gold)
    assert scores["precision"] >= 0.95
    assert scores["recall"] >= 0.95
    assert scores["f1"] == 1.0


def test_lineage_counts(kg_result):
    import time

    res, _, _ = kg_result
    # workers report via fire-and-forget actor calls — poll until all five
    # ops have landed their full row counts (no cross-caller ordering)
    for _ in range(100):
        summary = lineage_summary(res["tracker"])
        if len(summary) == 5 and all(s["rows"] == 120 for s in summary):
            break
        time.sleep(0.1)
    names = [s["name"] for s in summary]
    assert names == [
        "recon_ray.upcase_labels.v1",
        "recon_ray.rename_labels.v1",
        "recon_ray.strip_annotations.v1",
        "recon_ray.filter_overlaps.v1",
        "recon_ray.fix_annotations.v1",
    ]
    for s in summary:
        assert s["rows"] == 120
        assert s["added"] == 0 and s["removed"] == 0
        assert 0 < s["changed"] <= 120


def test_symbol_dict_matches_reference(kg_result, gold_extraction):
    res, _, _ = kg_result
    ray_rows = {
        (r["id"], r["name"], r["repo"])
        for repo, names in res["symbols_dict"].items()
        for name, quals in names.items()
        for r in [{"id": q, "name": name, "repo": repo} for q in quals]
    }
    gold_rows = {(r["id"], r["name"], r["repo"]) for r in gold_extraction["symbols"]}
    assert ray_rows == gold_rows


def test_partitioned_linker_equals_broadcast(unit_corpus_dir, kg_result):
    """linker_mode='partitioned' (co-partition by repo hash, mega-repo
    salting, symbols never collected) must emit triple-for-triple the same
    canonical table as the broadcast path. The unit corpus's megarepo owns
    ~30% of files, so the salted path is exercised."""
    import pandas as pd

    from recon_ray.pipelines.kg import run_kg

    res, _, _ = kg_result
    a = res["canonical"].to_pandas()
    b = run_kg(unit_corpus_dir, linker_mode="partitioned")[
        "canonical"
    ].to_pandas()
    key = ["subj", "pred", "obj", "subj_type", "obj_type"]
    a2 = a.sort_values(key).reset_index(drop=True)
    b2 = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a2, b2[a2.columns])


def test_canonicalize_fanin_fallback_equals_task_reduce(kg_result):
    """Above MAX_REDUCE_FANIN combiner blocks canonicalize falls back to
    Ray's staged shuffle; forcing the fallback (max_fanin=1) must produce
    the identical sorted canonical table."""
    import pandas as pd

    from recon_ray.stages.canonicalize import canonicalize

    res, _, _ = kg_result
    a = res["canonical"].to_pandas()
    b = canonicalize(res["triples"], sort=True, max_fanin=1).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b[a.columns].reset_index(drop=True)
    )


def test_empty_corpus_all_modes(tmp_path):
    """0 rows flow through every pipeline mode without error (schema-less
    empty blocks must not break the reduce kernels)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from recon_ray.pipelines.kg import run_kg

    d = tmp_path / "empty_corpus"
    d.mkdir()
    t = pa.table(
        {c: pa.array([], pa.string())
         for c in ["repo", "path", "commit", "lang", "content"]}
    )
    pq.write_table(t, str(d / "part-0.parquet"))
    assert run_kg(str(d))["canonical"].count() == 0
    assert run_kg(str(d), linker_mode="partitioned")["canonical"].count() == 0
    assert run_kg(str(d), symbol_source="mentions")["canonical"].count() == 0


def test_symbols_from_docs_equals_scan(unit_corpus_dir, kg_result):
    """The mentions-derived symbol table (vectorized def_name/module_of)
    is row-identical to the DEF-only corpus scan's distinct rows."""
    from recon_ray.pipelines.kg import read_files, scan_symbols, symbols_from_docs

    scan = scan_symbols(read_files(unit_corpus_dir)).to_pandas()
    scan = scan.drop_duplicates().sort_values(["repo", "module", "name"]).reset_index(drop=True)
    derived = symbols_from_docs(kg_result[0]["docs"]).to_pandas()
    derived = derived.drop_duplicates().sort_values(["repo", "module", "name"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(derived, scan)


def test_symbol_broadcast_payload_modes(ray_session, kg_result):
    """payload="table" ships the deduped Arrow rows and each worker
    builds the dict locally (TripleLinker.__init__); the resulting
    lookup must equal the driver-built dict payload bit-for-bit."""
    from recon_ray.pipelines.kg import symbols_from_docs
    from recon_ray.stages.link import TripleLinker, build_symbol_broadcast

    res, _, _ = kg_result
    st = symbols_from_docs(res["docs"])
    ref_d, d = build_symbol_broadcast(st)
    ref_t, none = build_symbol_broadcast(st, payload="table")
    assert none is None
    assert TripleLinker(ref_t).symbols == d == TripleLinker(ref_d).symbols
