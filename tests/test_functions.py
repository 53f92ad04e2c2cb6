"""Relational / text / dedup / similarity / multimodal functions — parity
against DuckDB or numpy oracles over the driver-provided testdata."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "documents", "embeddings", "events"]:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def lineitem():
    return rd.read_parquet(f"{SF}/lineitem.parquet")


@pytest.fixture(scope="module")
def docs():
    return rd.read_parquet(f"{SF}/documents.parquet").repartition(4)


@pytest.fixture(scope="module")
def emb():
    return rd.read_parquet(f"{SF}/embeddings.parquet").repartition(4)


def test_grouped_agg_vs_duckdb(lineitem, con):
    from recon_ray.functions.relational import grouped_agg

    got = grouped_agg(
        lineitem,
        ["l_returnflag", "l_linestatus"],
        {"l_quantity": ["sum", "mean"], "l_extendedprice": ["sum"],
         "l_orderkey": ["count"]},
    ).sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    want = con.execute(
        """SELECT l_returnflag, l_linestatus,
                  sum(l_quantity) AS l_quantity_sum,
                  avg(l_quantity) AS l_quantity_mean,
                  sum(l_extendedprice) AS l_extendedprice_sum,
                  count(l_orderkey) AS l_orderkey_count
           FROM lineitem GROUP BY 1,2 ORDER BY 1,2"""
    ).df()
    got = got[want.columns]
    got["l_orderkey_count"] = got["l_orderkey_count"].astype(want["l_orderkey_count"].dtype)
    pd.testing.assert_frame_equal(got, want, rtol=1e-9)


def test_broadcast_join_vs_duckdb(con):
    from recon_ray.functions.relational import broadcast_join, grouped_agg

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    joined = broadcast_join(orders, cust, on="o_custkey", small_on="c_custkey")
    got = grouped_agg(joined, "c_mktsegment", {"o_totalprice": ["sum", "count"]})
    got = got.sort_values("c_mktsegment").reset_index(drop=True)
    want = con.execute(
        """SELECT c_mktsegment, sum(o_totalprice) AS o_totalprice_sum,
                  count(o_totalprice) AS o_totalprice_count
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1 ORDER BY 1"""
    ).df()
    got["o_totalprice_count"] = got["o_totalprice_count"].astype(
        want["o_totalprice_count"].dtype
    )
    pd.testing.assert_frame_equal(got, want, rtol=1e-9)


def test_semi_anti_join(con):
    from recon_ray.functions.relational import anti_join, semi_join

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    big_cust = con.execute(
        "SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000"
    ).df()
    keys = set(big_cust["o_custkey"])
    n_semi = semi_join(orders, keys, "o_custkey").count()
    n_anti = anti_join(orders, keys, "o_custkey").count()
    want_semi = con.execute(
        """SELECT count(*) FROM orders WHERE o_custkey IN
           (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)"""
    ).fetchone()[0]
    assert n_semi == want_semi
    assert n_semi + n_anti == orders.count()


def test_topk_and_salted_count(lineitem, con):
    from recon_ray.functions.relational import local_global_topk, salted_group_count

    got = local_global_topk(
        lineitem, "l_extendedprice", 15,
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    want = con.execute(
        """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
           ORDER BY l_extendedprice DESC LIMIT 15"""
    ).df()
    assert got["l_extendedprice"].tolist() == want["l_extendedprice"].tolist()

    sc = salted_group_count(lineitem, "l_returnflag", n_salts=8)
    want2 = con.execute(
        "SELECT l_returnflag, count(*)::BIGINT AS count FROM lineitem GROUP BY 1"
    ).df()
    merged = sc.merge(want2, on="l_returnflag", suffixes=("_got", "_want"))
    assert (merged["count_got"] == merged["count_want"]).all()


def test_distinct(lineitem, con):
    from recon_ray.functions.relational import distinct

    got = distinct(lineitem, ["l_returnflag", "l_linestatus"]).to_pandas()
    want = con.execute(
        "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"
    ).df()
    assert set(map(tuple, got.itertuples(index=False))) == set(
        map(tuple, want.itertuples(index=False))
    )


def test_token_counts_vs_duckdb(docs, con):
    from recon_ray.functions.text import token_counts

    got = (
        docs.map_batches(token_counts, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = con.execute(
        """SELECT doc_id,
                  CASE WHEN trim(text)='' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT
                       AS n_tokens,
                  length(text)::BIGINT AS n_chars
           FROM documents ORDER BY doc_id"""
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_quality_scores(docs, con):
    from recon_ray.functions.text import quality_scores

    got = (
        docs.map_batches(quality_scores, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["n_chars"] > 0).any()
    assert (got["punct_ratio"] >= 0).all() and (got["punct_ratio"] <= 1).all()
    want_words = con.execute(
        "SELECT doc_id, len(regexp_extract_all(text, '\\w+'))::BIGINT AS n_words "
        "FROM documents ORDER BY doc_id"
    ).df()
    assert got["n_words"].tolist() == want_words["n_words"].tolist()


def test_language_id(docs):
    from recon_ray.functions.text import LanguageId

    got = docs.map_batches(
        LanguageId, batch_format="pyarrow", concurrency=2
    ).to_pandas()
    assert set(got.columns) == {"doc_id", "lang_pred", "lang_score"}
    assert len(got) == docs.count()
    assert set(got["lang_pred"]) <= {"en", "de", "fr", "es", "unknown"}
    # determinism
    again = docs.map_batches(
        LanguageId, batch_format="pyarrow", concurrency=2
    ).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )


def test_fingerprinter(docs):
    from recon_ray.functions.text import Fingerprinter

    got = docs.map_batches(
        Fingerprinter, batch_format="pyarrow", concurrency=2
    ).to_pandas()
    assert len(got) == docs.count()
    assert (got["n_grams"] > 0).all()
    # same text → same fingerprint (stable hashing)
    fp = Fingerprinter()
    t = "the quick brown fox jumps over the lazy dog again and again"
    assert fp.gram_hashes(t).min() == fp.gram_hashes(t).min()


def test_exact_dedup(docs, con):
    from recon_ray.functions.dedup import dup_groups, exact_dedup

    kept = exact_dedup(docs).to_pandas()
    want = con.execute(
        "SELECT count(DISTINCT text) FROM documents"
    ).fetchone()[0]
    assert len(kept) == want
    groups = dup_groups(docs)
    want_groups = con.execute(
        """SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS n_copies
           FROM documents GROUP BY text ORDER BY doc_id"""
    ).df()
    pd.testing.assert_frame_equal(groups, want_groups)


def test_exact_dedup_with_planted_dups():
    from recon_ray.functions.dedup import exact_dedup

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4, 5], "text": ["a b c", "d e f", "a b c", "a b c", "g"]}
    )
    kept = exact_dedup(rd.from_pandas(df).repartition(3)).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 2, 5]


def test_minhash_lsh_dedup_planted():
    from recon_ray.functions.dedup import minhash_lsh_dedup

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest before nightfall comes quickly")
    near = base.replace("green", "dark")
    far = "completely different words having nothing in common at all here"
    df = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "text": [base, near, far, base]}
    )
    res = minhash_lsh_dedup(rd.from_pandas(df).repartition(2), threshold=0.5,
                            concurrency=2)
    pairs = set(map(tuple, res["pairs"][["a", "b"]].itertuples(index=False)))
    assert (0, 3) in pairs  # exact dup
    assert (0, 1) in pairs or (1, 3) in pairs  # near dup
    assert not any(2 in p for p in pairs)  # far doc untouched
    assert res["n_duplicates"] >= 2


def test_minhash_distributed_paths_match_broadcast():
    """Planted mega-cluster: the shuffle-join verification path
    (candidate_broadcast_limit=0) and the distributed connected
    components (driver_limit=0) must return IDENTICAL pairs and
    clusters to the broadcast/driver paths."""
    import random

    from recon_ray.functions.dedup import (
        connected_components,
        minhash_lsh_dedup,
    )

    rng = random.Random(9)
    vocab = [f"tok{i}" for i in range(300)]
    texts, ids = [], []
    # one mega-cluster: 30 light mutations of a base doc; plus
    # 20 unrelated docs
    base_words = [rng.choice(vocab) for _ in range(60)]
    for i in range(30):
        w = list(base_words)
        w[rng.randrange(60)] = rng.choice(vocab)
        ids.append(i)
        texts.append(" ".join(w))
    for i in range(30, 50):
        ids.append(i)
        texts.append(" ".join(rng.choice(vocab) for _ in range(60)))
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts})
                        ).repartition(4)

    res_b = minhash_lsh_dedup(ds, threshold=0.6, concurrency=2)
    res_d = minhash_lsh_dedup(ds, threshold=0.6, concurrency=2,
                              candidate_broadcast_limit=0)
    pd.testing.assert_frame_equal(res_b["pairs"], res_d["pairs"])
    pd.testing.assert_frame_equal(res_b["clusters"], res_d["clusters"])
    assert res_b["n_duplicates"] == res_d["n_duplicates"] >= 20

    # CC equality on the verified edge set, forced distributed
    edges = rd.from_pandas(res_b["pairs"][["a", "b"]])
    cc_driver = connected_components(edges).sort_values(
        "doc_id").reset_index(drop=True)
    cc_shuffle = connected_components(edges, driver_limit=0).sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        cc_driver, cc_shuffle, check_dtype=False)


def test_minhash_pairs_as_dataset_mega_dup():
    """pairs_as_dataset=True on a mega-dup corpus (every doc a light
    mutation of one base → the edge list is pair-scaled): the return
    value must be a ray.data.Dataset whose collected content equals
    the default driver-side frame, and the indexes' ingest must honor
    the same flag."""
    import random

    import ray.data as rd_

    from recon_ray.functions.dedup import minhash_lsh_dedup

    rng = random.Random(21)
    vocab = [f"tok{i}" for i in range(300)]
    base_words = [rng.choice(vocab) for _ in range(60)]
    texts, ids = [], []
    for i in range(40):  # one 40-doc cluster → up to 780 edges
        w = list(base_words)
        w[rng.randrange(60)] = rng.choice(vocab)
        ids.append(i)
        texts.append(" ".join(w))
    ds = rd_.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts})
                         ).repartition(4)

    res_pd = minhash_lsh_dedup(ds, threshold=0.6, concurrency=2)
    res_ds = minhash_lsh_dedup(ds, threshold=0.6, concurrency=2,
                               pairs_as_dataset=True)
    assert isinstance(res_ds["pairs"], rd_.Dataset)
    got = (res_ds["pairs"].to_pandas().sort_values(["a", "b"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, res_pd["pairs"])
    assert res_ds["n_duplicates"] == res_pd["n_duplicates"] == 39


def test_minhash_index_pairs_as_dataset(tmp_path):
    """Ingest with pairs_as_dataset=True returns dup_pairs as a
    Dataset, equal to the default path's frame."""
    import random

    import ray.data as rd_

    from recon_ray.functions.minhash_index import (
        minhash_index_ingest,
        minhash_index_init,
    )

    rng = random.Random(22)
    vocab = [f"tok{i}" for i in range(300)]
    base_words = [rng.choice(vocab) for _ in range(60)]
    rows = []
    for i in range(20):
        w = list(base_words)
        w[rng.randrange(60)] = rng.choice(vocab)
        rows.append((i, " ".join(w)))
    ds = rd_.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"])
                         ).repartition(2)

    s1 = str(tmp_path / "i1")
    minhash_index_init(s1, threshold=0.6)
    r_pd = minhash_index_ingest(s1, ds, "b0")
    s2 = str(tmp_path / "i2")
    minhash_index_init(s2, threshold=0.6)
    r_ds = minhash_index_ingest(s2, ds, "b0", pairs_as_dataset=True)
    assert isinstance(r_ds["dup_pairs"], rd_.Dataset)
    got = (r_ds["dup_pairs"].to_pandas().sort_values(["a", "b"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, r_pd["dup_pairs"])
    assert r_ds["n_dup"] == r_pd["n_dup"] == 19
    # replay honors the flag too
    r_rep = minhash_index_ingest(s2, ds, "b0", pairs_as_dataset=True)
    assert r_rep["replayed"] and isinstance(r_rep["dup_pairs"],
                                            rd_.Dataset)


def test_connected_components_shuffle_long_chain():
    """High-diameter graph through the distributed path: a 12-node chain
    needs ~12 propagation rounds (each = 2 shuffle joins + a groupby-min)
    — the fixpoint detection must not stop early, and a disjoint pair
    must keep its own label."""
    from recon_ray.functions.dedup import connected_components

    chain = pd.DataFrame({"a": np.arange(11, dtype=np.int64) + 100,
                          "b": np.arange(11, dtype=np.int64) + 101})
    extra = pd.DataFrame({"a": np.int64([500]), "b": np.int64([501])})
    edges = rd.from_pandas(pd.concat([chain, extra], ignore_index=True)
                           ).repartition(3)
    got = connected_components(edges, driver_limit=0).sort_values(
        "doc_id").reset_index(drop=True)
    want = pd.DataFrame({
        "doc_id": list(range(100, 112)) + [500, 501],
        "cluster": [100] * 12 + [500, 500],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_simhash_dedup_planted():
    from recon_ray.functions.dedup import SimHasher, simhash_dedup

    import random

    rng = random.Random(3)
    vocab = [f"word{i}" for i in range(150)]
    words = [rng.choice(vocab) for _ in range(400)]
    base = " ".join(words)
    w2 = list(words)
    w2[5] = "changed"
    near = " ".join(w2)  # hamming distance 1 from base
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": [base, near, "zz yy xx"]})
    pairs = simhash_dedup(rd.from_pandas(df).repartition(2), max_hamming=3,
                          concurrency=2)
    assert (0, 1) in set(map(tuple, pairs[["a", "b"]].itertuples(index=False)))
    sh = SimHasher()
    assert sh.simhash(base) == sh.simhash(base)


def test_jaccard():
    from recon_ray.functions.dedup import jaccard

    assert jaccard("a b c d", "a b c d") == 1.0
    assert jaccard("a b c d", "x y z w") == 0.0


def test_embedding_neardup(emb):
    from recon_ray.functions.dedup import embedding_neardup

    pairs = embedding_neardup(emb, threshold=0.95)
    full = emb.to_pandas()
    mat = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    iu = np.triu_indices(len(mat), k=1)
    want = int((sims[iu] >= 0.95).sum())
    assert len(pairs) == want

    # planted near-dups: v, v+noise, and an orthogonal-ish vector
    rng = np.random.RandomState(0)
    v = rng.normal(size=64)
    near = v + rng.normal(scale=0.01, size=64)
    far = rng.normal(size=64)
    df = pd.DataFrame(
        {"vec_id": [10, 11, 12], "embedding": [v.tolist(), near.tolist(), far.tolist()]}
    )
    got = embedding_neardup(rd.from_pandas(df).repartition(2), threshold=0.98)
    assert got[["a", "b"]].values.tolist() == [[10, 11]]


def test_knn_bruteforce_vs_numpy(emb):
    from recon_ray.functions.similarity import knn_bruteforce

    full = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    queries = np.stack(full["embedding"].head(3).to_numpy())
    got = knn_bruteforce(emb, queries, k=5)
    mat = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries.astype(np.float64), axis=1, keepdims=True)
    sims = qn @ matn.T
    for qi in range(3):
        order = np.lexsort((full["vec_id"].to_numpy(), -sims[qi]))[:5]
        want_ids = full["vec_id"].to_numpy()[order].tolist()
        got_ids = got.loc[got["query_id"] == qi, "vec_id"].tolist()
        assert got_ids == want_ids
    # self-neighbor is rank 1 with cosine 1.0
    assert got[got["rank"] == 1]["cosine"].tolist() == [1.0, 1.0, 1.0]


def test_knn_lsh_recall(emb):
    from recon_ray.functions.similarity import knn_bruteforce, knn_lsh, knn_recall

    full = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    queries = np.stack(full["embedding"].head(8).to_numpy())
    exact = knn_bruteforce(emb, queries, k=5)
    approx = knn_lsh(emb, queries, k=5, n_bits=6, n_tables=8)
    r = knn_recall(approx, exact)
    assert r >= 0.5  # approximate, but must be in the right ballpark
    # the query vector itself always lands in its own bucket
    self_hits = approx[approx["rank"] == 1]
    assert (self_hits["cosine"] == 1.0).all()


def test_embedding_neardup_100x_planted():
    """40× the sf0.01 fixture with planted near-dup pairs scattered across
    blocks: the blocked exact path must return exactly the planted pairs
    (random 32-dim pairs can't reach cosine 0.98) with no driver
    materialization of the corpus."""
    from recon_ray.functions.dedup import embedding_neardup

    rng = np.random.RandomState(11)
    n, dim, n_dup = 20_000, 32, 50
    mat = rng.normal(size=(n, dim)).astype(np.float64)
    src = rng.choice(n - n_dup, size=n_dup, replace=False) + n_dup
    # rows 0..n_dup-1 become near-copies of rows src[i] (tiny perturbation)
    mat[:n_dup] = mat[src] + rng.normal(scale=1e-3, size=(n_dup, dim))
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                      "embedding": list(mat)})
    ).repartition(8)
    got = embedding_neardup(ds, threshold=0.98)
    want = sorted((min(i, int(s)), max(i, int(s))) for i, s in enumerate(src))
    assert list(map(tuple, got[["a", "b"]].values.tolist())) == want
    assert (got["cosine"] >= 0.98).all()


def test_embedding_neardup_presort_prunes_block_pairs():
    """On an angularly clustered corpus the LSH pre-sort must make the
    triangle prune fire: pairs run ≪ B(B+1)/2, and the result is
    identical to the unsorted path (the prune is exact either way)."""
    from recon_ray.functions.dedup import embedding_neardup

    rng = np.random.RandomState(3)
    # blocks ≫ clusters: most post-sort blocks sit inside one cluster
    # run, so their angular radius is small and the bound can fire
    n_clusters, per, dim = 8, 600, 24
    rows = []
    for c in range(n_clusters):
        center = rng.normal(size=dim)
        center /= np.linalg.norm(center)
        pts = center + rng.normal(scale=0.02, size=(per, dim))
        rows.append(pts)
    mat = np.concatenate(rows)
    order = rng.permutation(len(mat))  # scatter clusters across blocks
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(len(mat), dtype=np.int64)[order],
                      "embedding": list(mat[order])})
    ).repartition(32)
    stats: dict = {}
    # block_rows pinned small: the default 4096-row coalesce would fold
    # this 4.8k fixture into 2 blocks and the test would measure
    # sub-run granularity instead of the block-level prune
    got = embedding_neardup(ds, threshold=0.995, block_rows=150,
                            _stats=stats)
    assert stats["n_blocks"] >= 8
    # pre-sorted clustered blocks: the vast majority of cross-block
    # pairs are provably out of angular reach
    assert stats["n_pairs_run"] < stats["n_pairs_possible"] / 2
    stats_off: dict = {}
    got_off = embedding_neardup(ds, threshold=0.995, presort=False,
                                block_rows=150, _stats=stats_off)
    pd.testing.assert_frame_equal(got, got_off)
    # without the sort the prune rarely fires on scattered blocks
    assert stats_off["n_pairs_run"] >= stats["n_pairs_run"]


def test_knn_ivf_recall(emb):
    from recon_ray.functions.similarity import knn_bruteforce, knn_ivf, knn_recall

    full = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    queries = np.stack(full["embedding"].head(8).to_numpy())
    exact = knn_bruteforce(emb, queries, k=5)
    approx = knn_ivf(emb, queries, k=5, n_cells=8, nprobe=4)
    r = knn_recall(approx, exact)
    assert r >= 0.5, r
    # the query vector itself is always in a probed cell (its own)
    assert (approx[approx["rank"] == 1]["cosine"] == 1.0).all()
    # determinism
    again = knn_ivf(emb, queries, k=5, n_cells=8, nprobe=4)
    pd.testing.assert_frame_equal(approx, again)


def test_knn_lsh_recall_100x():
    """Recall vs exact at 100× the sf0.01 embeddings fixture (50k vectors)
    — the distributed candidate-pruning path must hold recall without ever
    collecting the corpus."""
    from recon_ray.functions.similarity import knn_bruteforce, knn_lsh, knn_recall

    rng = np.random.RandomState(7)
    n, dim = 50_000, 16
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    big = rd.from_pandas(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                      "embedding": list(mat)})
    ).repartition(16)
    queries = mat[:5].astype(np.float64)
    exact = knn_bruteforce(big, queries, k=10)
    approx = knn_lsh(big, queries, k=10, n_bits=8, n_tables=8)
    r = knn_recall(approx, exact)
    assert r >= 0.5, r
    assert (approx[approx["rank"] == 1]["cosine"] == 1.0).all()


def test_multimodal_stages():
    from recon_ray.functions.multimodal import (
        AudioFrameSampler,
        ImageFeatureExtractor,
        ImageResizer,
        MM_BATCH_SIZE,
        synthetic_media_table,
    )

    media = synthetic_media_table(20, seed=1)
    ds = rd.from_arrow(media)
    images = ds.filter(lambda r: r["kind"] == "image")
    feats = images.map_batches(
        ImageFeatureExtractor, batch_format="pyarrow",
        batch_size=MM_BATCH_SIZE, concurrency=2,
    ).to_pandas()
    assert len(feats) == 10
    assert all(len(m) == 3 for m in feats["channel_mean"])
    resized = images.map_batches(
        ImageResizer, fn_constructor_kwargs={"target": (8, 8)},
        batch_format="pyarrow", batch_size=MM_BATCH_SIZE, concurrency=2,
    ).to_pandas()
    assert (resized["width"] == 8).all() and (resized["height"] == 8).all()
    assert all(len(p) == 8 * 8 * 3 for p in resized["payload"])
    audio = ds.filter(lambda r: r["kind"] == "audio")
    rms = audio.map_batches(
        AudioFrameSampler, batch_format="pyarrow",
        batch_size=MM_BATCH_SIZE, concurrency=2,
    ).to_pandas()
    assert len(rms) == 10 and all(len(e) >= 1 for e in rms["frame_rms"])
    # determinism of the fake decode
    f2 = images.map_batches(
        ImageFeatureExtractor, batch_format="pyarrow",
        batch_size=MM_BATCH_SIZE, concurrency=2,
    ).to_pandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        f2.sort_values("media_id").reset_index(drop=True),
    )


def test_shuffle_join_vs_duckdb(con):
    from recon_ray.functions.relational import grouped_agg, shuffle_join

    li = rd.read_parquet(f"{SF}/lineitem.parquet").select_columns(
        ["l_orderkey", "l_quantity"]
    )
    orders = rd.read_parquet(f"{SF}/orders.parquet").select_columns(
        ["o_orderkey", "o_orderpriority"]
    )
    joined = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                          num_partitions=4)
    got = grouped_agg(joined, "o_orderpriority", {"l_quantity": ["sum", "count"]})
    got = got.sort_values("o_orderpriority").reset_index(drop=True)
    want = con.execute(
        """SELECT o_orderpriority, sum(l_quantity) AS l_quantity_sum,
                  count(*) AS l_quantity_count
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1 ORDER BY 1"""
    ).df()
    assert got["l_quantity_sum"].tolist() == pytest.approx(
        want["l_quantity_sum"].tolist()
    )
    assert got["l_quantity_count"].astype(int).tolist() == want[
        "l_quantity_count"
    ].astype(int).tolist()


def test_shuffle_join_left_outer():
    from recon_ray.functions.relational import shuffle_join

    a = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "x": list("abc")}))
    b = rd.from_pandas(pd.DataFrame({"j": [2], "y": ["z"]}))
    out = shuffle_join(a, b, on="k", right_on="j", how="left_outer",
                       num_partitions=2).to_pandas()
    assert len(out) == 3
    assert out["y"].notna().sum() == 1


def test_asof_join_backward_and_forward(con):
    """asof_join vs DuckDB ASOF JOIN on events (backward), plus the
    forward direction and the no-match/empty-side edges against a tiny
    hand-built pair of tables."""
    from recon_ray.functions.relational import asof_join

    ev = rd.read_parquet(f"{SF}/events.parquet")

    def only(et):
        import pyarrow.compute as pc

        return lambda t: t.filter(pc.equal(t["event_type"], et))

    cols = ["event_id", "user_id", "ts"]
    purchases = ev.map_batches(only("purchase"), batch_format="pyarrow").select_columns(cols)
    clicks = ev.map_batches(only("click"), batch_format="pyarrow").select_columns(cols)
    got = asof_join(purchases, clicks, by="user_id", on="ts").to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    gold = con.sql("""
        SELECT l.event_id, l.user_id, l.ts, l.event_id AS _drop,
               r.ts AS ts_r, r.event_id AS event_id_r
        FROM (SELECT * FROM events WHERE event_type='purchase') l
        ASOF JOIN (SELECT * FROM events WHERE event_type='click') r
          ON l.user_id = r.user_id AND r.ts <= l.ts
        ORDER BY l.event_id
    """).df().drop(columns=["_drop"])
    assert len(got) == len(gold)
    assert got["event_id"].tolist() == gold["event_id"].tolist()
    assert got["event_id_r"].astype("int64").tolist() == gold["event_id_r"].tolist()
    assert got["ts_r"].tolist() == gold["ts_r"].tolist()

    # forward direction + empty right: tiny deterministic frames
    l = rd.from_pandas(pd.DataFrame(
        {"k": [1, 1, 2], "t": [10, 20, 10], "lv": ["a", "b", "c"]}))
    r = rd.from_pandas(pd.DataFrame(
        {"k": [1, 1, 2], "t": [12, 25, 99], "rv": ["x", "y", "z"]}))
    fwd = asof_join(l, r, by="k", on="t", direction="forward").to_pandas()
    fwd = fwd.sort_values(["k", "t"]).reset_index(drop=True)
    # 1@10 → 1@12(x); 1@20 → 1@25(y); 2@10 → 2@99(z)
    assert fwd["rv_r"].tolist() == ["x", "y", "z"]
    bwd = asof_join(l, r, by="k", on="t").to_pandas()
    # backward: only 1@20 has a prior right row (1@12)
    assert bwd["lv"].tolist() == ["b"] and bwd["rv_r"].tolist() == ["x"]

    empty_r = rd.from_pandas(pd.DataFrame(
        {"k": pd.Series(dtype="int64"), "t": pd.Series(dtype="int64"),
         "rv": pd.Series(dtype="object")}))
    assert asof_join(l, empty_r, by="k", on="t").count() == 0


def test_window_over_vs_duckdb(con):
    """window_over vs DuckDB window functions: row_number / running
    sum / lag / lead / running min over events, plus multi-column
    partitions and single-row-partition edges on a tiny frame."""
    from recon_ray.functions.relational import window_over

    ev = rd.read_parquet(f"{SF}/events.parquet").select_columns(
        ["event_id", "user_id", "ts", "value"]
    )
    got = window_over(
        ev,
        "user_id",
        ["ts", "event_id"],
        [
            ("row_number", None, "rn"),
            ("running_sum", "value", "rs"),
            ("lag", "value", "prev_v"),
            ("lead", "value", "next_v"),
            ("running_min", "value", "min_v"),
        ],
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    gold = con.sql("""
        SELECT event_id,
               row_number() OVER w AS rn,
               sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS rs,
               lag(value) OVER w AS prev_v,
               lead(value) OVER w AS next_v,
               min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS min_v
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """).df()
    assert got["rn"].tolist() == gold["rn"].tolist()
    # float running sum: same order both sides; allow ulp-level slack
    assert np.allclose(got["rs"], gold["rs"])
    assert np.allclose(got["prev_v"], gold["prev_v"], equal_nan=True)
    assert np.allclose(got["next_v"], gold["next_v"], equal_nan=True)
    assert np.allclose(got["min_v"], gold["min_v"])

    # multi-column partition + singleton partitions
    tiny = rd.from_pandas(pd.DataFrame(
        {"a": [1, 1, 1, 2], "b": ["x", "x", "y", "y"],
         "t": [3, 1, 5, 5], "v": [10.0, 20.0, 30.0, 40.0]}))
    out = window_over(
        tiny, ["a", "b"], "t",
        [("row_number", None, "rn"), ("lag", "v", "pv"),
         ("lead", "v", "nv")],
    ).to_pandas().sort_values(["a", "b", "t"]).reset_index(drop=True)
    assert out["rn"].tolist() == [1, 2, 1, 1]
    assert out["pv"].fillna(-1).tolist() == [-1.0, 20.0, -1.0, -1.0]
    assert out["nv"].fillna(-1).tolist() == [10.0, -1.0, -1.0, -1.0]

    with pytest.raises(ValueError):
        window_over(tiny, "a", "t", [("median", "v", "m")])

    # rank/dense_rank with heavy ties vs DuckDB: order by a coarse key
    # (value bucket) so tie runs span many rows
    ties = con.sql(
        "SELECT event_id, user_id, floor(value/100)::BIGINT AS vb FROM events"
    ).df()
    got_r = window_over(
        rd.from_pandas(ties), "user_id", ["vb"],
        [("rank", None, "rk"), ("dense_rank", None, "drk")],
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    gold_r = con.sql("""
        SELECT event_id,
               rank() OVER (PARTITION BY user_id ORDER BY floor(value/100)) AS rk,
               dense_rank() OVER (PARTITION BY user_id
                                  ORDER BY floor(value/100)) AS drk
        FROM events ORDER BY event_id
    """).df()
    assert got_r["rk"].tolist() == gold_r["rk"].tolist()
    assert got_r["drk"].tolist() == gold_r["drk"].tolist()


def test_range_join_overlap_and_edges(con):
    """range_join: overlapping bands multi-match; closed='both' includes
    the hi edge; rows outside every band drop."""
    from recon_ray.functions.relational import range_join

    big = rd.from_pandas(pd.DataFrame({"id": [1, 2, 3, 4], "v": [5.0, 10.0, 25.0, 99.0]}))
    bands = pd.DataFrame(
        {"band": ["a", "b", "wide"], "lo": [0.0, 10.0, 0.0], "hi": [10.0, 30.0, 30.0]}
    )
    got = range_join(big, bands, on="v").to_pandas().sort_values(["id", "band"])
    # 5→(a,wide) 10→(b,wide) 25→(b,wide) 99→nothing
    assert list(map(tuple, got[["id", "band"]].itertuples(index=False))) == [
        (1, "a"), (1, "wide"), (2, "b"), (2, "wide"), (3, "b"), (3, "wide")]
    both = range_join(big, bands, on="v", closed="both").to_pandas()
    # closed='both': v=10 now also matches band a's hi edge
    assert len(both) == 7


def test_char_ngram_rolling_hash_brute_force():
    """The vectorized prefix-sum rolling hash equals direct polynomial
    evaluation of every window (mod 2^64), and distinct windows hash
    distinctly on random bytes."""
    from recon_ray.functions.dedup import char_ngram_hashes

    rng = np.random.default_rng(0)
    # mixed ASCII + multi-byte codepoints: windows are CHARACTERS, and the
    # hash runs over codepoints so it agrees with SQL substring semantics
    data = "".join(
        chr(c) for c in rng.integers(32, 0x2FFF, 300)
    )
    n = 7
    got = char_ngram_hashes(data, n)
    B, M = 1099511628211, 1 << 64
    exp = [
        sum(
            (ord(data[i + j]) + 1) * pow(B, n - 1 - j, M) for j in range(n)
        ) % M
        for i in range(len(data) - n + 1)
    ]
    assert (got == np.array(exp, dtype=np.uint64)).all()
    assert len(np.unique(got)) == len(got)
    assert len(char_ngram_hashes("abc", 7)) == 0  # shorter than n
    # equal windows hash equal
    rep = char_ngram_hashes("xyzxyzxyz", 3)
    assert rep[0] == rep[3] == rep[6]
    # non-ASCII: an n-CHAR shared run is found (byte windows would need
    # 2n bytes and miss it)
    from recon_ray.functions.dedup import cross_doc_ngram_dups

    run = "é" * 20
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": ["x " + run, "y " + run]}))
    out = cross_doc_ngram_dups(docs, n=20)
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]


def test_cross_doc_ngram_dups_semantics():
    """Pairs sharing a verbatim n-gram are found with the exact distinct
    shared-gram count; stride>1 still catches long runs; grams hotter
    than the cap are skipped."""
    from recon_ray.functions.dedup import cross_doc_ngram_dups

    run = "A" * 30  # shared verbatim run, docs otherwise distinct
    docs = rd.from_pandas(pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "left padding " + run + " one tail",
                "other intro " + run + " two tails",
                "completely unrelated content with no shared runs here",
            ],
        }
    ))
    out = cross_doc_ngram_dups(docs, n=20)
    # 3 distinct shared 20-grams: 'A'*20, ' '+'A'*19 (space precedes the
    # run in both docs), 'A'*19+' ' (space follows in both); windows
    # reaching further into the differing padding don't match
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert out["n_shared"].tolist() == [3]
    # stride: the shared run (length 30 ≥ n+stride−1 = 24) is still caught
    strided = cross_doc_ngram_dups(docs, n=20, stride=5)
    assert strided[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    # hot-gram cap: a gram in all 3 docs with cap 2 drops every pair
    hot = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["Z" * 25, "Z" * 25, "Z" * 25]}
    ))
    assert len(cross_doc_ngram_dups(hot, n=20, max_docs_per_gram=2)) == 0
    assert len(cross_doc_ngram_dups(hot, n=20)) == 3  # all 3 pairs


def test_ngram_contamination_planted():
    """Cross-side-only: corpus↔probe leaks are found, corpus-internal
    duplication is NOT reported, and the hot-gram cap drops only
    corpus-side boilerplate (probe grams always survive)."""
    from recon_ray.functions.dedup import ngram_contamination

    leak = "B" * 25
    boiler = "C" * 25
    corpus = rd.from_pandas(pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha " + leak + " text",     # leaks probe 100
                "beta " + leak + " other",     # leaks probe 100
                "gamma " + boiler + " pad",    # boilerplate (capped)
                "delta " + boiler + " pad2",   # boilerplate (capped)
            ],
        }
    ))
    probe = rd.from_pandas(pd.DataFrame(
        {"doc_id": [100, 200],
         "text": ["held out " + leak + " q", "clean probe text here x"]}
    ))
    out = ngram_contamination(corpus, probe, n=20)
    assert set(map(tuple, out[["doc_id", "probe_id"]].values.tolist())) == {
        (1, 100), (2, 100)}
    # cap=1 drops the leak gram on the corpus side (2 corpus docs carry it)
    capped = ngram_contamination(corpus, probe, n=20, max_docs_per_gram=1)
    assert len(capped) == 0


def test_ngram_jaccard_dedup_exact_recall(docs):
    """Prefix filtering is EXACT: the distributed join must return exactly
    the brute-force all-pairs Jaccard ≥ τ set (MinHash-LSH only promises
    probabilistic recall; this operator promises all of it)."""
    import numpy as np

    from recon_ray.functions.dedup import (
        ShingleSets, ngram_jaccard_dedup)

    tau, k = 0.5, 3
    res = ngram_jaccard_dedup(docs, threshold=tau, k=k)
    got = set(map(tuple, res["pairs"][["a", "b"]].itertuples(index=False)))

    # brute force on the driver (500 docs → 125k pairs)
    sh = ShingleSets(k=k)
    frames = [sh(b) for b in docs.select_columns(["doc_id", "text"])
              .iter_batches(batch_format="pyarrow")]
    ids, sets = [], []
    for t in frames:
        ids += t.column("doc_id").to_pylist()
        sets += [np.asarray(s, dtype=np.uint64) for s in t.column("shingles").to_pylist()]
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            sa, sb = sets[i], sets[j]
            if len(sa) == 0 and len(sb) == 0:
                jac = 1.0
            elif len(sa) == 0 or len(sb) == 0:
                jac = 0.0
            else:
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                jac = inter / (len(sa) + len(sb) - inter)
            if jac >= tau:
                a, b = sorted((ids[i], ids[j]))
                want.add((a, b))
    assert got == want
    assert len(res["clusters"]) >= 0  # clustering shape sanity


def test_repetition_scores_hand_computed():
    """Gopher repetition signals on hand-computed docs (incl. empty and
    single-word edges)."""
    import pyarrow as pa

    from recon_ray.functions.text import repetition_scores

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a a a b", "x y x y x", "", "hi"]),
        }
    )
    out = repetition_scores(batch).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_words"] == 4
    assert out.loc[0, "dup_word_frac"] == 0.5          # 4 words, 2 distinct
    assert abs(out.loc[0, "dup_2gram_frac"] - 1 / 3) < 1e-12  # aa,aa,ab
    assert out.loc[0, "dup_3gram_frac"] == 0.0         # aaa,aab distinct
    assert out.loc[0, "top_word_frac"] == 0.75         # 'a' 3/4
    assert out.loc[1, "dup_word_frac"] == 0.6          # 5 words, 2 distinct
    assert out.loc[1, "dup_2gram_frac"] == 0.5         # xy,yx,xy,yx
    assert abs(out.loc[1, "dup_3gram_frac"] - 1 / 3) < 1e-12
    assert out.loc[2, "n_words"] == 0
    assert (out.loc[2, ["dup_word_frac", "dup_2gram_frac", "dup_3gram_frac",
                        "top_word_frac"]] == 0).all()
    assert out.loc[3, "n_words"] == 1
    assert out.loc[3, "top_word_frac"] == 1.0
    assert out.loc[3, "dup_2gram_frac"] == 0.0


def test_kmeans_distributed(emb):
    """Distributed Lloyd's: deterministic across runs (order-independent
    reduce), sizes partition the corpus, assignments agree with sizes,
    and the final inertia beats a 1-iteration fit."""
    import numpy as np

    from recon_ray.functions.similarity import assign_clusters, kmeans

    r1 = kmeans(emb, k=6, n_iter=4, seed=7)
    r2 = kmeans(emb, k=6, n_iter=4, seed=7)
    np.testing.assert_array_equal(r1["sizes"], r2["sizes"])
    np.testing.assert_allclose(r1["centroids"], r2["centroids"])
    assert r1["sizes"].sum() == r1["n"] == emb.count()
    short = kmeans(emb, k=6, n_iter=1, seed=7)
    assert r1["inertia"] <= short["inertia"] + 1e-9
    assigned = assign_clusters(emb, r1["centroids"]).to_pandas()
    got_sizes = (
        assigned["cluster"].value_counts().reindex(range(6), fill_value=0)
    )
    np.testing.assert_array_equal(got_sizes.to_numpy(), r1["sizes"])


def test_ngram_jaccard_freq_order_identical(docs):
    """Rare-first prefix ordering (hot_shingles pre-pass) is a pure
    bucket-shape optimization: the verified pair set must be IDENTICAL to
    hash-order prefixes, and the hot set must be non-empty on this corpus
    (else the test exercises nothing)."""
    from recon_ray.functions.dedup import (
        ShingleSets, hot_shingles, ngram_jaccard_dedup)

    base = ngram_jaccard_dedup(docs, threshold=0.5, k=3)
    sh = docs.map_batches(
        ShingleSets(k=3), batch_format="pyarrow", zero_copy_batch=True
    )
    hot = hot_shingles(sh, df_threshold=5)
    assert len(hot) > 0
    freq = ngram_jaccard_dedup(docs, threshold=0.5, k=3, freq_order_df=5)
    a = base["pairs"][["a", "b", "jaccard"]].reset_index(drop=True)
    b = freq["pairs"][["a", "b", "jaccard"]].reset_index(drop=True)
    assert a.equals(b)


def test_dedup_keep_best(docs):
    """keep-best policy over minhash clusters: exactly one keeper per
    cluster, the keeper maximizes quality (token count, tie -> min
    doc_id), and the filtered corpus drops exactly the losers."""
    import numpy as np

    from recon_ray.functions.dedup import dedup_keep_best, minhash_lsh_dedup

    res = minhash_lsh_dedup(docs, threshold=0.7)
    clusters = res["clusters"]
    assert len(clusters) > 0
    kb = dedup_keep_best(docs, clusters)
    keep = kb["keep"]
    per = keep.groupby("cluster")["keep"].sum()
    assert (per == 1).all()
    for _, g in keep.groupby("cluster"):
        best = g.sort_values(["quality", "doc_id"],
                             ascending=[False, True]).iloc[0]
        assert bool(best["keep"])
    n_total = docs.count()
    assert kb["filtered"].count() == n_total - len(kb["drop_ids"])
    assert set(kb["drop_ids"]).isdisjoint(
        set(keep.loc[keep["keep"], "doc_id"])
    )


def test_hll_distinct_accuracy(events):
    """HLL estimate within 3% of exact distinct (p=12 → σ≈1.6%)."""
    from recon_ray.functions.sketches import hll_distinct

    exact = events.to_pandas()["user_id"].nunique()
    est = hll_distinct(events, "user_id", p=12)["estimate"]
    assert abs(est - exact) / exact < 0.03
    # determinism: registers merge order-free
    est2 = hll_distinct(events, "user_id", p=12)["estimate"]
    assert est == est2


def test_exact_quantiles_vs_numpy(events):
    """Two-pass histogram quantiles return the EXACT nearest-rank element
    (incl. q=0/1 edges and an all-equal column)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from recon_ray.functions.sketches import exact_quantiles

    vals = np.sort(events.to_pandas()["value"].to_numpy())
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = exact_quantiles(events, "value", qs)
    n = len(vals)
    for q, g in zip(qs, got):
        want = vals[min(max(int(np.ceil(q * n)) - 1, 0), n - 1)]
        assert g == want, (q, g, want)
    const = rd.from_pandas(pd.DataFrame({"value": [3.5] * 100}))
    assert exact_quantiles(const, "value", [0.5]) == [3.5]


def test_heavy_hitters_guarantee(events):
    """MG + exact recount equals the full-groupby top-k, and the
    guarantee violation raises instead of silently returning wrong
    counts."""
    import pytest

    from recon_ray.functions.sketches import heavy_hitters

    df = events.to_pandas()
    exact = (
        df["event_type"].astype(str).value_counts().reset_index()
    )
    exact.columns = ["value", "count"]
    exact = exact.sort_values(["count", "value"], ascending=[False, True],
                              kind="mergesort").head(3).reset_index(drop=True)
    got = heavy_hitters(events, "event_type", k=3, capacity=512)
    assert got.equals(exact.astype({"count": "int64"}))
    with pytest.raises(AssertionError):
        # capacity 1 cannot guarantee a top-3 over 5 event types
        heavy_hitters(events, "event_type", k=3, capacity=1)


@pytest.fixture(scope="module")
def events():
    return rd.read_parquet(f"{SF}/events.parquet").repartition(4)


def test_pack_sequences_vs_duckdb(docs, con):
    from recon_ray.pipelines.queries import (ORACLE_DOC_PACK,
                                             PACK_MAX_TOKENS, PACK_N_BUCKETS)
    from recon_ray.functions.pack import pack_sequences

    got = (
        pack_sequences(docs, max_tokens=PACK_MAX_TOKENS,
                       n_buckets=PACK_N_BUCKETS)
        .to_pandas()[["doc_id", "bucket", "n_tokens", "seq_id"]]
        .astype("int64")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = con.execute(ORACLE_DOC_PACK).df().astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_pack_sequences_semantics():
    """Greedy edge cases: budget boundary, oversized doc, empty doc."""
    from recon_ray.functions.pack import pack_sequences, pack_stats

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            # budget 10, one bucket: [4,6] fill pack 0 exactly; the 12-token
            # doc is oversized -> its own pack; 0-token doc joins pack 2
            "text": [
                "a b c d",            # 4 tokens
                "a b c d e f",        # 6 -> closes pack 0 at exactly 10
                "x " * 12,            # 12 > budget -> singleton pack 1
                "p q r",              # 3 -> pack 2
                "   ",                # 0 tokens -> stays in pack 2
                "s t u v w x y z",    # 8 -> 3+0+8 > 10 -> pack 3
            ],
        }
    )
    out = (
        pack_sequences(rd.from_pandas(df).repartition(3), max_tokens=10,
                       n_buckets=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["seq_id"].tolist() == [0, 0, 1, 2, 2, 3]
    assert out["n_tokens"].tolist() == [4, 6, 12, 3, 0, 8]
    st = pack_stats(
        pack_sequences(rd.from_pandas(df), max_tokens=10, n_buckets=1)
    )
    assert st["n_docs"].tolist() == [2, 1, 2, 1]
    assert st["pack_tokens"].tolist() == [10, 12, 3, 8]


def test_langid_vs_duckdb_oracle(docs, con):
    """The stopword-argmax heuristic must match its generated SQL oracle
    row-exactly (tie-break = dict order, min_score -> unknown)."""
    from recon_ray.functions.text import make_langid_batch
    from recon_ray.pipelines.queries import _langid_oracle_sql

    got = (
        docs.map_batches(make_langid_batch(), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = con.execute(_langid_oracle_sql()).df()
    pd.testing.assert_frame_equal(got, want)


def test_centroid_norms_vs_duckdb(con):
    """Quantized centroid norms must be bit-identical to SQL regardless of
    batch partitioning (exact int64 partial sums)."""
    from recon_ray.pipelines.queries import (ORACLE_EMB_CENTROID_NORMS,
                                             emb_label_centroid_norms)

    got = emb_label_centroid_norms(SF)
    want = con.execute(ORACLE_EMB_CENTROID_NORMS).df().astype(
        {"label": "int64", "n_vectors": "int64"}
    )
    pd.testing.assert_frame_equal(got, want)


def test_video_frame_sampler():
    """Frame-sample plumbing: stride sampling decodes ceil(n_frames/stride)
    frames, deterministic across runs, distinct frames differ."""
    from recon_ray.functions.multimodal import (MM_BATCH_SIZE,
                                                VideoFrameSampler,
                                                synthetic_media_table)

    media = synthetic_media_table(12, seed=3, kinds=("image", "audio", "video"))
    ds = rd.from_arrow(media).filter(lambda r: r["kind"] == "video")
    got = (
        ds.map_batches(VideoFrameSampler, batch_format="pyarrow",
                       batch_size=MM_BATCH_SIZE, concurrency=1,
                       fn_constructor_kwargs={"stride": 4, "fps": 30})
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    meta = media.to_pandas().query("kind == 'video'").set_index("media_id")
    assert len(got) == len(meta)
    for _, row in got.iterrows():
        n_frames = max(1, int(meta.loc[row.media_id, "duration_ms"]) * 30 // 1000)
        expect_idx = list(range(0, n_frames, 4))
        assert list(row.frame_idx) == expect_idx
        assert len(row.frame_mean) == len(expect_idx)
        if len(row.frame_mean) > 1:  # salted keystream -> frames differ
            assert len(set(row.frame_mean)) > 1
    # determinism
    again = (
        rd.from_arrow(media).filter(lambda r: r["kind"] == "video")
        .map_batches(VideoFrameSampler, batch_format="pyarrow",
                     batch_size=MM_BATCH_SIZE, concurrency=1,
                     fn_constructor_kwargs={"stride": 4, "fps": 30})
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)


def test_intersect_difference_vs_duckdb(events, con):
    from recon_ray.functions.relational import difference, intersect

    def side(et):
        def proj(b):
            s = b[b["event_type"] == et]
            return pd.DataFrame(
                {"user_id": s["user_id"], "day": s["ts"].dt.floor("D")}
            )
        return events.map_batches(proj, batch_format="pandas")

    got_i = (
        intersect(side("purchase"), side("click"), ["user_id", "day"])
        .to_pandas().astype({"user_id": "int64"})
        .sort_values(["user_id", "day"]).reset_index(drop=True)
    )
    want_i = con.execute(
        """SELECT user_id, day FROM (
             SELECT DISTINCT user_id, date_trunc('day', ts) AS day
             FROM events WHERE event_type='purchase'
             INTERSECT
             SELECT DISTINCT user_id, date_trunc('day', ts) AS day
             FROM events WHERE event_type='click')
           ORDER BY user_id, day"""
    ).df()
    pd.testing.assert_frame_equal(got_i, want_i)

    got_d = (
        difference(side("purchase"), side("click"), ["user_id", "day"])
        .to_pandas().astype({"user_id": "int64"})
        .sort_values(["user_id", "day"]).reset_index(drop=True)
    )
    want_d = con.execute(
        """SELECT user_id, day FROM (
             SELECT DISTINCT user_id, date_trunc('day', ts) AS day
             FROM events WHERE event_type='purchase'
             EXCEPT
             SELECT DISTINCT user_id, date_trunc('day', ts) AS day
             FROM events WHERE event_type='click')
           ORDER BY user_id, day"""
    ).df()
    pd.testing.assert_frame_equal(got_d, want_d)
    # sanity: intersect + except partition the purchase side
    n_purchase = con.execute(
        """SELECT count(*) FROM (SELECT DISTINCT user_id,
           date_trunc('day', ts) FROM events WHERE event_type='purchase')"""
    ).df().iloc[0, 0]
    assert len(got_i) + len(got_d) == n_purchase


def test_curate_pipeline(docs, con):
    """Composed curation (filters -> exact dedup -> pack) vs its composed
    SQL oracle at sf0.001, plus the near-dedup variant's invariants."""
    from recon_ray.pipelines.curate import curate
    from recon_ray.pipelines.queries import _curation_oracle_sql

    res = curate(docs)
    got = (
        res["packed"].to_pandas()[["doc_id", "bucket", "n_tokens", "seq_id"]]
        .astype("int64").sort_values("doc_id").reset_index(drop=True)
    )
    want = con.execute(_curation_oracle_sql()).df().astype("int64")
    pd.testing.assert_frame_equal(got, want)
    assert 0 < len(got) < 500  # every gate bites, none annihilates

    # near-dedup variant: survivors are a subset, packs stay within budget
    res_nd = curate(docs, near_dedup=True, minhash_threshold=0.5)
    nd = (
        res_nd["packed"].to_pandas()
        .astype({"doc_id": "int64"}).sort_values("doc_id")
    )
    assert set(nd["doc_id"]) <= set(got["doc_id"])
    grp = nd.groupby(["bucket", "seq_id"])
    singleton_max = nd["n_tokens"].max()
    for (_, _), g in grp:
        assert g["n_tokens"].sum() <= max(512, singleton_max)


def test_pack_texts_vs_duckdb(docs, con):
    """Concatenated pack texts match string_agg-ordered SQL exactly."""
    from recon_ray.functions.pack import pack_texts
    from recon_ray.pipelines.queries import (ORACLE_DOC_PACK_TEXTS,
                                             PACK_MAX_TOKENS, PACK_N_BUCKETS)

    got = (
        pack_texts(docs, max_tokens=PACK_MAX_TOKENS, n_buckets=PACK_N_BUCKETS)
        .to_pandas()
        .astype({"bucket": "int64", "seq_id": "int64",
                 "n_docs": "int64", "pack_tokens": "int64"})
        [["bucket", "seq_id", "seq_text", "n_docs", "pack_tokens"]]
        .sort_values(["bucket", "seq_id"]).reset_index(drop=True)
    )
    want = con.execute(ORACLE_DOC_PACK_TEXTS).df()
    pd.testing.assert_frame_equal(got, want)


def test_knn_ivf_full_probe_equals_exact(emb):
    """nprobe = n_cells disables pruning: IVF must return the exact
    neighbor sets (recall 1.0) — isolates any correctness bug from the
    recall/pruning trade-off."""
    from recon_ray.functions.similarity import (knn_bruteforce, knn_ivf,
                                                knn_recall)

    full = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    queries = np.stack(full["embedding"].head(6).to_numpy())
    exact = knn_bruteforce(emb, queries, k=5)
    approx = knn_ivf(emb, queries, k=5, n_cells=8, nprobe=8)
    assert knn_recall(approx, exact) == 1.0


def test_count_min_never_underestimates(events):
    """CMS guarantee: estimate >= exact count for every queried value;
    at width 2048 with 5 distinct keys the rows are collision-free so the
    estimates are EXACT; merge order is free (elementwise sum)."""
    from recon_ray.functions.sketches import (count_min_estimate,
                                              count_min_partials)

    exact = (
        events.to_pandas()["event_type"].value_counts().sort_index()
    )
    sk = count_min_partials(events, "event_type", depth=4, width=2048)
    got = count_min_estimate(sk, list(exact.index)).set_index("value")[
        "estimate"
    ]
    assert (got == exact).all()
    assert sk["n"] == int(exact.sum())
    # narrow sketch: still never underestimates
    sk2 = count_min_partials(events, "event_type", depth=2, width=2)
    got2 = count_min_estimate(sk2, list(exact.index)).set_index("value")[
        "estimate"
    ]
    assert (got2 >= exact).all()


def test_count_min_rows_are_independent():
    """Regression: values 40 and 68 have _hash64 collisions mod 2048, so
    under the old (h * odd_seed) % width row scheme they shared ALL depth
    cells (effective depth 1 — both estimates read c(40)+c(68)). With
    per-row remixing the min over depth separates them exactly."""
    import pandas as pd
    import ray.data as rd

    from recon_ray.functions.sketches import (count_min_estimate,
                                              count_min_partials)

    df = pd.DataFrame({"v": [40] * 100 + [68] * 7})
    sk = count_min_partials(
        rd.from_pandas(df).repartition(3), "v", depth=4, width=2048
    )
    got = count_min_estimate(sk, [40, 68]).set_index("value")["estimate"]
    assert int(got[40]) == 100
    assert int(got[68]) == 7


def test_pivot_agg_pinned_categories(events, con):
    """pivot_agg vs DuckDB conditional aggregation; a category absent from
    the input still yields a fill column (stable schema across shards)."""
    from recon_ray.functions.relational import pivot_agg

    got = pivot_agg(
        events.select_columns(["user_id", "event_type", "value"]),
        "user_id", "event_type", value_col="value", agg="sum",
        categories=["click", "view", "never_seen"], fill=0,
    ).sort_values("user_id").reset_index(drop=True)
    assert "never_seen" in got.columns and (got["never_seen"] == 0).all()
    want = con.execute(
        """SELECT user_id,
                  coalesce(sum(value) FILTER (event_type='click'), 0) AS click,
                  coalesce(sum(value) FILTER (event_type='view'), 0) AS view
           FROM events GROUP BY 1 ORDER BY 1"""
    ).df()
    assert list(got["user_id"]) == list(want["user_id"])
    for t in ["click", "view"]:
        np.testing.assert_allclose(got[t].to_numpy(), want[t].to_numpy())


def test_grouped_mode_tiebreak():
    """Deterministic mode: highest count wins, ties break to the smallest
    value — regardless of row order or partitioning."""
    from recon_ray.functions.relational import grouped_mode

    df = pd.DataFrame(
        {"k": [1, 1, 1, 1, 2, 2, 2, 2],
         "v": ["b", "b", "a", "a", "z", "y", "z", "y"]}
    )
    for parts in (1, 4):
        got = (
            grouped_mode(rd.from_pandas(df).repartition(parts), "k", "v")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert list(got["v_mode"]) == ["a", "y"]
        assert list(got["mode_count"]) == [2, 2]


def test_key_profile_exact(events):
    """key_profile totals and top-k match a pandas ground truth, including
    the count-desc/key-asc boundary tie-break."""
    from recon_ray.functions.relational import key_profile

    pdf = events.to_pandas()
    prof = key_profile(events.select_columns(["user_id"]), "user_id", k=7)
    assert prof["n_rows"] == len(pdf)
    assert prof["n_keys"] == pdf["user_id"].nunique()
    want = (
        pdf.groupby("user_id").size().rename("count").reset_index()
        .sort_values(["count", "user_id"], ascending=[False, True],
                     kind="mergesort").head(7).reset_index(drop=True)
    )
    assert list(prof["top"]["user_id"]) == list(want["user_id"])
    assert list(prof["top"]["count"]) == list(want["count"])
    assert (prof["top"]["share_ppm"]
            == prof["top"]["count"] * 1_000_000 // len(pdf)).all()


def test_dsir_weights_semantics(docs):
    """DSIR: (a) weights match a hand computation of the add-1 smoothed
    log-ratio rule on a tiny corpus; (b) on real docs, the mean weight of
    target-language docs exceeds the mean weight of the rest."""
    import math

    from recon_ray.functions.dsir import make_dsir_scorer, train_dsir

    tiny = pd.DataFrame(
        {"doc_id": [0, 1, 2],
         "text": ["apple apple pie", "apple tart", "rust iron ore"],
         "lang": ["en", "en", "xx"]}
    )
    model = train_dsir(
        rd.from_pandas(tiny).repartition(2), lambda b: b["lang"] == "en"
    )
    v, n_raw, n_tgt = model["V"], model["n_raw"], model["n_target"]
    assert (v, n_raw, n_tgt) == (6, 8, 5)

    def lr(w, ct, cr):
        return math.log((ct + 1) / (n_tgt + v)) - math.log(
            (cr + 1) / (n_raw + v))

    np.testing.assert_allclose(model["lr"]["apple"], lr("apple", 3, 3))
    np.testing.assert_allclose(model["lr"]["rust"], lr("rust", 0, 1))
    got = (
        rd.from_pandas(tiny)
        .map_batches(make_dsir_scorer(model), batch_format="pandas")
        .to_pandas().sort_values("doc_id")
    )
    # doc 0 = "apple apple pie"
    w0 = 2 * model["lr"]["apple"] + model["lr"]["pie"]
    np.testing.assert_allclose(got["dsir_weight"].iloc[0], round(w0, 6))
    assert list(got["n_words"]) == [3, 2, 3]

    real = rd.read_parquet(f"{SF}/documents.parquet")
    m = train_dsir(real, lambda b: b["lang"] == "en")
    scored = (
        real.map_batches(make_dsir_scorer(m), batch_format="pandas")
        .to_pandas()
        .merge(real.to_pandas()[["doc_id", "lang"]], on="doc_id")
    )
    en = scored.loc[scored["lang"] == "en", "dsir_weight"].mean()
    rest = scored.loc[scored["lang"] != "en", "dsir_weight"].mean()
    assert en > rest


def test_json_extract_dirty_payloads():
    """Malformed JSON, missing fields, nulls, and wrong-typed values all
    degrade to NULL — never a task failure."""
    from recon_ray.functions.jsonx import json_extract_cols

    df = pd.DataFrame(
        {"id": [0, 1, 2, 3, 4, 5],
         "props": ['{"k": 7, "s": "x"}', '{"s": "y"}', "not json",
                   None, '{"k": "12"}', '[1,2]']}
    )
    got = (
        json_extract_cols(
            rd.from_pandas(df).repartition(3), "props",
            {"k": "int64", "s": "string"},
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert got["k"].tolist()[0] == 7
    assert got["k"].tolist()[4] == 12          # "12" coerces
    assert got["k"].isna().tolist() == [False, True, True, True, False, True]
    assert got["s"].tolist()[:2] == ["x", "y"]
    assert "props" not in got.columns


def test_bloom_guarantees(events):
    """No false negatives ever; FPR on absent probes under 4× the design
    bound; OR-merge is layout-invariant."""
    from recon_ray.functions.sketches import bloom_contains, bloom_partials

    present = events.to_pandas()["user_id"].unique()
    sk = bloom_partials(events, "user_id", m_bits=1 << 14, k=7)
    assert sk["n"] == events.count()
    got = bloom_contains(sk, list(present))
    assert got["present"].all()                 # guarantee, not luck
    absent = np.arange(1_000_000, 1_010_000)
    fp = bloom_contains(sk, list(absent))["present"].mean()
    n, m, k = len(present), 1 << 14, 7
    bound = (1 - np.exp(-k * n / m)) ** k
    assert fp <= max(4 * bound, 0.004)
    sk2 = bloom_partials(events.repartition(13), "user_id",
                         m_bits=1 << 14, k=7)
    assert (sk["bits"] == sk2["bits"]).all()


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_skew_join_equals_pandas(how):
    """skew_join on a zipf-skewed key (one key = 60% of rows) returns
    exactly the pandas merge, for inner and left_outer, with hot AND
    cold paths both populated; and with no hot keys it degrades to the
    plain shuffle join."""
    from recon_ray.functions.relational import skew_join

    rng = np.random.RandomState(7)
    keys = np.concatenate(
        [np.zeros(600, dtype=np.int64),                  # hot key 0
         rng.randint(1, 50, size=400).astype(np.int64)]  # cold tail
    )
    left = pd.DataFrame({"k": keys, "x": np.arange(1000, dtype=np.int64)})
    right = pd.DataFrame(
        {"rk": np.arange(0, 40, dtype=np.int64),
         "y": np.arange(0, 40, dtype=np.int64) * 10}
    )
    got = (
        skew_join(
            rd.from_pandas(left).repartition(8),
            rd.from_pandas(right).repartition(4),
            on="k", right_on="rk", how=how,
            hot_share_ppm=100_000, max_hot_keys=4,
        )
        .to_pandas()
    )
    want = left.merge(
        right, left_on="k", right_on="rk",
        how="inner" if how == "inner" else "left",
    )
    key = lambda df: df.sort_values(["k", "x"]).reset_index(drop=True)
    got = key(got[["k", "x", "y"]])
    want = key(want[["k", "x", "y"]])
    pd.testing.assert_frame_equal(
        got.astype({"y": "float64"}), want.astype({"y": "float64"})
    )


def test_bloom_semi_join_equals_exact(events):
    """bloom_semi_join(exact=True) returns exactly the rows whose key is
    in the key Dataset; exact=False returns a superset of them."""
    from recon_ray.functions.relational import bloom_semi_join

    keys = rd.from_pandas(
        pd.DataFrame({"user_id": np.array([1, 3, 5, 7, 1], dtype=np.int64)})
    ).repartition(2)
    got = bloom_semi_join(events, keys, on="user_id").to_pandas()
    pdf = events.to_pandas()
    want = pdf[pdf["user_id"].isin([1, 3, 5, 7])]
    assert len(got) == len(want)
    assert sorted(got["event_id"]) == sorted(want["event_id"])
    loose = bloom_semi_join(events, keys, on="user_id",
                            exact=False).to_pandas()
    assert set(want["event_id"]) <= set(loose["event_id"])


def test_edit_distance_pairs_vs_duckdb(docs, con):
    """Distributed fuzzy pairs == DuckDB self-join replaying the exact
    blocking + byte-level levenshtein rule."""
    from recon_ray.functions.dedup import edit_distance_pairs

    got = (
        edit_distance_pairs(docs, group_col="lang")
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    want = con.execute(
        """WITH k AS (SELECT doc_id, lang, substr(text,1,48) AS key,
                             substr(text,1,8) AS blk FROM documents)
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  levenshtein(a.key, b.key)::BIGINT AS dist
           FROM k a JOIN k b ON a.lang=b.lang AND a.blk=b.blk
                            AND a.doc_id < b.doc_id
           WHERE levenshtein(a.key, b.key) <= 5 ORDER BY 1, 2"""
    ).df()
    pd.testing.assert_frame_equal(
        got.astype({"id_a": "int64", "id_b": "int64", "dist": "int64"}),
        want.astype({"id_a": "int64", "id_b": "int64", "dist": "int64"}),
    )


def test_merge_upsert_semantics():
    """Update replaces, insert appends, unmatched base survives; within a
    side the highest version wins; updates beat base at equal key."""
    from recon_ray.functions.relational import merge_upsert

    base = pd.DataFrame(
        {"k": [1, 2, 3], "v": ["b1", "b2", "b3"],
         "ver": np.array([1, 1, 1], dtype=np.int64)}
    )
    updates = pd.DataFrame(
        {"k": [2, 2, 4], "v": ["u2a", "u2b", "u4"],
         "ver": np.array([5, 9, 1], dtype=np.int64)}
    )
    got = (
        merge_upsert(
            rd.from_pandas(base).repartition(2),
            rd.from_pandas(updates).repartition(2),
            key="k", version_col="ver",
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["k"].tolist() == [1, 2, 3, 4]
    assert got["v"].tolist() == ["b1", "u2b", "b3", "u4"]


def test_window_ntile_percent_rank_vs_duckdb(lineitem, con):
    from recon_ray.functions.relational import window_over

    w = window_over(
        lineitem.select_columns(
            ["l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"]
        ),
        "l_returnflag",
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        [("ntile", "3", "tile"), ("percent_rank", None, "pr")],
    ).to_pandas().sort_values(
        ["l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"]
    ).reset_index(drop=True)
    want = con.execute(
        """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
                  ntile(3) OVER w AS tile, percent_rank() OVER w AS pr
           FROM lineitem
           WINDOW w AS (PARTITION BY l_returnflag
                        ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           ORDER BY l_returnflag, l_extendedprice, l_orderkey, l_linenumber"""
    ).df()
    assert w["tile"].astype("int64").tolist() == want["tile"].astype("int64").tolist()
    np.testing.assert_allclose(w["pr"].to_numpy(), want["pr"].to_numpy(),
                               atol=1e-12)


def test_dictionary_tag_pinned():
    from recon_ray.functions.text import dictionary_tag

    df = pd.DataFrame(
        {"doc_id": np.array([0, 1], dtype=np.int64),
         "text": ["aaa data data", "no hits here except data"]}
    )
    got = (
        dictionary_tag(rd.from_pandas(df).repartition(2),
                       ["aa", "data", "zzz"])
        .to_pandas().sort_values(["doc_id", "keyword"])
        .reset_index(drop=True)
    )
    # "aa" in "aaa" counts non-overlapping → 1
    assert list(map(tuple, got.itertuples(index=False))) == [
        (0, "aa", 1), (0, "data", 2), (1, "data", 1),
    ]


def test_grouped_hll_vs_exact(events):
    """Per-group HLL estimates within 5% of exact distinct per group
    (p=12 → σ≈1.6%), deterministic across layouts; matches the global
    hll_distinct when there is one group."""
    from recon_ray.functions.sketches import grouped_hll_distinct, hll_distinct

    got = (
        grouped_hll_distinct(events, "event_type", "user_id", p=12)
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    pdf = events.to_pandas()
    exact = pdf.groupby("event_type")["user_id"].nunique()
    assert len(got) == len(exact)
    for _, row in got.iterrows():
        e = exact[row["event_type"]]
        assert abs(row["estimate"] - e) / e < 0.05
    again = (
        grouped_hll_distinct(events.repartition(11), "event_type",
                             "user_id", p=12)
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)
    one = events.map_batches(
        lambda b: b.assign(g="all"), batch_format="pandas"
    )
    g1 = grouped_hll_distinct(one, "g", "user_id", p=12).to_pandas()
    glob = hll_distinct(events, "user_id", p=12)["estimate"]
    np.testing.assert_allclose(g1["estimate"].iloc[0], glob)


def test_grouped_topk_boundary_ties(con):
    """grouped_topk boundary: ties at the k-th slot resolve by the
    deterministic tie column identically to the SQL window, across
    layouts."""
    from recon_ray.functions.relational import grouped_topk

    df = pd.DataFrame(
        {"g": [0, 0, 0, 0, 1, 1, 1],
         "v": [5.0, 5.0, 5.0, 1.0, 2.0, 2.0, 2.0],
         "id": np.arange(7, dtype=np.int64)}
    )
    for parts in (1, 5):
        got = (
            grouped_topk(rd.from_pandas(df).repartition(parts), "g", "v",
                         k=2, ascending=False, tie_cols=["id"])
            .to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
        )
        assert got["id"].tolist() == [0, 1, 4, 5]


def test_explode_list_nulls_empties_positions():
    """explode_list: null and empty lists emit no rows; positions restart
    per parent and survive both — the offset-skew case raw offset
    arithmetic gets wrong."""
    import pyarrow as pa
    from recon_ray.functions.relational import explode_list

    t = pa.table(
        {"id": [1, 2, 3, 4, 5],
         "v": pa.array([[10, 11], [], None, [12], [13, 14, 15]],
                       type=pa.list_(pa.int64()))}
    )
    for parts in (1, 3):
        out = (
            explode_list(rd.from_arrow(t).repartition(parts), "v",
                         value_name="x", pos_name="pos")
            .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True)
        )
        assert out["id"].tolist() == [1, 1, 4, 5, 5, 5]
        assert out["x"].tolist() == [10, 11, 12, 13, 14, 15]
        assert out["pos"].tolist() == [0, 1, 0, 0, 1, 2]


def test_group_concat_layout_invariant():
    """group_concat: same joined string under any partitioning; distinct
    collapses repeats before the shuffle without changing the result."""
    from recon_ray.functions.relational import group_concat

    df = pd.DataFrame(
        {"g": ["a", "a", "b", "a", "b", "a"],
         "v": ["z", "x", "q", "x", "q", "y"]}
    )
    want = {"a": "x,x,y,z", "b": "q,q"}
    want_d = {"a": "x,y,z", "b": "q"}
    for parts in (1, 4):
        ds = rd.from_pandas(df).repartition(parts)
        got = group_concat(ds, "g", "v").to_pandas()
        assert dict(zip(got["g"], got["concat"])) == want
        got_d = group_concat(ds, "g", "v", distinct=True).to_pandas()
        assert dict(zip(got_d["g"], got_d["concat"])) == want_d


def test_window_cume_dist_first_last_partition_sum():
    """cume_dist ties get the tie run's LAST row_number / n; first/last
    value use the whole-partition frame; partition_sum ignores order."""
    from recon_ray.functions.relational import window_over

    df = pd.DataFrame(
        {"g": [0, 0, 0, 0, 1, 1],
         "k": [5, 5, 7, 9, 1, 1],
         "v": [10, 20, 30, 40, 50, 60],
         "id": np.arange(6, dtype=np.int64)}
    )
    for parts in (1, 3):
        got = (
            window_over(
                rd.from_pandas(df).repartition(parts), "g", ["k"],
                [("cume_dist", None, "cd"),
                 ("partition_sum", "v", "tot")],
            )
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        assert got["cd"].tolist() == [0.5, 0.5, 0.75, 1.0, 1.0, 1.0]
        assert got["tot"].tolist() == [100, 100, 100, 100, 110, 110]
        got2 = (
            window_over(
                rd.from_pandas(df).repartition(parts), "g", ["k", "id"],
                [("first_value", "v", "fv"), ("last_value", "v", "lv")],
            )
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        assert got2["fv"].tolist() == [10, 10, 10, 10, 50, 50]
        assert got2["lv"].tolist() == [40, 40, 40, 40, 60, 60]


def test_grouped_variance_and_corr_exact():
    """Moment-form variance/corr: matches numpy exactly (same float ops),
    layout-invariant, NaN for n==1 (var) and constant columns (corr)."""
    from recon_ray.functions.relational import grouped_corr, grouped_variance

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {"g": rng.randint(0, 3, 60),
         "x": rng.randint(-1000, 1000, 60).astype("int64"),
         "y": rng.randint(0, 24, 60).astype("int64")}
    )
    df = pd.concat(
        [df, pd.DataFrame({"g": [9, 8, 8], "x": [5, 3, 7], "y": [2, 2, 2]})],
        ignore_index=True,
    )
    for parts in (1, 5):
        ds = rd.from_pandas(df).repartition(parts)
        v = grouped_variance(ds, "g", "x").set_index("g")
        c = grouped_corr(ds, "g", "x", "y").set_index("g")
        for g, sub in df.groupby("g"):
            x = sub["x"].to_numpy()
            n = len(x)
            if n > 1:
                num = n * int(np.dot(x, x)) - int(x.sum()) ** 2
                want = float(num) / float(n * (n - 1))
                assert v.loc[g, "var"] == want
                assert v.loc[g, "std"] == np.sqrt(want)
            else:
                assert np.isnan(v.loc[g, "var"])
        assert np.isnan(c.loc[9, "corr"])   # n == 1
        assert np.isnan(c.loc[8, "corr"])   # y constant
        got = c.loc[0, "corr"]
        ref = np.corrcoef(
            df.loc[df.g == 0, "x"], df.loc[df.g == 0, "y"]
        )[0, 1]
        assert abs(got - ref) < 1e-12


def test_chunk_texts_boundaries():
    """chunk_texts: exact window starts (0, stride, ...), short final
    chunk, min_chars gate, unicode lengths counted in codepoints, layout
    invariant."""
    from recon_ray.functions.text import chunk_texts

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3],
         "text": ["abcdefghij",        # 10 chars → starts 0,4,8
                  "xy",                # dropped by min_chars=3
                  "áéíóú" * 2]}        # 10 codepoints
    )
    for parts in (1, 3):
        got = (
            chunk_texts(rd.from_pandas(df).repartition(parts),
                        size=5, stride=4, min_chars=3)
            .to_pandas().sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        assert got[got.doc_id == 1]["chunk"].tolist() == [
            "abcde", "efghi", "ij"
        ]
        assert 2 not in set(got["doc_id"])
        u = "áéíóú" * 2
        assert got[got.doc_id == 3]["chunk"].tolist() == [
            u[0:5], u[4:9], u[8:10]
        ]


def test_arrow_filter_preserves_schema_into_join():
    """Regression: Dataset.filter(expr=...) emits zero-column empty
    blocks which crash the hash-join aggregator ("No match for FieldRef
    ... on left side"); arrow_filter keeps the schema, so a tiny/sparse
    input (empty blocks guaranteed) joins fine."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    from recon_ray.functions.relational import arrow_filter, shuffle_join

    left = rd.from_pandas(
        pd.DataFrame({"k": ["a", "b", "c"], "x": [1, 2, 3]})
    ).repartition(5)
    left = arrow_filter(left, lambda t: pc.greater(t.column("x"), 1))
    right = rd.from_pandas(pd.DataFrame({"k": ["b", "c"], "y": [20, 30]}))
    out = shuffle_join(left, right, on="k").to_pandas()
    assert sorted(map(tuple, out[["k", "x", "y"]].itertuples(index=False))) \
        == [("b", 2, 20), ("c", 3, 30)]


def test_assign_split_stable_under_growth():
    """Holdout contract: fractions roughly hold, every row is labeled,
    and a doc's split NEVER changes when the corpus grows (pure function
    of the id)."""
    import pandas as pd
    import ray.data as rd

    from recon_ray.functions.insights import assign_split

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = pd.DataFrame({"doc_id": range(2000)})
    big = pd.DataFrame({"doc_id": range(6000)})
    a = assign_split(rd.from_pandas(small).repartition(4), fr).to_pandas()
    b = assign_split(rd.from_pandas(big).repartition(7), fr).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert list(a["split"]) == list(b["split"][:2000])
    share = a["split"].value_counts(normalize=True)
    assert abs(share["train"] - 0.8) < 0.05
    assert abs(share["val"] - 0.1) < 0.03
    assert abs(share["test"] - 0.1) < 0.03
    assert set(b["split"]) == {"train", "val", "test"}


def test_knn_int8_recall(emb):
    """kNN over the int8-quantized corpus: recall@5 vs the exact float
    search stays >= 0.9 (quantization error is bounded by scale/2 per
    element)."""
    from recon_ray.functions.similarity import (knn_bruteforce, knn_int8,
                                                knn_recall)

    # deterministic queries: first 4 corpus vectors
    rows = emb.take(4)
    queries = np.stack([np.asarray(r["embedding"]) for r in rows])
    exact = knn_bruteforce(emb, queries, k=5)
    approx = knn_int8(emb, queries, k=5)
    assert knn_recall(approx, exact) >= 0.9
    # the self-match (rank 1, cosine 1.0) survives quantization
    assert (approx[approx["rank"] == 1]["cosine"] > 0.999).all()


def test_knn_int8_rerank_equals_exact(emb):
    """Two-stage retrieval: quantized scan keeping k*3 candidates + exact
    float rerank returns EXACTLY the exact search's top-k."""
    import pandas as pd

    from recon_ray.functions.similarity import knn_bruteforce, knn_int8

    rows = emb.take(4)
    queries = np.stack([np.asarray(r["embedding"]) for r in rows])
    exact = knn_bruteforce(emb, queries, k=5)
    two_stage = knn_int8(emb, queries, k=5, rerank_factor=3)
    pd.testing.assert_frame_equal(
        two_stage.reset_index(drop=True), exact.reset_index(drop=True)
    )


def test_compression_signals_deterministic_and_ordering():
    """zlib-6 ratios are run-deterministic; pasted boilerplate compresses
    far better than random text; decode damage counts exactly."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from recon_ray.functions.text import compression_signals

    rng = np.random.RandomState(0)
    random_text = " ".join(
        "".join(chr(rng.randint(97, 123)) for _ in range(8))
        for _ in range(200)
    )
    boiler = "copy paste boilerplate line\n" * 200
    damaged = "ok text \x01\x02 with breakage ��"
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": [random_text, boiler, damaged]})
    t = pa.table(df)
    a = compression_signals(t).to_pandas()
    b = (
        rd.from_pandas(df).repartition(2)
        .map_batches(compression_signals, batch_format="pyarrow")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)  # layout-invariant
    byid = a.set_index("doc_id")
    assert byid.loc[1, "compress_ppm"] < byid.loc[0, "compress_ppm"] // 10
    assert byid.loc[2, "replacement_ppm"] > 0
    assert byid.loc[2, "nonprint_ppm"] > 0
    assert byid.loc[0, "nonprint_ppm"] == 0


def test_ivf_index_persistence_round_trip(tmp_path, ray_session):
    """build_ivf_index → save → load → knn_ivf(centroids=loaded) must
    equal a fresh same-seed run (the build-once/probe-many contract)."""
    import numpy as np
    import ray.data as rd

    from recon_ray.functions.similarity import (
        build_ivf_index, knn_ivf, load_ivf_index, save_ivf_index,
    )

    rng = np.random.RandomState(11)
    emb = rng.randn(300, 16)
    ds = rd.from_items([
        {"vec_id": i, "embedding": emb[i].tolist()} for i in range(300)
    ])
    q = rng.randn(3, 16)

    fresh = knn_ivf(ds, q, k=5, n_cells=8, nprobe=3, sample_size=128,
                    seed=7)
    idx = build_ivf_index(ds, n_cells=8, sample_size=128, seed=7)
    p = str(tmp_path / "ivf.parquet")
    save_ivf_index(idx, p)
    loaded = load_ivf_index(p)
    assert np.allclose(idx, loaded)
    again = knn_ivf(ds, q, k=5, n_cells=8, nprobe=3, sample_size=128,
                    seed=7, centroids=loaded)
    pd.testing.assert_frame_equal(fresh, again)


# ---------------------------------------------------------------------------
# chunk_documents: overlapping token windows
# ---------------------------------------------------------------------------


def _ref_chunks(text, size, stride):
    import re as _re

    toks = [t for t in _re.split(r"[ \t\n\r\f\v]+", text) if t]
    T = len(toks)
    if T == 0:
        return []
    C = 1 if T <= size else -(-(T - size) // stride) + 1
    return [(" ".join(toks[c * stride: c * stride + size]),
             len(toks[c * stride: c * stride + size]))
            for c in range(C)]


def test_chunk_documents_matches_reference(ray_session):
    import ray.data as rd

    from recon_ray.functions.text import chunk_documents

    rng = np.random.default_rng(11)
    texts = []
    for i in range(60):
        n = int(rng.integers(0, 40))
        texts.append(" ".join(
            f"w{int(rng.integers(0, 99))}" for _ in range(n)))
    texts += ["", "   ", "one", "a\tb\nc  d\r\fe"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    for size, stride in [(8, 8), (8, 5), (4, 1), (16, 3)]:
        out = (chunk_documents(
            rd.from_pandas(df).repartition(3), size=size, stride=stride)
            .to_pandas().sort_values(["doc_id", "chunk_idx"]))
        got = {}
        for _, r in out.iterrows():
            got.setdefault(int(r["doc_id"]), []).append(
                (r["chunk_text"], int(r["n_tokens"])))
        for i, t in enumerate(texts):
            assert got.get(i, []) == _ref_chunks(t, size, stride), \
                (size, stride, i, t)
        # chunk_idx is dense 0..C-1 per doc
        for i, ch in got.items():
            assert list(out[out.doc_id == i]["chunk_idx"]) == list(
                range(len(ch)))


def test_chunk_documents_rejects_bad_params(ray_session):
    import ray.data as rd

    from recon_ray.functions.text import chunk_documents

    df = pd.DataFrame({"doc_id": [1], "text": ["a b"]})
    with pytest.raises(ValueError):
        chunk_documents(rd.from_pandas(df), size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(rd.from_pandas(df), size=4, stride=0)
