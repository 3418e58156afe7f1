"""Retrieval fusion: BM25-as-join, RRF, cosine re-rank chain."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pubmedkb_web_spark.query import retrieval as R


def _corpus(spark):
    rows = [
        ("d1", "spark join spark window"),
        ("d2", "join merge sort"),
        ("d3", "spark spark spark spark"),
        ("d4", "totally unrelated words here"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_bm25_formula(spark):
    corpus = _corpus(spark)
    tp = R.build_term_postings(corpus)
    n, avgdl = 4, (4 + 3 + 4 + 4) / 4
    got = {r["doc_id"]: r["bm25"] for r in R.bm25_score(tp, ["spark"], n, avgdl).collect()}
    assert set(got) == {"d1", "d3"}

    def bm25(tf, dl):
        idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))
        return idf * tf * 2.5 / (tf + 1.5 * (1 - 0.75 + 0.75 * dl / avgdl))

    assert abs(got["d1"] - round(bm25(2, 4), 6)) < 1e-9
    assert abs(got["d3"] - round(bm25(4, 4), 6)) < 1e-9
    assert got["d3"] > got["d1"]


def test_rrf_fusion(spark):
    a = spark.createDataFrame([("d1", 1), ("d2", 2)], "doc_id string, rank int")
    b = spark.createDataFrame([("d2", 1), ("d3", 2)], "doc_id string, rank int")
    got = {r["doc_id"]: r["rrf"] for r in R.rrf_fuse(a, b).collect()}
    assert abs(got["d2"] - round(1 / 63 + 1 / 62, 8)) < 1e-9
    assert abs(got["d1"] - round(1 / 62, 8)) < 1e-9
    assert abs(got["d3"] - round(1 / 63, 8)) < 1e-9
    assert max(got, key=got.get) == "d2"


def test_rank_by_tiebreak(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("c", 1.0)], "doc_id string, s double"
    )
    ranks = {r["doc_id"]: r["rank"] for r in R.rank_by(df, "s").collect()}
    assert ranks == {"a": 1, "b": 2, "c": 3}


def test_qa_target_filter_hand_trace(spark):
    """kb_utils.py:2456-2483 incl. the gene-prefix fallback and its
    no-underscore slice quirk (v2[:v2.find('_')] drops the last char)."""
    rows = [
        # doc, d_matches, g_matches, v_matches, triplets
        ("p1", ["mesh:d1"], ["g1"], [], ["t"]),        # gene direct hit
        ("p2", ["mesh:d1"], [], ["g2_v9"], ["t"]),     # gene-prefix fallback
        ("p3", ["mesh:d1"], [], ["rs777"], ["t"]),     # variant direct hit
        ("p4", ["mesh:d1"], [], ["g9_v1"], ["t"]),     # no target match
        ("p5", ["mesh:d2"], ["g1"], [], ["t"]),        # wrong disease
        ("p6", ["mesh:d1"], ["g1"], [], []),           # no triplets
        ("p7", ["mesh:d1"], [], ["g1X"], ["t"]),       # quirk: no '_', 'g1X'[:-1]=='g1'
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, d_name_matches array<string>, g_name_matches array<string>, "
        "v_name_matches array<string>, triplet_list array<string>",
    )
    out = {
        r["doc_id"]
        for r in R.qa_target_filter(
            df, d_set=["mesh:d1"], g_set=["g1", "g2"], v_set=["rs777"]
        ).collect()
    }
    assert out == {"p1", "p2", "p3", "p7"}
    # disease-only query ignores gene/variant columns
    out_d = {r["doc_id"] for r in R.qa_target_filter(df, d_set=["mesh:d2"]).collect()}
    assert out_d == {"p5"}


def test_fetch_paper_text(spark):
    store = spark.createDataFrame(
        [("p1", "T1", "A1"), ("p2", "T2", "A2")],
        "doc_id string, title string, abstract string",
    )
    out = {r["doc_id"]: (r["title"], r["abstract"])
           for r in R.fetch_paper_text(store, ["p1", "p9"]).collect()}
    assert out == {"p1": ("T1", "A1"), "p9": ("", "")}


def test_qa_chain_end_to_end(spark):
    """Full /query_pubmed_qa shape: ranked candidates → target filter →
    early-stop quotas → paper-text fetch (kb_utils.py:2442-2490 + 1188-1211)."""
    from pubmedkb_web_spark.query import kbqueries as K

    cands = spark.createDataFrame(
        [
            (r, f"p{r}", ["mesh:d1"] if r % 2 else [], ["g1"], [], ["t"] * (r % 3 + 1))
            for r in range(1, 41)
        ],
        "rank int, doc_id string, d_name_matches array<string>, "
        "g_name_matches array<string>, v_name_matches array<string>, "
        "triplet_list array<string>",
    )
    filtered = R.qa_target_filter(cands, d_set=["mesh:d1"], g_set=["g1"])
    n_triplets = filtered.withColumn("n_triplets", F.size("triplet_list"))
    stopped = K.early_stop_quota(n_triplets, min_docs=5, min_triplets=8)
    kept = stopped.collect()
    assert 0 < len(kept) < 20  # quota cuts the ranked stream early
    store = spark.createDataFrame(
        [(f"p{r}", f"T{r}", f"A{r}") for r in range(1, 10)],
        "doc_id string, title string, abstract string",
    )
    texts = R.fetch_paper_text(store, stopped.select("doc_id"))
    rows = {r["doc_id"]: r["title"] for r in texts.collect()}
    assert len(rows) == len(kept)
    for r in kept:
        assert r["doc_id"] in rows


def test_retrieval_chain(spark):
    """BM25 → impact-rank RRF → cosine re-rank (the /query_pubmed_qa chain
    shape, SURVEY.md §3.3)."""
    corpus = _corpus(spark)
    tp = R.build_term_postings(corpus)
    bm25 = R.bm25_score(tp, ["spark", "join"], 4, 3.75)
    impact = spark.createDataFrame(
        [("d1", 10.0), ("d2", 5.0), ("d3", 1.0), ("d4", 99.0)], "doc_id string, impact double"
    )
    fused = R.rrf_fuse(R.rank_by(bm25, "bm25"), R.rank_by(impact, "impact"), top_k=3)
    emb = spark.createDataFrame(
        [("d1", [1.0, 0.0]), ("d2", [0.5, 0.5]), ("d3", [0.0, 1.0]), ("d4", [0.9, 0.1])],
        "doc_id string, embedding array<double>",
    )
    cands = fused.select("doc_id").join(emb, "doc_id")
    out = R.cosine_top_k(cands, [1.0, 0.0], top_k=2, id_col="doc_id")
    ids = [r["doc_id"] for r in out.collect()]
    assert len(ids) == 2
    assert ids[0] in {"d1", "d4"}
