"""V2G / UMLS / GVD / GLOF / disease→gene / QA-quota / journal-norm shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubmedkb_web_spark.query import kbqueries as K


def test_v2g_first_gene_semantics(spark):
    vl = spark.createDataFrame(
        [
            ("hgvs", "p.V600E", "gene_name", "BRAF", 50),
            ("hgvs", "p.V600E", "gene_name", "OTHER", 10),
            ("hgvs", "p.V600E", "rs", "rs113488022", 40),
        ],
        "kind1 string, key1 string, kind2 string, key2 string, freq long",
    )
    out = K.v2g_translate(vl, "hgvs", "p.V600E", "gene_name").collect()
    assert [r["key2"] for r in sorted(out, key=lambda r: r["rank"])] == ["BRAF", "OTHER"]


def test_umls_expand(spark):
    umls = spark.createDataFrame([("C1", "Neoplasm"), ("C2", "Other")], "cui string, preferred_name string")
    names = spark.createDataFrame(
        [("C1", "Tumor", "tumor"), ("C1", "Neoplasm", "neoplasm"), ("C2", "tumor x", "tumor x")],
        "cui string, name string, name_lower string",
    )
    codes = spark.createDataFrame([("C1", "MSH", "D009369")], "cui string, source string, code string")
    out = K.umls_expand(umls, names, "TUMOR").collect()
    assert [r["preferred_name"] for r in out] == ["Neoplasm"]
    coded = K.umls_expand(umls, names, "Tumor", "MSH", codes).collect()
    assert coded[0]["code"] == "D009369"


def test_cross_product_lookup(spark):
    main = spark.createDataFrame(
        [("c1", "d1", 3), ("c1", "d2", 4), ("c9", "d1", 5)], "c string, d string, n int"
    )
    out = K.cross_product_lookup(main, ["c1", "c2"], ["d1", "d2"]).collect()
    assert {(r["c"], r["d"]) for r in out} == {("c1", "d1"), ("c1", "d2")}


def test_disease_to_gene_blend(spark):
    db = spark.createDataFrame(
        [("d1", "g1", 60.0), ("d1", "g1", 80.0), ("d2", "g1", 10.0)],
        "disease string, gene string, score double",
    )
    pk = spark.createDataFrame(
        [("d1", "g1", 5000.0), ("d3", "g2", 20000.0)],
        "disease string, gene string, score double",
    )
    rows = {(r["disease"], r["gene"]): r for r in K.disease_to_gene_scores(db, pk).collect()}
    # hand-computed reference trace (kb_utils.py:1983-1990):
    # d1/g1: db=140>0 → binarize to 100; pk=5000 → 100*5000/10000=50 → 150
    assert rows[("d1", "g1")]["pair_score"] == 150.0
    # d2/g1: db=10>0 → 100 (reference binarizes, NOT min(db,100)); pk absent → 100
    assert rows[("d2", "g1")]["pair_score"] == 100.0
    # pk-only key d3/g2 survives the full-outer union; pk term is UNCAPPED:
    # db 0 + 100*20000/10000 = 200 (reference never clamps pk, kb_utils.py:1987)
    assert rows[("d3", "g2")]["pair_score"] == 200.0
    assert rows[("d2", "g1")]["gene_score"] == 150.0  # max over diseases per gene


def test_gvd_pivot(spark):
    ps = spark.createDataFrame(
        [("a", "b", "odds_ratio", 3, 1.0), ("a", "b", "spacy_ore", 2, 1.0), ("x", "y", "rbert_cre", 1, 1.0)],
        "subj string, obj string, annotator string, support long, score_sum double",
    )
    out = {(r["subj"], r["obj"]): r for r in K.gvd_pivot(ps, ["odds_ratio", "rbert_cre", "spacy_ore"]).collect()}
    assert out[("a", "b")]["odds_ratio"] == 3 and out[("a", "b")]["spacy_ore"] == 2
    assert out[("a", "b")]["rbert_cre"] == 0
    assert out[("x", "y")]["rbert_cre"] == 1


def test_journal_impact_acceptance_and_join(spark):
    """Hand trace of kb_utils.py:1812-1815 + the meta enrichment join."""
    from pubmedkb_web_spark import fixtures

    imp = K.journal_impact_map(fixtures.journal_impact_table(spark))
    accepted = {r["journal"]: r["journal_impact"] for r in imp.collect()}
    assert "journal and rev 0" not in accepted       # 50%, no substring
    assert accepted["journal and rev 3"] == "0.300"  # 65% but substring
    assert accepted["journal and rev 1"] == "0.100"  # 85%

    meta = spark.createDataFrame(
        [("d1", "Journal & Rev. 1"), ("d2", "Journal & Rev. 0"), ("d3", "Unknown J.")],
        "doc_id string, journal string",
    )
    out = {r["doc_id"]: r["journal_impact"] for r in K.enrich_meta_with_impact(meta, imp).collect()}
    assert out["d1"] == "0.100"   # normalization 'Journal & Rev. 1' → key
    assert out["d2"] is None      # journal exists but was rejected
    assert out["d3"] is None      # journal absent from the map


def test_glof_rollup(spark):
    g = spark.createDataFrame(
        [("Gene", "braf", "gof", "p1", 0), ("Gene", "braf", "gof", "p1", 1),
         ("Gene", "braf", "gof", "p2", 0), ("Gene", "braf", "lof", "p3", 0)],
        "type string, key string, direction string, doc_id string, sent_idx int",
    )
    out = K.glof_rollup(g).collect()
    gof = sorted((r for r in out if r["direction"] == "gof"), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in gof] == ["p1", "p2"]  # p1 has 2 sentences
    assert gof[0]["n_sents"] == 2 and gof[0]["sent_idxs"] == [0, 1]


def test_early_stop_quota(spark):
    rows = [(f"d{i}", i + 1, 10) for i in range(20)]  # 10 triplets per doc
    ranked = spark.createDataFrame(rows, "doc_id string, rank int, n_triplets int")
    out = K.early_stop_quota(ranked, min_docs=3, min_triplets=25).collect()
    # after row 3 the cumulative counts are (3 docs, 30 triplets) — both
    # quotas met, so the scan stops there (reference take-while semantics)
    assert sorted(r["rank"] for r in out) == [1, 2, 3]
    out2 = K.early_stop_quota(ranked, min_docs=10, min_triplets=30).collect()
    assert len(out2) == 10  # doc quota dominates


def test_normalize_journal(spark):
    df = spark.createDataFrame(
        [("The Ｊournal & Review: of-Tests!!",), ("  plain  name ",)], "j string"
    )
    out = [r["n"] for r in df.select(K.normalize_journal(F.col("j")).alias("n")).collect()]
    assert out[0] == "the journal and review of tests"
    assert out[1] == "plain name"


def test_mesh_canon_and_variant_split(spark):
    df = spark.createDataFrame([("D009369", "673_rs113488022")], "m string, v string")
    row = df.select(
        K.mesh_canon(F.col("m")).alias("m2"), K.split_variant_id(F.col("v")).alias("s")
    ).collect()[0]
    assert row["m2"] == "MESH:D009369"
    assert row["s"]["gene_id"] == "673" and row["s"]["variant_id"] == "rs113488022"
    # underscore-bearing HGVS ids split at the FIRST underscore, like the
    # reference's find("_") (server.py:1721-1723) — hand-computed trace:
    # "673_HGVS:p.Lys23_Val25del" → ("673", "HGVS:p.Lys23_Val25del")
    df_hgvs = spark.createDataFrame(
        [("673_HGVS:p.Lys23_Val25del",), ("12_RS#:556",)], "v string"
    )
    got = {
        (r["s"]["gene_id"], r["s"]["variant_id"])
        for r in df_hgvs.select(K.split_variant_id(F.col("v")).alias("s")).collect()
    }
    assert got == {("673", "HGVS:p.Lys23_Val25del"), ("12", "RS#:556")}
    df2 = spark.createDataFrame([("MESH:D1",)], "m string")
    assert df2.select(K.mesh_canon(F.col("m")).alias("x")).collect()[0]["x"] == "MESH:D1"
