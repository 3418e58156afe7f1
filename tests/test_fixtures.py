"""Fixture determinism + invariant properties (SURVEY.md §5 item 4)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pubmedkb_web_spark import fixtures


def test_gen_doc_pure_function():
    a = fixtures.gen_doc(42, 7)
    b = fixtures.gen_doc(42, 7)
    c = fixtures.gen_doc(43, 7)
    assert a == b
    assert a != c


def test_source_table_partition_invariant(spark):
    one = fixtures.source_table(spark, 30).repartition(1).orderBy("path").collect()
    many = fixtures.source_table(spark, 30).repartition(7).orderBy("path").collect()
    assert one == many


def test_ingest_sha256_matches_python(spark):
    rows = fixtures.ingest(fixtures.source_table(spark, 10)).collect()
    for r in rows:
        assert r["content_sha256"] == hashlib.sha256(r["content"].encode()).hexdigest()
        assert len(r["doc_id"]) == 16


def test_entity_dict_has_skew_and_golden_ids(spark):
    ed = fixtures.build_entity_dict()
    ids = set(ed["id"])
    assert fixtures.GOLDEN_SNP_ID in ids
    assert fixtures.GOLDEN_DISEASE_ID in ids
    assert fixtures.GOLDEN_HGVS_ID in ids
    freqs = sorted(ed["freq"], reverse=True)
    import statistics

    assert freqs[0] >= 100 * statistics.median(freqs)  # hot-entity skew present


def test_hot_entity_dominates_corpus(spark):
    src = fixtures.ingest(fixtures.source_table(spark, 200))
    n_braf = src.filter(F.col("content").contains("braf")).count()
    n_other = src.filter(F.col("content").contains("gene7 ")).count()
    assert n_braf > 5 * max(n_other, 1)
