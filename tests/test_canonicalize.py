"""M3 connected components + triple rewrite."""

from __future__ import annotations

from pubmedkb_web_spark.pipeline import canonicalize as C


def test_connected_components_known_graph(spark):
    nodes = spark.createDataFrame([(x,) for x in "abcdefg"], "id string")
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f")], "src string, dst string"
    )
    got = {r["id"]: r["canonical_id"] for r in C.connected_components(nodes, edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "f", "g": "g"}


def test_alias_edges_merge_shared_names(spark):
    ed = spark.createDataFrame(
        [
            ("Gene", "G1", "braf", 10),
            ("Gene", "G2", "BRAF", 5),   # same lowercase surface → same entity
            ("Gene", "G3", "kras", 5),
        ],
        "type string, id string, name string, freq long",
    )
    canon = {r["id"]: r["canonical_id"] for r in C.canonical_map(ed).collect()}
    assert canon["G1"] == canon["G2"] == "G1"
    assert canon["G3"] == "G3"


def test_rewrite_triples(spark):
    canon = spark.createDataFrame([("B", "A"), ("A", "A")], "id string, canonical_id string")
    triples = spark.createDataFrame(
        [("B", "p", "C", "x", 1.0, "d1", 0, "h")],
        "subj string, pred string, obj string, annotator string, score double, "
        "doc_id string, sent_idx int, content_sha256 string",
    )
    out = C.rewrite_triples(triples, canon).collect()[0]
    assert out["subj"] == "A"
    assert out["obj"] == "C"  # unknown id passes through
