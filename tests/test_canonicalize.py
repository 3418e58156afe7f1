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


def test_chain_converges_in_log_rounds(spark):
    """Large-star/small-star bound (round-3 VERDICT #6): a 1024-node path
    graph — the worst case for the min-label propagation this replaced,
    which needs O(n) rounds — must converge in O(log n) alternation rounds
    and still produce the exact min-labelled components."""
    n = 1024
    ids = [f"n{i:05d}" for i in range(n)]
    nodes = spark.createDataFrame([(x,) for x in ids], "id string")
    edges = spark.createDataFrame(
        list(zip(ids, ids[1:])), "src string, dst string"
    )
    got = {r["id"]: r["canonical_id"] for r in C.connected_components(nodes, edges).collect()}
    assert got == {x: ids[0] for x in ids}
    # ⌈log2(1024)⌉ = 10; alternation contracts at least geometrically —
    # allow a small constant slack over the ideal
    assert C.LAST_ROUNDS <= 14, C.LAST_ROUNDS


def test_components_partition_invariant(spark):
    """Result must be independent of input partitioning (determinism that
    checkpoint-resume relies on)."""
    edges = [(f"a{i}", f"a{i+1}") for i in range(50)] + [("z1", "z2"), ("z2", "z3")]
    ids = sorted({x for e in edges for x in e})
    nodes = spark.createDataFrame([(x,) for x in ids], "id string")
    e1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    e32 = spark.createDataFrame(edges[::-1], "src string, dst string").repartition(32)
    r1 = sorted(map(tuple, C.connected_components(nodes, e1).collect()))
    r32 = sorted(map(tuple, C.connected_components(nodes, e32).collect()))
    assert r1 == r32
    assert dict(r1)["a50"] == "a0" and dict(r1)["z3"] == "z1"


def test_nonconvergence_raises(spark):
    """Round-4 ADVICE: exhausting max_iter without the edge-set fixpoint
    must raise — the map below could carry conflicting canonical_ids per
    node (silent corruption feeding dedup/rewrite)."""
    import pytest

    n = 64
    ids = [f"n{i:03d}" for i in range(n)]
    nodes = spark.createDataFrame([(x,) for x in ids], "id string")
    edges = spark.createDataFrame(list(zip(ids, ids[1:])), "src string, dst string")
    with pytest.raises(RuntimeError, match="fixpoint"):
        C.connected_components(nodes, edges, max_iter=1)
