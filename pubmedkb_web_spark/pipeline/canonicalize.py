"""M3 — entity canonicalization via connected components.

The reference never canonicalizes — every query carries raw (type, id/name)
keys and the umbrella VARIANT expansion (kb_utils.py:58-67) papers over id
aliasing at query time. At KG scale we resolve aliases once at build time:
ids that share a surface form are one entity; the component representative
(lexicographic min id) becomes the canonical id.

Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond" — public) degenerates to
min-label propagation for our shallow alias graphs; we implement min-label
propagation with convergence detection and per-iteration localCheckpoint to
cut lineage (without it the plan doubles every iteration and the optimizer
chokes — the classic iterative-join pitfall).

Scale: each iteration is one shuffle on the node key. Alias graphs have
tiny diameter (names ↔ ids), so 3-5 iterations; the iteration cap bounds
worst-case. GraphFrames would do the same thing but is not in the image —
this version is dependency-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 12


def alias_edges(entity_dict: DataFrame) -> DataFrame:
    """Undirected edges between ids sharing a lowercased surface form."""
    n = entity_dict.select(
        F.lower(F.col("name")).alias("nm"), F.col("id").alias("id")
    ).distinct()
    a = n.select("nm", F.col("id").alias("src"))
    b = n.select("nm", F.col("id").alias("dst"))
    e = (
        a.join(b, "nm")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return e


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = MAX_ITERATIONS
) -> DataFrame:
    """nodes(id) + edges(src,dst) → canonical_map(id, canonical_id).

    Min-label propagation: label(v) ← min(label(v), min over neighbors).
    Converged when no label changes. Deterministic: min is order-free.
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = nodes.select(F.col("id").alias("node"), F.col("id").alias("label"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (
                    F.col("nbr_label").isNotNull()
                    & (F.col("nbr_label") < F.col("label"))
                ).alias("changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        n_changed = new_labels.filter("changed").count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    return labels.select(F.col("node").alias("id"), F.col("label").alias("canonical_id"))


def canonical_map(entity_dict: DataFrame) -> DataFrame:
    nodes = entity_dict.select("id").distinct()
    return connected_components(nodes, alias_edges(entity_dict))


def rewrite_triples(triples: DataFrame, canon: DataFrame) -> DataFrame:
    """Rewrite subj/obj to canonical ids (broadcast: the map is dictionary-
    sized, ≤ millions of rows ≪ triple count)."""
    cs = F.broadcast(canon.select(F.col("id").alias("subj"), F.col("canonical_id").alias("subj_canon")))
    co = F.broadcast(canon.select(F.col("id").alias("obj"), F.col("canonical_id").alias("obj_canon")))
    return (
        triples.join(cs, "subj", "left")
        .join(co, "obj", "left")
        .select(
            F.coalesce("subj_canon", "subj").alias("subj"),
            "pred",
            F.coalesce("obj_canon", "obj").alias("obj"),
            "annotator",
            "score",
            "doc_id",
            "sent_idx",
            "content_sha256",
        )
    )
