"""Graph queries: MeSH subgraph BFS, chem–disease retrieval, CGD 2-hop.

- MeSH ontology traversal (/query_mesh_disease subgraph BFS,
  /root/reference/server.py:2369-2467 over the node rows of
  kb_utils.py:2196-2252): iterative frontier-expansion self-joins on the
  edge table, depth-bounded, visited-set anti-join per level.
- chem_disease three access paths (by pair / by c / by d,
  server.py:2892-2908): one table, three filter shapes (SURVEY.md J11).
- CGD 2-hop drug discovery (kb_utils.py:2862-2909): the paths table is
  materialized at build (materialize.build_cgd_paths); query = filter +
  top-k (SURVEY.md J10/T2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_subgraph(
    edges: DataFrame, roots: list[str], max_depth: int = 3, direction: str = "out"
) -> DataFrame:
    """(node, depth) reachable from roots within max_depth.

    Per level: frontier ⋈ edges → next frontier, minus visited (left_anti).
    localCheckpoint per level cuts the growing lineage. Depth is the
    *minimum* distance (first time a node is reached wins).
    """
    spark = edges.sparkSession
    src, dst = ("src", "dst") if direction == "out" else ("dst", "src")
    visited = spark.createDataFrame(
        [(r, 0) for r in roots], "node string, depth int"
    ).localCheckpoint(eager=True)
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges[src])
            .select(edges[dst].alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(depth))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def chem_disease_lookup(
    chem_disease: DataFrame,
    c: str | None = None,
    d: str | None = None,
    level: str = "paper",
) -> DataFrame:
    """Evidence counts for (c, d) / by chemical / by disease — the three
    access paths are the same relation with different pushdown filters."""
    df = chem_disease.filter(F.col("level") == level)
    if c is not None:
        df = df.filter(F.col("c") == c)
    if d is not None:
        df = df.filter(F.col("d") == d)
    return df.groupBy("c", "d").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.array_sort(F.collect_set("doc_id")).alias("doc_ids"),
    )


def cgd_drug_discovery(
    cgd_paths: DataFrame, d: str, top_k: int = 10
) -> DataFrame:
    """Chemicals 2 hops from a disease, ranked by summed path score
    (kb_utils.py:2862-2909): per chemical, total score over gene paths +
    the per-gene breakdown, top-k (adaptive heap in the reference →
    TakeOrderedAndProject here, SURVEY.md T2)."""
    paths = cgd_paths.filter(F.col("d") == d)
    per_chem = paths.groupBy("c").agg(
        F.round(F.sum("cgd_score"), 6).alias("cd_score"),
        F.array_sort(
            F.collect_list(F.struct((-F.col("cgd_score")).alias("ns"), "g", "cgd_score"))
        ).alias("_genes"),
    )
    return (
        per_chem.select(
            "c",
            "cd_score",
            F.transform("_genes", lambda s: s["g"]).alias("genes"),
            F.transform("_genes", lambda s: s["cgd_score"]).alias("gene_scores"),
        )
        .orderBy(F.col("cd_score").desc(), F.col("c").asc())
        .limit(top_k)
    )
