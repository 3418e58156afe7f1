"""The /query_rel pipeline (reference lifecycle at SURVEY.md §3.1;
/root/reference/server.py:770-958).

Stages: evaluate spec → relevance/citation/year/impact sort → offset-limit
pagination → hydration joins (page only) → statistics. The summary stage
(summary.py) runs on the collected page — it inspects ≤ one page of rows,
exactly like the reference.

Plan shape matters: the orderBy+limit happens *before* the hydration joins
(lazy hydration, server.py:875-887) so Catalyst plans TakeOrderedAndProject
on the thin hit relation and the wide sentence/annotation joins only touch
the page's documents (broadcast of the paginated doc set).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from . import spec as spec_mod

SORT_KEYS = ("relevance", "citation", "year", "journal_impact")


@dataclass
class RelResult:
    papers: DataFrame      # (doc_id, sort_score, rank) — the page
    relations: DataFrame   # hydrated page annotations + sentences
    statistics: dict       # overall + per-annotator counts


def paper_scores(hits: DataFrame) -> DataFrame:
    """relevance = per-paper sum of annotation scores (server.py:657-659)."""
    return hits.groupBy("doc_id").agg(F.round(F.sum("score"), 6).alias("relevance"))


def sorted_page(
    scores: DataFrame,
    meta: DataFrame | None,
    sort_key: str,
    page_start: int,
    page_end: int,
) -> DataFrame:
    """Sort by the chosen key (non-numeric meta values fall back to 0,
    server.py:846-869), tie-break doc_id desc, slice [start, end)."""
    if sort_key not in SORT_KEYS:
        raise ValueError(f"sort key must be one of {SORT_KEYS}")
    df = scores
    if sort_key == "relevance":
        key = F.col("relevance")
    else:
        assert meta is not None, "meta table required for non-relevance sorts"
        df = df.join(
            meta.select("doc_id", "citation", "year", "journal_impact"),
            "doc_id",
            "left",
        )
        col = {
            "citation": F.col("citation").cast("double"),
            "year": (F.col("year")).try_cast("double"),
            "journal_impact": (F.col("journal_impact")).try_cast("double"),
        }[sort_key]
        key = F.coalesce(col, F.lit(0.0))
    w = W.orderBy(key.desc(), F.col("doc_id").desc())
    return (
        df.withColumn("sort_score", key)
        .withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") > page_start) & (F.col("rank") <= page_end))
        .select("doc_id", "relevance", "sort_score", "rank")
    )


def hydrate(
    page: DataFrame,
    hits: DataFrame,
    annotations: DataFrame,
    sentences: DataFrame,
) -> DataFrame:
    """Fetch full annotation + sentence records for the page only
    (server.py:665-745). The page is ≤ a page of doc_ids → broadcast; CRE
    rows re-sorted by parsed percent confidence happens at render
    (server.py:729-741) via the parsed ``confidence_value`` column."""
    page_hits = hits.join(F.broadcast(page.select("doc_id", "rank")), "doc_id")
    ann = annotations.join(
        F.broadcast(page_hits.select("doc_id", "ann_id", "rank")),
        ["doc_id", "ann_id"],
    )
    out = ann.join(
        sentences.select("doc_id", "sent_idx", "sentence"),
        ["doc_id", "sent_idx"],
        "left",
    )
    # "93.2%" → 93.2 (server.py:733 float(score[:-1]))
    return out.withColumn(
        "confidence_value",
        (F.regexp_extract(F.col("confidence"), r"^([\d.]+)%$", 1)).try_cast("double"),
    )


def statistics(hits: DataFrame, annotations: DataFrame) -> dict:
    """Result statistics (server.py:895-921): papers / sentences /
    relations, plus per-annotator relation counts — one pass via cube-less
    two aggregations on the thin hit relation."""
    ann = annotations.join(hits.select("doc_id", "ann_id"), ["doc_id", "ann_id"])
    overall = ann.agg(
        F.countDistinct("doc_id").alias("papers"),
        F.countDistinct("doc_id", "sent_idx").alias("sentences"),
        F.count(F.lit(1)).alias("relations"),
    ).collect()[0]
    per_annotator = {
        r["annotator"]: r["n"]
        for r in ann.groupBy("annotator").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {
        "papers": overall["papers"],
        "sentences": overall["sentences"],
        "relations": overall["relations"],
        "relations_by_annotator": per_annotator,
    }


def run_rel(
    postings: DataFrame,
    annotations: DataFrame,
    sentences: DataFrame,
    meta: DataFrame | None,
    e1_spec: spec_mod.Spec,
    e2_spec: spec_mod.Spec | None = None,
    pmid: str | None = None,
    sort_key: str = "relevance",
    page_start: int = 0,
    page_end: int = 10,
    with_statistics: bool = True,
) -> RelResult:
    if e2_spec is None:
        hits = spec_mod.evaluate_single(postings, e1_spec, pmid)
    else:
        hits = spec_mod.evaluate_pair(postings, e1_spec, e2_spec, pmid)
    hits = hits.cache()  # reused by scores, hydration and statistics
    scores = paper_scores(hits)
    page = sorted_page(scores, meta, sort_key, page_start, page_end)
    relations = hydrate(page, hits, annotations, sentences)
    stats = statistics(hits, annotations) if with_statistics else {}
    return RelResult(papers=page, relations=relations, statistics=stats)
