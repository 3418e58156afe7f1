"""Relation selection + template NLG summary (SURVEY.md §3.1 stage 6).

Reference semantics (/root/reference/summary_utils.py:610-753):

- pick ≤1 odds-ratio relation: argmax of normalized OR = max(OR, 1/OR)
  (summary_utils.py:619-645 — OR<1 is as informative as 1/OR>1);
- pick ≤1 CRE relation: argmax of confidence × label weight
  {Cause-associated: 3, In-patient: 2, Appositive: 1}
  (summary_utils.py:20-24,647-669);
- pick ≤2 ORE relations: predicates ranked by support count with
  original-order tiebreak, spaCy first, OpenIE excluding predicates already
  selected, preferring evidence pmids not already used
  (summary_utils.py:671-753);
- fill templates; template choice is randomized in the reference
  (summary_utils.py:919) — here the RNG is seeded by the selected
  relations' content so output is deterministic (SURVEY.md §7 risk #5).

The selection operators are DataFrame-native (they also serve build-side
rollups); ``summarize_page`` runs them on a collected page — the reference
inspects ≤ one page of rows, so driver-side is the honest cost model.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..schemas import CRE_LABEL_WEIGHT


def normalized_or(col: F.Column) -> F.Column:
    """max(OR, 1/OR) (summary_utils.py:630-639); non-numeric → null."""
    v = (col).try_cast("double")
    return F.when(v > 0, F.greatest(v, 1.0 / v))


def select_odds_ratio(relations: DataFrame) -> DataFrame:
    """Top-1 odds_ratio row by normalized OR, tiebreak (doc_id, ann_id)."""
    orr = relations.filter(F.col("annotator") == "odds_ratio").withColumn(
        "norm_or", F.round(normalized_or(F.col("or_value")), 6)
    )
    return (
        orr.filter(F.col("norm_or").isNotNull())
        .orderBy(F.col("norm_or").desc(), F.col("doc_id").asc(), F.col("ann_id").asc())
        .limit(1)
    )


def select_cre(relations: DataFrame) -> DataFrame:
    """Top-1 rbert_cre row by confidence × label weight (summary_utils.py:647-669)."""
    weight = F.lit(0)
    for label, w in CRE_LABEL_WEIGHT.items():
        weight = F.when(F.col("relation") == label, F.lit(w)).otherwise(weight)
    cre = relations.filter(F.col("annotator") == "rbert_cre").withColumn(
        "cre_rank_score",
        F.round(
            (F.regexp_extract("confidence", r"^([\d.]+)%$", 1)).try_cast("double")
            * weight,
            6,
        ),
    )
    return (
        cre.filter(F.col("cre_rank_score").isNotNull())
        .orderBy(F.col("cre_rank_score").desc(), F.col("doc_id").asc(), F.col("ann_id").asc())
        .limit(1)
    )


def predicate_support(relations: DataFrame, annotator: str) -> DataFrame:
    """Predicate frequency for one ORE annotator (summary_utils.py:687-694)."""
    return (
        relations.filter(F.col("annotator") == annotator)
        .groupBy("predicate")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def select_ore(relations: DataFrame, max_relations: int = 2) -> DataFrame:
    """≤2 ORE rows: spaCy's top predicate first, then OpenIE's top predicate
    excluding already-selected predicates (summary_utils.py:692-694 →
    left_anti), each represented by its first evidence row; prefers pmids
    not already used (summary_utils.py:722-734)."""
    spacy_top = (
        predicate_support(relations, "spacy_ore")
        .orderBy(F.col("support").desc(), F.col("predicate").asc())
        .limit(1)
    )
    openie_top = (
        predicate_support(relations, "openie_ore")
        .join(spacy_top.select("predicate"), "predicate", "left_anti")
        .orderBy(F.col("support").desc(), F.col("predicate").asc())
        .limit(1)
    )
    chosen = spacy_top.withColumn("src", F.lit("spacy_ore")).unionByName(
        openie_top.withColumn("src", F.lit("openie_ore"))
    )
    w = W.partitionBy("annotator", "predicate").orderBy(
        F.col("doc_id").asc(), F.col("ann_id").asc()
    )
    firsts = relations.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        firsts.join(
            chosen.select(F.col("src").alias("annotator"), "predicate"),
            ["annotator", "predicate"],
        )
        .drop("rn")
        .limit(max_relations)
    )


OR_TEMPLATES = [
    "{subject} is associated with {object} (OR={or_value}, CI: {ci}, p={p_value}).",
    "An odds ratio of {or_value} (CI: {ci}, p-value {p_value}) links {subject} and {object}.",
]
CRE_TEMPLATES = [
    "{subject} has a {relation} relation to {object} (confidence {confidence}).",
    "With {confidence} confidence, {subject} is {relation} with {object}.",
]
ORE_TEMPLATES = [
    "{subject} {predicate} {object}.",
    "It was reported that {subject} {predicate} {object}.",
]


def _fill(template: str, row: dict) -> tuple[str, dict[str, tuple[int, int]]]:
    """Template instantiation with char-span tracking
    (summary_utils.py:532-548): returns the text and {field: (start, end)}."""
    out, spans, i = "", {}, 0
    while i < len(template):
        j = template.find("{", i)
        if j < 0:
            out += template[i:]
            break
        out += template[i:j]
        k = template.index("}", j)
        field = template[j + 1 : k]
        val = str(row.get(field) or "")
        spans[field] = (len(out), len(out) + len(val))
        out += val
        i = k + 1
    return out, spans


def summarize_page(page_rows: list[dict], seed: int = 42) -> list[dict]:
    """Driver-side summary of a collected page: one sentence per selected
    relation. Template choice is seeded by (seed, doc_id, ann_id) — the
    reference's random.choice (summary_utils.py:919) made deterministic."""

    def pct(s: str | None) -> float:
        try:
            return float(s[:-1]) if s and s.endswith("%") else float("nan")
        except ValueError:
            return float("nan")

    picked: list[tuple[str, list[str], dict]] = []
    ors = [
        r for r in page_rows
        if r["annotator"] == "odds_ratio" and _norm_or(r.get("or_value")) is not None
    ]
    if ors:
        # max by score, then MIN by (doc_id, ann_id) — identical tie order to
        # the DataFrame selectors (select_odds_ratio orders doc_id/ann_id asc)
        best = min(
            ors, key=lambda r: (-_norm_or(r["or_value"]), r["doc_id"], r["ann_id"])
        )
        picked.append(("odds_ratio", OR_TEMPLATES, best))
    cres = [
        r for r in page_rows
        if r["annotator"] == "rbert_cre"
        and pct(r.get("confidence")) == pct(r.get("confidence"))  # drop NaN,
        # matching select_cre's isNotNull filter on unparsable confidence
    ]
    if cres:
        best = min(
            cres,
            key=lambda r: (
                -pct(r.get("confidence")) * CRE_LABEL_WEIGHT.get(r.get("relation"), 0),
                r["doc_id"],
                r["ann_id"],
            ),
        )
        picked.append(("rbert_cre", CRE_TEMPLATES, best))
    seen_preds: set[str] = set()
    for annot in ("spacy_ore", "openie_ore"):
        rows = [r for r in page_rows if r["annotator"] == annot and r.get("predicate")]
        support: dict[str, int] = {}
        for r in rows:
            support[r["predicate"]] = support.get(r["predicate"], 0) + 1
        cands = sorted(
            (p for p in support if p not in seen_preds),
            key=lambda p: (-support[p], p),
        )
        if cands:
            pred = cands[0]
            seen_preds.add(pred)
            best = min(
                (r for r in rows if r["predicate"] == pred),
                key=lambda r: (r["doc_id"], r["ann_id"]),
            )
            picked.append((annot, ORE_TEMPLATES, best))

    out = []
    for annot, templates, row in picked:
        rng = random.Random(f"{seed}:{row['doc_id']}:{row['ann_id']}")
        text, spans = _fill(rng.choice(templates), row)
        out.append(
            {"annotator": annot, "text": text, "spans": spans,
             "doc_id": row["doc_id"], "ann_id": row["ann_id"]}
        )
    return out


def _norm_or(s: str | None) -> float | None:
    try:
        v = float(s)  # type: ignore[arg-type]
    except (TypeError, ValueError):
        return None
    return max(v, 1.0 / v) if v > 0 else None
