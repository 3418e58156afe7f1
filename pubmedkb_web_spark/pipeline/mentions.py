"""M1 — batched mention detection + NEN-style entity linking.

Reference semantics re-expressed Spark-first:

- sentence split: the reference stores pre-split sentences
  (/root/reference/kb_utils.py:1474-1484); our corpus uses ". "-joined
  sentences, split JVM-side.
- token n-gram span enumeration: spans of ≤N tokens within 3..100 chars
  (/root/reference/kb_utils.py:806-856 — its UMLS annotator enumerates spaCy
  token n-grams with exactly these bounds). Implemented with higher-order
  array functions (sequence/transform/slice/aggregate) — stays in the JVM,
  no Python in the hot path, no shuffle: pure per-row compute that scales
  linearly with executors.
- dictionary match: broadcast hash join of spans against the NEN dictionary
  (/root/reference/kb_utils.py:829-852 probes every n-gram against an
  in-memory dict — the classic broadcast-join shape, SURVEY.md J14).
- candidate ranking: ids per matched name ordered by (freq desc, id) —
  get_ids_by_name semantics (/root/reference/kb_utils.py:365-372).
- overlap removal: greedy keep-first by start offset, longer span wins on
  ties (/root/reference/server.py:1292-1334) — inherently sequential per
  sentence, so it runs as applyInPandas per (doc_id, sent_idx) group.

Scale notes (100 TB): every step before the final groupBy is narrow
(map-only). The only shuffles are the applyInPandas group (keyed by
(doc_id, sent_idx) — uniformly distributed, no skew: doc_id is a sha256
prefix) and the mention aggregation on the same key. The dictionary
(~millions of names at full scale) broadcasts at ≤ a few hundred MB; above
that, switch the join to a bucketed sort-merge on name_lower.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_SPAN_CHARS = 100
MIN_SPAN_CHARS = 3


def split_sentences(source_ingested: DataFrame) -> DataFrame:
    """source → sentences(doc_id, sent_idx, sentence, section, content_sha256)."""
    return (
        source_ingested.select(
            "doc_id",
            "content_sha256",
            F.posexplode(F.split(F.col("content"), r"\.\s+")).alias("sent_idx", "sentence"),
        )
        .withColumn("sentence", F.regexp_replace("sentence", r"\.$", ""))
        .filter(F.length("sentence") > 0)
        .select(
            "doc_id",
            F.col("sent_idx").cast("int").alias("sent_idx"),
            "sentence",
            F.lit("abstract").alias("section"),
            "content_sha256",
        )
    )


def enumerate_spans(sentences: DataFrame, max_tokens: int) -> DataFrame:
    """All token n-grams (n ≤ max_tokens, 3..100 chars) with char offsets.

    Codegen-friendly formulation: posexplode the tokens, compute each
    token's char offset with a window cumulative sum, then build n-grams by
    iterative self-joins on the token position (co-partitioned on
    (doc_id, sent_idx) after one shuffle — Catalyst reuses the exchange).

    An earlier version did this per-row with nested higher-order functions
    (sequence/transform/filter with an aggregate for the offset). That is
    shuffle-free but evaluates *interpreted*, and interpreted lambda eval
    degrades under thread parallelism (measured: the identical span count
    took 26.6 s on local[2] and 103.9 s on local[8]). Window + join stays
    inside whole-stage codegen and scales with cores.
    """
    from pyspark.sql import Window as W

    toks = F.split(F.col("sentence"), " ")
    base = sentences.select(
        "doc_id",
        "sent_idx",
        "content_sha256",
        F.posexplode(toks).alias("pos", "tok"),
    )
    w = W.partitionBy("doc_id", "sent_idx").orderBy("pos")
    tokens = base.withColumn(
        "offset",
        F.coalesce(
            F.sum(F.length("tok") + 1).over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("int"),
    )

    spans = tokens.select(
        "doc_id", "sent_idx", "content_sha256", "offset", "pos",
        F.col("tok").alias("span_text"),
    )
    out = [spans]
    nxt = tokens.select(
        "doc_id", "sent_idx", F.col("pos").alias("nxt_pos"), F.col("tok").alias("nxt_tok")
    )
    for n in range(2, max_tokens + 1):
        prev = out[-1]
        extended = prev.join(
            nxt,
            (prev["doc_id"] == nxt["doc_id"])
            & (prev["sent_idx"] == nxt["sent_idx"])
            & (nxt["nxt_pos"] == prev["pos"] + 1),
        ).select(
            prev["doc_id"],
            prev["sent_idx"],
            prev["content_sha256"],
            prev["offset"],
            nxt["nxt_pos"].alias("pos"),
            F.concat_ws(" ", prev["span_text"], nxt["nxt_tok"]).alias("span_text"),
        )
        out.append(extended)

    all_spans = out[0]
    for df in out[1:]:
        all_spans = all_spans.unionByName(df)
    return all_spans.filter(
        (F.length("span_text") >= MIN_SPAN_CHARS)
        & (F.length("span_text") <= MAX_SPAN_CHARS)
    ).select("doc_id", "sent_idx", "content_sha256", "offset", "span_text")


def dictionary_candidates(spans: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """Broadcast-join spans against the dictionary (case-insensitive).

    Output: one row per (span occurrence, type) with the freq-ranked id list
    — mention `ids` per kb_utils.py:365-372 (ids sorted by freq desc).
    """
    dict_by_name = (
        entity_dict.groupBy(F.lower(F.col("name")).alias("name_lower"), "type")
        .agg(
            # freq desc then id asc, deterministically, without a window:
            # sort struct(-freq, id) ascending, then project id.
            # case aliases share ids → sum freq per id first, then order
            # by (freq desc, id asc) and dedupe keeping highest-freq slot.
            F.array_distinct(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct((-F.col("freq")).alias("nf"), F.col("id").alias("id"))
                        )
                    ),
                    lambda s: s["id"],
                )
            ).alias("ids")
        )
    )
    return spans.join(
        F.broadcast(dict_by_name),
        F.lower(F.col("span_text")) == F.col("name_lower"),
        "inner",
    ).select(
        "doc_id",
        "sent_idx",
        "content_sha256",
        "offset",
        F.col("span_text").alias("name"),
        "type",
        "ids",
    )


_CAND_DDL = (
    "struct<offset:int,neg_len:int,type:string,name:string,ids:array<string>>"
)
_STATE_DDL = f"struct<last_end:int,ks:int,ke:int,kept:array<{_CAND_DDL}>>"


def resolve_overlaps(candidates: DataFrame) -> DataFrame:
    """Greedy non-overlap resolution per sentence (server.py:1292-1334).

    Sort by (offset asc, length desc, type asc); keep a span iff it starts
    at/after the end of the last kept span; mentions of *different types*
    on the identical span are all kept (the reference emits one mention per
    type). The scan is inherently sequential per sentence, but sentences
    are short — so it runs as a JVM-side fold (array_sort + aggregate with
    struct state) rather than per-group Python: an applyInPandas version
    measured ~8 ms/group of pure pandas overhead, 25+ s on a corpus where
    this fold takes ~2 s, and it keeps the whole stage Python-free.
    """
    cand = F.struct(
        F.col("offset").cast("int").alias("offset"),
        (-F.length("name")).cast("int").alias("neg_len"),
        F.col("type").alias("type"),
        F.col("name").alias("name"),
        F.col("ids").alias("ids"),
    )
    grouped = candidates.groupBy("doc_id", "sent_idx", "content_sha256").agg(
        F.array_sort(F.collect_list(cand)).alias("cands")
    )

    init = F.lit(None).cast(_STATE_DDL)

    def step(acc: Column, c: Column) -> Column:
        start = c["offset"]
        end = c["offset"] - c["neg_len"]
        appended = lambda: F.concat(acc["kept"], F.array(c))  # noqa: E731
        first = F.struct(
            end.alias("last_end"), start.alias("ks"), end.alias("ke"),
            F.array(c).alias("kept"),
        )
        keep_new = F.struct(
            end.alias("last_end"), start.alias("ks"), end.alias("ke"),
            appended().alias("kept"),
        )
        keep_same_span = F.struct(
            acc["last_end"].alias("last_end"), acc["ks"].alias("ks"), acc["ke"].alias("ke"),
            appended().alias("kept"),
        )
        return (
            F.when(acc.isNull(), first)
            .when(start >= acc["last_end"], keep_new)
            .when((start == acc["ks"]) & (end == acc["ke"]), keep_same_span)
            .otherwise(acc)
        )

    kept = F.aggregate(F.col("cands"), init, step, lambda s: s["kept"])
    return (
        grouped.select(
            "doc_id",
            "sent_idx",
            "content_sha256",
            F.posexplode(kept).alias("mention_idx", "m"),
        )
        .select(
            "doc_id",
            "sent_idx",
            "content_sha256",
            F.col("m.offset").alias("offset"),
            F.col("m.name").alias("name"),
            F.col("m.type").alias("type"),
            F.col("m.ids").alias("ids"),
            F.col("mention_idx").cast("int").alias("mention_idx"),
        )
    )


def build_mentions(
    source_ingested: DataFrame, entity_dict: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Full M1: source → (sentences, mentions)."""
    sentences = split_sentences(source_ingested)
    # driver-side scalar: max tokens over dictionary names — bounds the
    # explode factor; one tiny job, cached by the caller if reused.
    max_tokens = (
        entity_dict.select(F.max(F.size(F.split(F.col("name"), " "))).alias("m"))
        .collect()[0]["m"]
    )
    spans = enumerate_spans(sentences, max_tokens=int(max_tokens))
    candidates = dictionary_candidates(spans, entity_dict)
    mentions = resolve_overlaps(candidates).select(
        "doc_id",
        "sent_idx",
        "mention_idx",
        "name",
        "type",
        "ids",
        "offset",
        "content_sha256",
    )
    return sentences, mentions
