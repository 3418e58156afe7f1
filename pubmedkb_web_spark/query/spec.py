"""Entity-spec compiler: s-expression tree → DataFrame plan.

The reference evaluates specs bottom-up over in-memory inverted indexes
(/root/reference/kb_utils.py:1540-1682): leaf = index probe, AND = key-wise
set intersection (kb_utils.py:167-195), OR = key-wise union
(kb_utils.py:198-216), two-entity = head/tail cross pairing
(kb_utils.py:1651-1668), with per-query memoization and pmid pushdown.

Here a spec compiles to a DataFrame DAG over ``entity_postings``:

- leaf  → filter (idx_kind, type, key) [+ pmid] — Catalyst pushes it to the
          parquet scan of the postings table
- AND   → inner join on (role, doc_id, ann_id): the reference intersects
          pmid keysets AND annotation value-sets, which together are exactly
          row-level intersection
- OR    → unionByName + dropDuplicates
- VARIANT umbrella → isin over the six concrete types (kb_utils.py:58-67)
- memoization → identical leaves return the *same* DataFrame object, so
          Catalyst reuses the subplan/exchange (kb_utils.py:1556-1562 analog)

The reference's "smallest input first" and "abort empty AND"
(kb_utils.py:171-173,1572-1573) are left to Catalyst/AQE: join reordering +
empty-relation propagation at runtime.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import VARIANT_TYPES

Spec = tuple  # ("AND"|"OR", (spec, ...)) | ("type_id"|"type_name", (type, key))

_HT_COLS = ["role", "doc_id", "ann_id", "score"]


class SpecCompiler:
    def __init__(self, postings: DataFrame, pmid: str | None = None):
        self.postings = postings
        self.pmid = pmid
        self._memo: dict[tuple, DataFrame] = {}

    # -- leaf -----------------------------------------------------------
    def _leaf(self, idx_kind: str, etype: str, key: str) -> DataFrame:
        memo_key = (idx_kind, etype, key, self.pmid)
        if memo_key in self._memo:
            return self._memo[memo_key]
        p = self.postings
        cond = (F.col("idx_kind") == idx_kind) & (F.col("key") == key)
        if etype == "VARIANT":  # umbrella expansion
            cond = cond & F.col("type").isin(VARIANT_TYPES)
        else:
            cond = cond & (F.col("type") == etype)
        if self.pmid is not None:  # pmid pushdown below all joins (P2)
            cond = cond & (F.col("doc_id") == self.pmid)
        # umbrella expansion can match the same ann under several types →
        # dedupe to pure (role, doc, ann) posting rows
        df = p.filter(cond).select(*_HT_COLS).dropDuplicates(["role", "doc_id", "ann_id"])
        self._memo[memo_key] = df
        return df

    # -- tree -----------------------------------------------------------
    def compile(self, spec: Spec) -> DataFrame:
        op = spec[0]
        if op in ("type_id", "type_name"):
            etype, key = spec[1]
            return self._leaf(op, etype, key)
        branches: Sequence[Spec] = spec[1]
        dfs = [self.compile(b) for b in branches]
        if op == "OR":
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            return out.dropDuplicates(["role", "doc_id", "ann_id"])
        if op == "AND":
            out = dfs[0]
            for d in dfs[1:]:
                out = out.join(
                    d.select("role", "doc_id", "ann_id"),
                    ["role", "doc_id", "ann_id"],
                    "inner",
                )
            return out.dropDuplicates(["role", "doc_id", "ann_id"])
        raise ValueError(f"unknown spec op: {op!r}")


def evaluate_single(postings: DataFrame, spec: Spec, pmid: str | None = None) -> DataFrame:
    """Single-entity query → (doc_id, ann_id, score): an annotation matches
    if the entity appears as head OR tail (kb_utils.py:1638-1649)."""
    ht = SpecCompiler(postings, pmid).compile(spec)
    return ht.select("doc_id", "ann_id", "score").dropDuplicates(["doc_id", "ann_id"])


def evaluate_pair(
    postings: DataFrame, e1_spec: Spec, e2_spec: Spec, pmid: str | None = None
) -> DataFrame:
    """Two-entity query: (e1.head ∩ e2.tail) ∪ (e1.tail ∩ e2.head) per
    annotation (kb_utils.py:1651-1668)."""
    c = SpecCompiler(postings, pmid)
    e1, e2 = c.compile(e1_spec), c.compile(e2_spec)

    def directed(h: DataFrame, t: DataFrame) -> DataFrame:
        hh = h.filter(F.col("role") == "head").select("doc_id", "ann_id", "score")
        tt = t.filter(F.col("role") == "tail").select("doc_id", "ann_id")
        return hh.join(tt, ["doc_id", "ann_id"], "inner")

    return (
        directed(e1, e2)
        .unionByName(directed(e2, e1))
        .dropDuplicates(["doc_id", "ann_id"])
    )
