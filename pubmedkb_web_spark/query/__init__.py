"""M5 — the query layer (SURVEY.md §3).

spec.py       entity-spec s-expression → DataFrame plan compiler
rel.py        the /query_rel pipeline: evaluate → sort/paginate → hydrate → stats
nen.py        fuzzy name lookup (difflib ratio + length blocking)
retrieval.py  BM25-as-join, RRF fusion, exact cosine top-k
summary.py    per-annotator relation selection + template NLG
varsum.py     variant-report generation (HGVSp/CDS parsing + NLG)
"""
