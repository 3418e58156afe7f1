"""KG construction pipeline, stages M1-M4 (SURVEY.md §7).

M1 mentions.py      sentence split + n-gram spans + dictionary NEN linking
M2 extractors.py    co_occurrence / odds_ratio / *_ore / rbert_cre triples
M3 canonicalize.py  alias connected-components → canonical entity ids
M4 materialize.py   dedup + postings + stats tables + parquet/Iceberg sinks
   runner.py        stage orchestration with checkpoint/resume + lineage
"""
