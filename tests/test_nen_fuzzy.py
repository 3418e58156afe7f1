"""NEN fuzzy lookup: exact difflib parity + blocking semantics."""

from __future__ import annotations

import difflib

from pubmedkb_web_spark import fixtures
from pubmedkb_web_spark.query import nen


def test_ratio_parity_with_difflib(spark):
    ed = fixtures.entity_dict_df(spark)
    q = "p.v600x"  # 1 char off the hot variant
    got = {r["name"]: r["similarity"] for r in nen.fuzzy_names(ed, q, min_similarity=0.5).collect()}
    assert got, "candidates expected within ±1 length"
    for name, sim in got.items():
        expect = difflib.SequenceMatcher(a=name, b=q).ratio()
        assert abs(sim - round(expect, 6)) < 1e-9


def test_length_blocking(spark):
    ed = fixtures.entity_dict_df(spark)
    q = "braf"
    names = [r["name"] for r in nen.fuzzy_names(ed, q, min_similarity=0.0, max_names=1000).collect()]
    assert names
    assert all(abs(len(n) - len(q)) <= 1 for n in names)


def test_exact_match_ranks_first(spark):
    ed = fixtures.entity_dict_df(spark)
    rows = nen.fuzzy_names(ed, "braf").collect()
    assert rows[0]["name"] == "braf"
    assert rows[0]["similarity"] == 1.0


def test_ids_by_name_freq_ranked(spark):
    ed = fixtures.entity_dict_df(spark)
    names = nen.fuzzy_names(ed, "rs113488022")
    ranked = nen.ids_by_name(ed, names).collect()
    by_name: dict[str, list] = {}
    for r in ranked:
        by_name.setdefault(r["name"], []).append(r)
    for rows in by_name.values():
        rows.sort(key=lambda r: r["rank"])
        freqs = [r["freq"] for r in rows]
        assert freqs == sorted(freqs, reverse=True)


def test_aliases_by_id_capped(spark):
    ed = fixtures.entity_dict_df(spark)
    out = nen.aliases_by_id(ed, max_aliases=2).collect()
    from collections import Counter

    c = Counter((r["type"], r["id"]) for r in out)
    assert max(c.values()) <= 2
