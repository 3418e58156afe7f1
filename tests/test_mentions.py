"""M1 vs the pure-Python oracle (reference semantics, tests/oracle.py)."""

from __future__ import annotations

from pubmedkb_web_spark import fixtures
from pubmedkb_web_spark.pipeline import mentions as M

import tests.oracle as oracle


def test_mentions_match_python_oracle(spark):
    n = 40
    src = fixtures.ingest(fixtures.source_table(spark, n))
    ed = fixtures.entity_dict_df(spark)
    _, ments = M.build_mentions(src, ed)
    got = {
        (r["doc_id"], r["sent_idx"], r["mention_idx"]): (
            r["name"], r["type"], tuple(r["ids"]), r["offset"]
        )
        for r in ments.collect()
    }
    expected = {}
    for doc_id, ms in oracle.corpus_mentions(n).items():
        for m in ms:
            expected[(doc_id, m["sent_idx"], m["mention_idx"])] = (
                m["name"], m["type"], tuple(m["ids"]), m["offset"]
            )
    assert got == expected


def test_sentence_split_offsets(spark):
    src = fixtures.ingest(fixtures.source_table(spark, 15))
    sents = M.split_sentences(src).collect()
    contents = {r["doc_id"]: r["content"] for r in src.collect()}
    for s in sents:
        assert s["sentence"] in contents[s["doc_id"]]
        # the sentence terminator is stripped (entity names like 'p.v600e'
        # legitimately contain dots, so only the trailing one must go)
        assert not s["sentence"].endswith(".")


def test_mention_offsets_point_at_surface(spark):
    src = fixtures.ingest(fixtures.source_table(spark, 25))
    ed = fixtures.entity_dict_df(spark)
    sents, ments = M.build_mentions(src, ed)
    sent_map = {(r["doc_id"], r["sent_idx"]): r["sentence"] for r in sents.collect()}
    for m in ments.collect():
        sentence = sent_map[(m["doc_id"], m["sent_idx"])]
        assert sentence[m["offset"] : m["offset"] + len(m["name"])] == m["name"]
