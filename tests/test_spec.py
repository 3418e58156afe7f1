"""Entity-spec compiler vs brute-force evaluator + algebra properties
(SURVEY.md §5 item 1)."""

from __future__ import annotations

import random

import pytest

from pubmedkb_web_spark.query import spec as spec_mod

import tests.oracle as oracle


def _random_postings(rng: random.Random, n: int = 300) -> list[dict]:
    types = ["Gene", "Disease", "SNP", "ProteinMutation", "Mutation"]
    keys = [f"K{i}" for i in range(8)]
    return [
        {
            "idx_kind": rng.choice(["type_id", "type_name"]),
            "type": rng.choice(types),
            "key": rng.choice(keys),
            "role": rng.choice(["head", "tail"]),
            "doc_id": f"d{rng.randrange(12)}",
            "ann_id": rng.randrange(20),
        }
        for _ in range(n)
    ]


def _random_spec(rng: random.Random, depth: int = 0):
    if depth >= 2 or rng.random() < 0.45:
        kind = rng.choice(["type_id", "type_name"])
        etype = rng.choice(["Gene", "Disease", "SNP", "VARIANT"])
        return (kind, (etype, f"K{rng.randrange(8)}"))
    op = rng.choice(["AND", "OR"])
    return (op, tuple(_random_spec(rng, depth + 1) for _ in range(rng.randint(2, 3))))


def _spark_postings(spark, rows):
    return spark.createDataFrame(
        [(r["idx_kind"], r["type"], r["key"], r["role"], r["doc_id"], r["ann_id"], 1.0) for r in rows],
        "idx_kind string, type string, key string, role string, doc_id string, ann_id long, score double",
    )


@pytest.mark.parametrize("trial", range(6))
def test_compiler_matches_bruteforce(spark, trial):
    rng = random.Random(1000 + trial)
    rows = _random_postings(rng)
    postings = _spark_postings(spark, rows)
    tree = _random_spec(rng)
    got = {
        (r["role"], r["doc_id"], r["ann_id"])
        for r in spec_mod.SpecCompiler(postings).compile(tree).collect()
    }
    assert got == oracle.eval_spec(rows, tree)


@pytest.mark.parametrize("trial", range(4))
def test_pair_matches_bruteforce(spark, trial):
    rng = random.Random(2000 + trial)
    rows = _random_postings(rng)
    postings = _spark_postings(spark, rows)
    e1, e2 = _random_spec(rng), _random_spec(rng)
    got = {
        (r["doc_id"], r["ann_id"])
        for r in spec_mod.evaluate_pair(postings, e1, e2).collect()
    }
    assert got == oracle.eval_pair(rows, e1, e2)


def test_and_idempotent_and_or_commutative(spark):
    rng = random.Random(7)
    rows = _random_postings(rng)
    postings = _spark_postings(spark, rows)
    leaf = ("type_id", ("Gene", "K1"))
    other = ("type_name", ("Disease", "K2"))

    def rs(tree):
        return {
            (r["role"], r["doc_id"], r["ann_id"])
            for r in spec_mod.SpecCompiler(postings).compile(tree).collect()
        }

    assert rs(("AND", (leaf, leaf))) == rs(leaf)  # AND(x,x) == x
    assert rs(("OR", (leaf, other))) == rs(("OR", (other, leaf)))
    assert rs(("AND", (leaf, other))) == rs(("AND", (other, leaf)))
    # umbrella: VARIANT == OR over concrete variant types
    umbrella = ("type_id", ("VARIANT", "K3"))
    expanded = ("OR", tuple(("type_id", (t, "K3")) for t in oracle.VARIANT_TYPES))
    assert rs(umbrella) == rs(expanded)


def test_pmid_pushdown(spark):
    rng = random.Random(11)
    rows = _random_postings(rng)
    postings = _spark_postings(spark, rows)
    tree = ("OR", (("type_id", ("Gene", "K1")), ("type_id", ("Disease", "K2"))))
    got = {
        (r["role"], r["doc_id"], r["ann_id"])
        for r in spec_mod.SpecCompiler(postings, pmid="d3").compile(tree).collect()
    }
    assert got == oracle.eval_spec(rows, tree, pmid="d3")
    assert all(doc == "d3" for _, doc, _ in got)
