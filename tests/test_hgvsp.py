"""HGVSp parser: every class from the reference's dispatch
(HGVSp_parser.py:18-109) plus aa decode (130-178)."""

from __future__ import annotations

import pytest

from pubmedkb_web_spark.functions import hgvsp as H


@pytest.mark.parametrize(
    "raw,kind,ref,pos,alt",
    [
        ("p.V600E", "substitution", "V", 600, "E"),
        ("p.Val600Glu", "substitution", "V", 600, "E"),
        ("p.(Val600Glu)", "substitution", "V", 600, "E"),
        ("p.Trp26Ter", "substitution", "W", 26, "*"),
        ("p.Cys28delinsTrpVal", "delins", "C", 28, "WV"),
        ("p.Lys2_Gly3insGlnSerLys", "ins", "K", 2, "QSK"),
        ("p.Lys23_Val25del", "del", "K", 23, None),
        ("p.Gly4dup", "dup", "G", 4, None),
        ("p.Arg97fs", "fs", "R", 97, None),
        ("p.Arg97ProfsTer23", "fs", "R", 97, "P"),
        ("p.Met1ext-5", "ext", "M", 1, None),
        ("p.Ala3=", "synonymous", "A", 3, None),
    ],
)
def test_parse_classes(raw, kind, ref, pos, alt):
    got = H.parse_hgvsp(raw)
    assert got["kind"] == kind
    assert got["ref_aa"] == ref
    assert got["pos_start"] == pos
    assert got["alt_aa"] == alt
    assert got["text"]


def test_unparseable_and_null():
    assert H.parse_hgvsp("garbage")["kind"] == "unknown"
    assert H.parse_hgvsp(None)["kind"] == "unknown"
    assert H.parse_hgvsp("")["text"] is None


def test_range_fields():
    got = H.parse_hgvsp("p.Lys23_Val25del")
    assert (got["ref_aa2"], got["pos_end"]) == ("V", 25)


@pytest.mark.parametrize("n,s", [(1, "1st"), (2, "2nd"), (3, "3rd"), (4, "4th"), (11, "11th"), (12, "12th"), (13, "13th"), (21, "21st"), (102, "102nd")])
def test_ordinal(n, s):
    assert H.ordinal(n) == s


def test_udf_matches_python(spark):
    cases = ["p.V600E", "p.Lys23_Val25del", "p.Arg97fs", "bogus"]
    df = spark.createDataFrame([(c,) for c in cases], "h string")
    rows = df.select("h", H.parse_hgvsp_col(df.h).alias("p")).collect()
    for r in rows:
        expect = H.parse_hgvsp(r["h"])
        got = r["p"].asDict()
        assert got == expect
