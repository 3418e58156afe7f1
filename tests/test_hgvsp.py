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


@pytest.mark.parametrize(
    "raw,kind,ext_kind,ext_pos",
    [
        ("p.Met1ext-5", "ext", "N-terminal", "-5"),
        ("p.Ter110GlnextTer17", "ext", "C-terminal", "17"),
        ("p.*110Glnext*17", "ext", "C-terminal", "17"),
        ("p.Ter110GlnextTer?", "ext", "C-terminal", "?"),
    ],
)
def test_ext_decoding(raw, kind, ext_kind, ext_pos):
    """Extension args decoded into fields (HGVSp_parser.py:81-94)."""
    got = H.parse_hgvsp(raw)
    assert got["kind"] == kind
    assert got["ext_kind"] == ext_kind
    assert got["ext_pos"] == ext_pos
    assert ext_pos in got["text"]


def test_mosaic_and_uncertain_and_start_forms():
    """HGVSp_parser.py:26-28 (_?), 96-104 (p.0 / Met1?), 130-170 (=/, ^)."""
    m = H.parse_hgvsp("p.Trp24=/Cys")
    assert m["kind"] == "mosaic" and m["ref_aa"] == "W" and m["alt_aa"] == "C"
    m2 = H.parse_hgvsp("p.Trp24=/")
    assert m2["kind"] == "mosaic" and m2["alt_aa"] is None

    u = H.parse_hgvsp("p.Gly56Ala^Ser^Cys")
    assert u["kind"] == "substitution_uncertain"
    assert u["alt_aa"] == "A^S^C"
    assert "A, S, or C" in u["text"]

    assert H.parse_hgvsp("p.0")["kind"] == "no_protein"
    s = H.parse_hgvsp("p.Met1?")
    assert s["kind"] == "start_unknown" and s["pos_start"] == 1

    f = H.parse_hgvsp("p.MetGly1_?2")
    assert f["kind"] == "frameshift_or_start_lost"

    t = H.parse_hgvsp("p.Lys2_Leu3insTer12")
    assert t["kind"] == "ins_ter" and "12 residues downstream" in t["text"]

    enc = H.parse_hgvsp("p.Cys188%3D")  # url-encoded '='
    assert enc["kind"] == "synonymous" and enc["ref_aa"] == "C"


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
