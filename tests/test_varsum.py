"""VarSum record cleaning + report NLG."""

from __future__ import annotations

from pubmedkb_web_spark.query import varsum as V


def _records(spark):
    rows = [
        ("BRCA1", "p.V600E", "c.1799T>A", "0/1", "missense_variant", "Pathogenic", "0.0001"),
        ("TP53", ".", "c.376-2A>G", "1/1", "splice_acceptor_variant", "Likely_pathogenic", "."),
        (".", "p.Arg97fs", "c.*52del", "0|0", "frameshift_variant", "Uncertain_significance", "0.01,0.02"),
    ]
    return spark.createDataFrame(
        rows,
        "gene string, hgvsp string, hgvsc string, genotype string, "
        "consequence string, clinvar string, gnomad_af string",
    )


def test_cleaning(spark):
    rows = V.clean_varsum_records(_records(spark)).collect()
    r0, r1, r2 = rows
    assert r0["zygosity"] == "heterozygous"
    assert r1["zygosity"] == "homozygous"
    assert r2["zygosity"] == "homozygous"
    assert r1["hgvsp"] is None  # '.' sentinel
    assert r2["gene"] is None
    assert r2["gnomad_af"] == 0.01  # first-of-list
    assert r0["consequence_text"] == "a missense variant"
    assert r0["clinvar_text"] == "pathogenic"
    assert r1["cds_region"] == "intron"
    assert r2["cds_region"] == "3_prime_utr"
    assert r0["hgvsp_parsed"]["kind"] == "substitution"


def test_report_rendering(spark):
    rows = [r.asDict(recursive=True) for r in V.clean_varsum_records(_records(spark)).collect()]
    rep = V.render_report(rows[0])
    assert "BRCA1" in rep and "heterozygous" in rep and "pathogenic" in rep
    assert "substitution of V" in rep
    assert V.render_report(rows[0]) == rep  # deterministic
    rep2 = V.render_report(rows[2])
    assert "frameshift" in rep2 and "3 prime utr" in rep2
