"""Variant-report generation (VarSum) — record cleaning + template NLG.

Reference capability (/root/reference/VarSum_germline.py:15-277 record
cleaning; 740-752 randomized templates; /root/reference/VarSum_utils.py:3-76
CDS-position parsing and ClinVar/VEP translation maps). Re-expressed as:

- pure-column cleaning over a DataFrame of variant records ("." sentinel →
  null, first-of-list, genotype a/b classification — SURVEY.md P8/F17);
- CDS-position classification by the *, -, + markers (F9) via regexp
  cascade;
- HGVSp parsing via the functions.hgvsp struct UDF;
- sentence assembly with a seeded RNG (deterministic; SURVEY.md §7 #5).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hgvsp import ordinal, parse_hgvsp, parse_hgvsp_col

# public VEP consequence → readable phrase (VarSum_utils.py:37-76 capability)
VEP_TRANSLATION = {
    "missense_variant": "a missense variant",
    "synonymous_variant": "a synonymous variant",
    "stop_gained": "a stop-gain variant",
    "frameshift_variant": "a frameshift variant",
    "splice_donor_variant": "a splice-donor variant",
    "splice_acceptor_variant": "a splice-acceptor variant",
    "inframe_deletion": "an in-frame deletion",
    "inframe_insertion": "an in-frame insertion",
}
CLINVAR_TRANSLATION = {
    "Pathogenic": "pathogenic",
    "Likely_pathogenic": "likely pathogenic",
    "Uncertain_significance": "of uncertain significance",
    "Likely_benign": "likely benign",
    "Benign": "benign",
}


def _clean(col: str) -> Column:
    """'.' sentinel → null; first element of comma/'&'-joined lists
    (VarSum_germline.py:43-50)."""
    c = F.trim(F.col(col))
    first = F.split(c, r"[,&]")[0]
    return F.when((c == ".") | (c == ""), F.lit(None)).otherwise(F.trim(first))


def classify_genotype(gt: Column) -> Column:
    """'a/b' equal alleles → homozygous, else heterozygous
    (VarSum_germline.py:79-88)."""
    parts = F.split(gt, r"[/|]")
    return (
        F.when(gt.isNull() | (F.size(parts) < 2), F.lit(None))
        .when(parts[0] == parts[1], F.lit("homozygous"))
        .otherwise(F.lit("heterozygous"))
    )


def classify_cds_position(cds: Column) -> Column:
    """Exon/intron/UTR classification by the HGVS c. markers
    (VarSum_utils.py:3-18): '*' → 3'UTR, leading '-' → 5'UTR,
    internal +/- offset → intron, plain number → exon."""
    s = F.regexp_replace(cds, r"^c\.", "")
    return (
        F.when(cds.isNull(), F.lit(None))
        .when(s.startswith("*"), F.lit("3_prime_utr"))
        .when(s.startswith("-"), F.lit("5_prime_utr"))
        .when(s.rlike(r"^\d+[+-]\d+"), F.lit("intron"))
        .when(s.rlike(r"^\d+"), F.lit("exon"))
        .otherwise(F.lit("unknown"))
    )


def clean_varsum_records(df: DataFrame) -> DataFrame:
    """Raw string record table → typed, translated, parsed columns.

    Expects (any subset of): gene, hgvsp, hgvsc, genotype, consequence,
    clinvar, gnomad_af. Unknown translation keys pass through lowercased.
    """
    vep_map = F.create_map(*[F.lit(x) for kv in VEP_TRANSLATION.items() for x in kv])
    clinvar_map = F.create_map(*[F.lit(x) for kv in CLINVAR_TRANSLATION.items() for x in kv])
    return df.select(
        _clean("gene").alias("gene"),
        _clean("hgvsp").alias("hgvsp"),
        _clean("hgvsc").alias("hgvsc"),
        classify_genotype(_clean("genotype")).alias("zygosity"),
        F.coalesce(
            vep_map[_clean("consequence")], F.lower(_clean("consequence"))
        ).alias("consequence_text"),
        F.coalesce(
            clinvar_map[_clean("clinvar")], F.lower(F.regexp_replace(_clean("clinvar"), "_", " "))
        ).alias("clinvar_text"),
        (_clean("gnomad_af")).try_cast("double").alias("gnomad_af"),
        classify_cds_position(_clean("hgvsc")).alias("cds_region"),
        parse_hgvsp_col(_clean("hgvsp")).alias("hgvsp_parsed"),
    )


EN_TEMPLATES = [
    "The {gene} variant {hgvsp} ({consequence_text}) was detected in the {zygosity} state; it is {clinvar_text}.",
    "A {zygosity} {consequence_text} in {gene} ({hgvsp}) was found and is classified as {clinvar_text}.",
]


def render_report(row: dict, seed: int = 42) -> str:
    """One-variant English report. Deterministic template choice seeded by
    the record content (reference randomizes, VarSum_germline.py:740-752)."""
    rng = random.Random(f"{seed}:{row.get('gene')}:{row.get('hgvsp')}")
    tpl = rng.choice(EN_TEMPLATES)
    parsed = row.get("hgvsp_parsed") or {}
    filled = tpl.format(
        gene=row.get("gene") or "an unknown gene",
        hgvsp=row.get("hgvsp") or "variant",
        consequence_text=row.get("consequence_text") or "a variant",
        zygosity=row.get("zygosity") or "unknown-zygosity",
        clinvar_text=row.get("clinvar_text") or "unclassified",
    )
    extra = []
    if isinstance(parsed, dict) and parsed.get("text"):
        extra.append(f"At the protein level this is {parsed['text']}.")
    af = row.get("gnomad_af")
    if af is not None:
        extra.append(f"Its gnomAD allele frequency is {af:g}.")
    if row.get("cds_region") in ("intron", "3_prime_utr", "5_prime_utr"):
        extra.append(f"The change lies in the {row['cds_region'].replace('_', ' ')} region.")
    return " ".join([filled] + extra)
