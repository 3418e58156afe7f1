"""HGVS protein-change (p.) parser → typed fields + readable text.

Same capability as the reference's parser (/root/reference/
HGVSp_parser.py:18-109 dispatches on delins/ins/del/dup/fs/ext/substitution;
130-178 decodes amino acids incl. Ter). Written from scratch against the
public HGVS nomenclature (varnomen.hgvs.org); exposed both as a pure-Python
function (unit-testable, oracle) and as an Arrow-vectorized pandas UDF
returning a struct column.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

AA3_TO_1 = {
    "Ala": "A", "Arg": "R", "Asn": "N", "Asp": "D", "Cys": "C", "Gln": "Q",
    "Glu": "E", "Gly": "G", "His": "H", "Ile": "I", "Leu": "L", "Lys": "K",
    "Met": "M", "Phe": "F", "Pro": "P", "Ser": "S", "Thr": "T", "Trp": "W",
    "Tyr": "Y", "Val": "V", "Ter": "*", "Sec": "U", "Xaa": "X",
}
AA1 = set("ARNDCQEGHILKMFPSTWYVUX*")

_AA = r"(?:%s|[%s])" % ("|".join(AA3_TO_1), "".join(a for a in AA1 if a != "*") + r"\*")
_LOC = rf"(?P<ref1>{_AA})(?P<pos1>\d+)(?:_(?P<ref2>{_AA})(?P<pos2>\d+))?"

_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("delins", re.compile(rf"^{_LOC}delins(?P<alt>(?:{_AA})+)$")),
    ("ins", re.compile(rf"^{_LOC}ins(?P<alt>(?:{_AA})+)$")),
    ("del", re.compile(rf"^{_LOC}del$")),
    ("dup", re.compile(rf"^{_LOC}dup$")),
    ("fs", re.compile(rf"^(?P<ref1>{_AA})(?P<pos1>\d+)(?P<alt>{_AA})?fs(?:(?P<ter>\*|Ter)(?P<fslen>\d+|\?))?$")),
    ("ext", re.compile(rf"^(?P<ref1>{_AA})(?P<pos1>\d+)(?P<alt>{_AA})?ext(?P<extarg>.*)$")),
    ("synonymous", re.compile(r"^(?P<ref1>%s)(?P<pos1>\d+)=$" % _AA)),
    ("substitution", re.compile(rf"^(?P<ref1>{_AA})(?P<pos1>\d+)(?P<alt>{_AA})$")),
]


def decode_aa(s: str | None) -> str | None:
    """3-letter / 1-letter amino-acid code → 1-letter (Ter → '*')."""
    if not s:
        return None
    if s in AA3_TO_1:
        return AA3_TO_1[s]
    if len(s) == 1 and s in AA1:
        return s
    return None


def _decode_seq(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        if s[i : i + 3] in AA3_TO_1:
            out.append(AA3_TO_1[s[i : i + 3]])
            i += 3
        else:
            out.append(s[i] if s[i] in AA1 else "?")
            i += 1
    return "".join(out)


ORDINAL_SUFFIX = {1: "st", 2: "nd", 3: "rd"}


def ordinal(n: int) -> str:
    """1→1st, 2→2nd, … (reference semantics at HGVSp_parser.py:199-212 /
    VarSum_utils.py:20-35: 11-13 → th)."""
    if n % 100 in (11, 12, 13):
        return f"{n}th"
    return f"{n}{ORDINAL_SUFFIX.get(n % 10, 'th')}"


def parse_hgvsp(raw: str | None) -> dict:
    """Parse 'p.V600E' / 'p.Val600Glu' / 'p.(Val600Glu)' / delins/ins/del/
    dup/fs/ext/= forms → typed dict.

    Keys: kind, ref_aa, pos_start, ref_aa2, pos_end, alt_aa, text.
    Unparseable → kind='unknown', text=raw.
    """
    none = {
        "kind": "unknown", "ref_aa": None, "pos_start": None,
        "ref_aa2": None, "pos_end": None, "alt_aa": None, "text": raw,
    }
    if not raw:
        return dict(none, text=None)
    s = raw.strip()
    if s.startswith("p."):
        s = s[2:]
    if s.startswith("(") and s.endswith(")"):  # predicted consequence
        s = s[1:-1]
    for kind, pat in _PATTERNS:
        m = pat.match(s)
        if not m:
            continue
        g = m.groupdict()
        ref1 = decode_aa(g.get("ref1"))
        pos1 = int(g["pos1"]) if g.get("pos1") else None
        ref2 = decode_aa(g.get("ref2")) if g.get("ref2") else None
        pos2 = int(g["pos2"]) if g.get("pos2") else None
        alt = _decode_seq(g["alt"]) if g.get("alt") else None
        text = _describe(kind, ref1, pos1, ref2, pos2, alt, g)
        return {
            "kind": kind, "ref_aa": ref1, "pos_start": pos1,
            "ref_aa2": ref2, "pos_end": pos2, "alt_aa": alt, "text": text,
        }
    return none


def _describe(kind, ref1, pos1, ref2, pos2, alt, g) -> str:
    loc = f"the {ordinal(pos1)} residue" if pos1 else "an unknown residue"
    rng = f"residues {pos1}-{pos2}" if pos2 else loc
    if kind == "substitution":
        return f"substitution of {ref1} at {loc} by {alt}"
    if kind == "synonymous":
        return f"synonymous change at {loc} ({ref1} retained)"
    if kind == "delins":
        return f"deletion of {rng} with insertion of {alt}"
    if kind == "ins":
        return f"insertion of {alt} between {rng}"
    if kind == "del":
        return f"deletion of {rng}"
    if kind == "dup":
        return f"duplication of {rng}"
    if kind == "fs":
        fslen = g.get("fslen")
        tail = f", terminating after {fslen} residues" if fslen and fslen != "?" else ""
        return f"frameshift at {loc}{tail}"
    if kind == "ext":
        return f"extension at {loc}"
    return "unknown protein change"


_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("ref_aa", T.StringType()),
        T.StructField("pos_start", T.IntegerType()),
        T.StructField("ref_aa2", T.StringType()),
        T.StructField("pos_end", T.IntegerType()),
        T.StructField("alt_aa", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def hgvsp_udf() -> F.udf:
    """Arrow-vectorized struct-returning parser column."""

    @F.pandas_udf(_STRUCT)
    def parse(raws: pd.Series) -> pd.DataFrame:
        rows = [parse_hgvsp(r) for r in raws]
        return pd.DataFrame(rows)

    return parse


def parse_hgvsp_col(col: Column) -> Column:
    return hgvsp_udf()(col)
