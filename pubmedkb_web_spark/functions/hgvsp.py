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
    # insertion of a premature stop N residues downstream
    # (HGVSp_parser.py:41-46, e.g. p.Lys2_Leu3insTer12)
    ("ins_ter", re.compile(rf"^{_LOC}ins(?:Ter|\*)(?P<terlen>\d+|\?)$")),
    ("ins", re.compile(rf"^{_LOC}ins(?P<alt>(?:{_AA})+)$")),
    ("del", re.compile(rf"^{_LOC}del$")),
    ("dup", re.compile(rf"^{_LOC}dup$")),
    ("fs", re.compile(rf"^(?P<ref1>{_AA})(?P<pos1>\d+)(?P<alt>{_AA})?fs(?:(?P<ter>\*|Ter)(?P<fslen>\d+|\?))?$")),
    ("ext", re.compile(rf"^(?P<ref1>{_AA})(?P<pos1>\d+)(?P<alt>{_AA})?ext(?P<extarg>.*)$")),
    # mosaic substitution p.Trp24=/Cys (HGVSp_parser.py:130-157 '=/' decode)
    ("mosaic", re.compile(rf"^(?P<ref1>{_AA})(?P<pos1>\d+)=/(?P<alt>{_AA})?$")),
    # uncertain substitution p.Gly56Ala^Ser^Cys (HGVSp_parser.py:165-170)
    ("substitution_uncertain", re.compile(
        rf"^(?P<ref1>{_AA})(?P<pos1>\d+)(?P<alts>{_AA}(?:\^{_AA})+)$"
    )),
    ("synonymous", re.compile(r"^(?P<ref1>%s)(?P<pos1>\d+)=$" % _AA)),
    ("substitution", re.compile(rf"^(?P<ref1>{_AA})(?P<pos1>\d+)(?P<alt>{_AA})$")),
    # frameshift-or-start-lost p.MetGly1_?2 (HGVSp_parser.py:26-28)
    ("frameshift_or_start_lost", re.compile(r"^(?P<prefix>.+?)_\?(?P<pos1>\d+)$")),
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
        "ref_aa2": None, "pos_end": None, "alt_aa": None,
        "ext_kind": None, "ext_pos": None, "text": raw,
    }
    if not raw:
        return dict(none, text=None)
    s = raw.strip().replace("%3D", "=")  # url-encoded '=' (HGVSp_parser.py:10)
    if s.startswith("p."):
        s = s[2:]
    if s.startswith("(") and s.endswith(")"):  # predicted consequence
        s = s[1:-1]
    # translation-initiation-codon forms (HGVSp_parser.py:96-104)
    if s == "0":
        return dict(none, kind="no_protein", text="no protein is produced")
    if s == "Met1?":
        return dict(
            none, kind="start_unknown", ref_aa="M", pos_start=1,
            text="unknown consequence at the translation initiation codon",
        )
    for kind, pat in _PATTERNS:
        m = pat.match(s)
        if not m:
            continue
        g = m.groupdict()
        ref1 = decode_aa(g.get("ref1"))
        pos1 = int(g["pos1"]) if g.get("pos1") else None
        ref2 = decode_aa(g.get("ref2")) if g.get("ref2") else None
        pos2 = int(g["pos2"]) if g.get("pos2") else None
        if g.get("alts"):  # uncertain substitution: keep every option
            alt = "^".join(decode_aa(a) or a for a in g["alts"].split("^"))
        else:
            alt = _decode_seq(g["alt"]) if g.get("alt") else None
        ext_kind = ext_pos = None
        if kind == "ext":
            # decode the extension argument (HGVSp_parser.py:81-94):
            # N-terminal p.Met1ext-5 → new start at -5;
            # C-terminal p.Ter110GlnextTer17 → new stop 17 downstream
            arg = g.get("extarg") or ""
            if ref1 == "M" and pos1 == 1:
                ext_kind, ext_pos = "N-terminal", arg or None
            else:
                ext_kind = "C-terminal"
                ext_pos = arg.split("Ter")[-1].lstrip("*") or None
        text = _describe(kind, ref1, pos1, ref2, pos2, alt, g, ext_kind, ext_pos)
        return {
            "kind": kind, "ref_aa": ref1, "pos_start": pos1,
            "ref_aa2": ref2, "pos_end": pos2, "alt_aa": alt,
            "ext_kind": ext_kind, "ext_pos": ext_pos, "text": text,
        }
    return none


def _describe(kind, ref1, pos1, ref2, pos2, alt, g, ext_kind=None, ext_pos=None) -> str:
    loc = f"the {ordinal(pos1)} residue" if pos1 else "an unknown residue"
    rng = f"residues {pos1}-{pos2}" if pos2 else loc
    if kind == "substitution":
        return f"substitution of {ref1} at {loc} by {alt}"
    if kind == "substitution_uncertain":
        opts = alt.split("^")
        joined = (
            ", ".join(opts[:-1]) + f", or {opts[-1]}" if len(opts) > 2
            else " or ".join(opts)
        )
        return f"substitution of {ref1} at {loc} by {joined} (uncertain)"
    if kind == "mosaic":
        by = alt if alt else "an unchanged residue (mosaic wild-type)"
        return f"mosaic substitution of {ref1} at {loc} by {by}"
    if kind == "synonymous":
        return f"synonymous change at {loc} ({ref1} retained)"
    if kind == "delins":
        return f"deletion of {rng} with insertion of {alt}"
    if kind == "ins":
        return f"insertion of {alt} between {rng}"
    if kind == "ins_ter":
        terlen = g.get("terlen")
        return f"insertion of a stop codon {terlen} residues downstream between {rng}"
    if kind == "del":
        return f"deletion of {rng}"
    if kind == "dup":
        return f"duplication of {rng}"
    if kind == "fs":
        fslen = g.get("fslen")
        tail = f", terminating after {fslen} residues" if fslen and fslen != "?" else ""
        return f"frameshift at {loc}{tail}"
    if kind == "ext":
        if ext_kind == "N-terminal":
            where = f" with a new start at position {ext_pos}" if ext_pos else ""
            return f"N-terminal extension at {loc}{where}"
        where = f" with a new stop {ext_pos} residues downstream" if ext_pos else ""
        return f"C-terminal extension at {loc}{where}"
    if kind == "frameshift_or_start_lost":
        return "frameshift or start-lost change at the protein N-terminus"
    return "unknown protein change"


_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("ref_aa", T.StringType()),
        T.StructField("pos_start", T.IntegerType()),
        T.StructField("ref_aa2", T.StringType()),
        T.StructField("pos_end", T.IntegerType()),
        T.StructField("alt_aa", T.StringType()),
        T.StructField("ext_kind", T.StringType()),
        T.StructField("ext_pos", T.StringType()),
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
