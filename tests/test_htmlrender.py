"""HTML escaping + presentation rendering parity (SURVEY.md F7/S10).

Every expectation below is produced by a verbatim-logic Python replica
of the reference function (stdlib ``html.escape``,
``kb_utils.get_html_anchor`` kb_utils.py:524-548,
``kb_utils.get_paper_meta_html`` kb_utils.py:1834-1868,
``PaperQA.get_reference`` kb_utils.py:1362-1376) — never by running the
engine.
"""

from __future__ import annotations

import html

from pyspark.sql import functions as F

from pubmedkb_web_spark.functions import htmlrender as H

NASTY = [
    "plain text",
    '<script>alert("x & y")</script>',
    "O'Brien & Sons <em>",
    "",
    "a&amp;b already-escaped",
    "ünïcödé <tag> & 'quotes' \"too\"",
    "ends with &",
]


def test_html_escape_matches_stdlib(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(NASTY)], "i int, s string")
    got = {
        r["i"]: r["e"]
        for r in df.select("i", H.html_escape("s").alias("e")).collect()
    }
    for i, s in enumerate(NASTY):
        assert got[i] == html.escape(s, quote=True)


def test_html_escape_sql_matches_stdlib():
    import duckdb

    con = duckdb.connect()
    expr = H.html_escape_sql("s")
    for s in NASTY:
        (out,) = con.execute(f"SELECT {expr} FROM (SELECT ? AS s)", [s]).fetchone()
        assert out == html.escape(s, quote=True)


def test_url_quote_matches_urllib(spark):
    """url_quote == urllib.parse.quote (default safe='/') — the href twin
    of PaperQA.get_reference's pmid_url (kb_utils.py:1366). Exercises all
    four URLEncoder/quote divergences (space, '*', '~', '/') plus the
    collision-bait inputs whose encodings contain the fix-up patterns."""
    import urllib.parse

    cases = [
        "12345",
        "PMID 678",            # space
        "a*b~c/d",             # all three punctuation divergences
        "lit+plus",            # input '+' must stay %2B, not become %20
        "pre%7Epost",          # input '%7E' must stay %257E, not '~'
        "pct%2Fslash",         # input '%2F' must stay %252F, not '/'
        'q"uo\'te<>&',
        "ünïcödé 漢字",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i int, s string")
    got = {r["i"]: r["q"] for r in df.select("i", H.url_quote("s").alias("q")).collect()}
    for i, s in enumerate(cases):
        assert got[i] == urllib.parse.quote(s), s


def _ref_gene_anchor(gene_id, symbol, taxon):
    # verbatim logic of kb_utils.get_html_anchor (kb_utils.py:524-548)
    if symbol:
        html_symbol = html.escape(symbol)
        if taxon:
            html_l = html.escape("[")
            html_r = html.escape("]")
            html_taxon = html.escape(taxon)
            return (
                f'<a href="https://www.ncbi.nlm.nih.gov/gene/{gene_id}">'
                f"{html_symbol} {html_l} <i>{html_taxon}</i> {html_r}"
                f"</a>"
            )
        return (
            f'<a href="https://www.ncbi.nlm.nih.gov/gene/{gene_id}">'
            f"{html_symbol}"
            f"</a>"
        )
    return (
        f'<a href="https://www.ncbi.nlm.nih.gov/gene/{gene_id}">'
        f"GENE:{gene_id}"
        f"</a>"
    )


def test_gene_anchor_parity(spark):
    cases = [
        ("672", "BRCA1", "human"),
        ("672", "BRCA<1>", None),
        ("7157", "", "mouse"),  # falsy symbol -> GENE:id even with taxon
        ("11998", None, None),
        ("1", "A&B", "rat 'x'"),
    ]
    df = spark.createDataFrame(
        [(i, g, s, t) for i, (g, s, t) in enumerate(cases)],
        "i int, gene_id string, symbol string, taxon string",
    )
    got = {
        r["i"]: r["a"]
        for r in df.select(
            "i", H.gene_html_anchor("gene_id", "symbol", "taxon").alias("a")
        ).collect()
    }
    for i, (g, s, t) in enumerate(cases):
        assert got[i] == _ref_gene_anchor(g, s, t), (g, s, t)


def _ref_paper_meta_html(pmid, meta):
    # verbatim logic of kb_utils.get_paper_meta_html (kb_utils.py:1834-1868)
    title = meta["title"]
    if title and title[-1] not in [".", "?", "!"]:
        title = title + "."
    title_html = html.escape(title)
    title_html = (
        f'<a href="https://pubmed.ncbi.nlm.nih.gov/{pmid}">'
        f"[{html.escape(pmid)}]</a> {title_html}"
    )
    year = meta["year"]
    if year:
        year = year + "."
    year = html.escape(year)
    journal = meta["journal"]
    if journal and journal[-1] not in [".", "?", "!"]:
        journal = journal + "."
    journal_html = html.escape(journal)
    journal_html = f"<em>{journal_html}</em>"
    doi = meta["doi"]
    if doi:
        doi_html = html.escape(f"doi.org/{doi}")
        doi_html = f'<a href="https://doi.org/{doi}">{doi_html}</a>'
    else:
        doi_html = ""
    publication_type = ", ".join(
        html.escape(_type) for _type in meta["publication_type_list"]
    )
    if publication_type:
        publication_type += "."
    citation = meta["citation"]
    citation_html = html.escape(f"Cited by {citation}.")
    return f"{title_html} {year} {journal_html} {doi_html} {publication_type} {citation_html}"


def test_paper_meta_parity(spark):
    metas = [
        ("100", {"title": "A <great> result", "year": "2021", "journal": "Nature & Son",
                 "doi": "10.1/ab<1>", "publication_type_list": ["Review", "Meta <x>"],
                 "citation": "42"}),
        ("201", {"title": "Ends in dot.", "year": "", "journal": "J?",
                 "doi": "", "publication_type_list": [], "citation": "0"}),
        ("302", {"title": "", "year": "1999", "journal": "",
                 "doi": "10.5/x", "publication_type_list": ["Trial"], "citation": "7"}),
        ("403", {"title": "Q?", "year": "2020", "journal": "Cell!",
                 "doi": "", "publication_type_list": ["A", "B", "C"], "citation": "1,000"}),
    ]
    df = spark.createDataFrame(
        [
            (i, p, m["title"], m["year"], m["journal"], m["doi"],
             m["publication_type_list"], m["citation"])
            for i, (p, m) in enumerate(metas)
        ],
        "i int, pmid string, title string, year string, journal string, "
        "doi string, pts array<string>, citation string",
    )
    got = {
        r["i"]: r["h"]
        for r in df.select(
            "i",
            H.paper_meta_html(
                "pmid", "title", "year", "journal", "doi", "pts", "citation"
            ).alias("h"),
        ).collect()
    }
    for i, (p, m) in enumerate(metas):
        assert got[i] == _ref_paper_meta_html(p, m), (p, m)


def test_paper_meta_null_fields_act_as_empty(spark):
    """NULL meta fields (left-join misses) render exactly like the
    reference's empty-string fields — every f-string separator space
    survives and the pmid anchor never drops (round-5 ADVICE)."""
    df = spark.createDataFrame(
        [(0, "77", None, None, None, None, None, None)],
        "i int, pmid string, title string, year string, journal string, "
        "doi string, pts array<string>, citation string",
    )
    (row,) = df.select(
        H.paper_meta_html(
            "pmid", "title", "year", "journal", "doi", "pts", "citation"
        ).alias("h")
    ).collect()
    empty_meta = {"title": "", "year": "", "journal": "", "doi": "",
                  "publication_type_list": [], "citation": ""}
    assert row["h"] == _ref_paper_meta_html("77", empty_meta)


def test_reference_list_pmid_href_is_percent_encoded(spark):
    """A non-numeric pmid cannot break out of the href attribute: the
    quote twin percent-encodes it exactly as kb_utils.py:1366."""
    import urllib.parse

    hostile = 'x"><script>alert(1)</script>'
    df = spark.createDataFrame([(1, hostile, "t")], "o int, pmid string, title string")
    (row,) = H.reference_list_html(df, order_by="o").collect()
    assert urllib.parse.quote(hostile) in row["html"]
    assert '"><script>' not in row["html"]


def test_table_html_hostile_header(spark):
    """Header labels are caller input — a hostile column name must be
    escaped in the <th> (round-5 VERDICT next-round #6)."""
    import html as _html

    bad = 'name"><script>x</script>'
    df = spark.createDataFrame([(1, "v")], f"rank int, `{bad}` string")
    (row,) = H.table_html(df, ["rank", bad], order_by="rank").collect()
    assert f"<th>{_html.escape(bad)}</th>" in row["html"]
    assert "<script>" not in row["html"]


def test_reference_list_html(spark):
    # verbatim-logic expectation from PaperQA.get_reference is_html=True
    # (kb_utils.py:1362-1376); pmid order = the page's order_by
    papers = [("11", "First & last"), ("2", 'T<i>tle "two"'), ("33", "x")]
    import urllib.parse

    lines = ["References"]
    for pmid, title in sorted(papers, key=lambda p: int(p[0])):
        pmid_url = urllib.parse.quote(pmid)
        lines.append(
            f'<a href="https://pubmed.ncbi.nlm.nih.gov/{pmid_url}">'
            f"{html.escape(f'[PMID-{pmid}]')}</a> {html.escape(title)}"
        )
    expected = "<br />".join(lines)

    df = spark.createDataFrame(
        [(int(p), p, t) for p, t in papers],
        "o int, pmid string, title string",
    )
    (row,) = H.reference_list_html(df, order_by="o").collect()
    assert row["html"] == expected


def test_table_html_order_and_escape(spark):
    df = spark.createDataFrame(
        [(2, "b&b", 20), (1, "<a>", 10), (3, 'c"c', 30)],
        "rank int, name string, n int",
    )
    (row,) = H.table_html(
        df, ["rank", "name", "n"], widths=["10%", "60%", "30%"], order_by="rank"
    ).collect()
    assert row["html"] == (
        '<table><tr><th style="width:10%">rank</th>'
        '<th style="width:60%">name</th><th style="width:30%">n</th></tr>'
        "<tr><td>1</td><td>&lt;a&gt;</td><td>10</td></tr>"
        "<tr><td>2</td><td>b&amp;b</td><td>20</td></tr>"
        "<tr><td>3</td><td>c&quot;c</td><td>30</td></tr></table>"
    )
