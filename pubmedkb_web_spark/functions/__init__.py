"""Scalar function library (SURVEY.md §2.8-§2.9).

JVM-side column expressions wherever a built-in exists; Arrow-vectorized
pandas UDFs only for the genuinely Python-bound pieces (difflib ratio, NFKC,
HGVSp parsing, erfc).
"""
