"""Source/sink adapters: parquet always; Iceberg when its runtime jar is on
the classpath (import-try — not in this image)."""

# litvar: LitVar2 autocomplete REST source (SURVEY.md S6) — columnar parse
# + gated live fetch; see sources/litvar.py.
