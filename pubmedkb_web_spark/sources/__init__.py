"""Source/sink adapters: parquet always; Iceberg when its runtime jar is on
the classpath (import-try — not in this image)."""
