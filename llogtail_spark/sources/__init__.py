"""Input connectors: parquet today, Iceberg behind an import-try
(the jars are not in this image — see reader.read_table)."""
