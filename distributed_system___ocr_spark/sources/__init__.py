"""Table sources: catalog seam (parquet-snapshot now, Iceberg later)
and a WARC reader for Common-Crawl-native input."""
