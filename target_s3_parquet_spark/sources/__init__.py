"""Sources & sinks: Singer message-log ingestion (the reference's whole
reason to exist), generic format readers, partitioned Parquet sinks, and
multimodal (binary payload) column plumbing."""
