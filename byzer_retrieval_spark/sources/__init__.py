"""Sources & sinks: the synthetic code corpus generator, corpus readers
(parquet/JSONL ingest), and the index store (tables + snapshot
manifests + resume)."""
