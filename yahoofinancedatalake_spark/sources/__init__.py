"""Sources and sinks: schema-enforced JSONL bronze, Parquet silver/gold,
keyed-upsert serving tables (the ES-index replacement)."""
