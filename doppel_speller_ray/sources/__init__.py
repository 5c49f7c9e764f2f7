"""Sources: parquet/csv readers with schema adapters, fixture generators."""
