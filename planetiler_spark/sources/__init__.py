"""Sources: deterministic synthetic fixture generation + parquet table loading."""
