"""Source readers beyond parquet (SURVEY §2.1)."""
