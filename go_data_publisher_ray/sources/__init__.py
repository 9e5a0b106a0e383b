"""Sources: the synthetic CDC log generator and parquet read helpers."""
