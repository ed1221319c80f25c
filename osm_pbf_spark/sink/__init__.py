"""Iceberg-shaped table sink: partitioned parquet + atomic JSON manifests."""
