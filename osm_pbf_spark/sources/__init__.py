"""Sources: distributed PBF scan/decode + testdata parquet readers."""
