"""End-to-end pipelines composed from sources/operators/sink."""
