"""osm_pbf_spark — a PySpark-native spatial-join + tiling engine.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of the reference ``yurikpanic/osm-pbf`` (a C OSM-PBF
decoder + in-process r-tree + Postgres loader; see BASELINE.json:6):

- distributed OSM-PBF decode (zlib blobs, delta-coded dense nodes,
  string tables) via vectorized Arrow UDFs      -> ``sources.pbf_source``
- H3/S2-style hierarchical cell index (Morton)  -> ``functions.cells``
- point-in-polygon two-stage join               -> ``operators.spatial_join``
- exact kNN (brute / fixed two-round cell plan) -> ``operators.knn``
- raster<->vector tile assignment               -> ``operators.tiling``
- interleaved text+media document render        -> ``operators.docrender``
- Iceberg-shaped partitioned sink w/ resume     -> ``sink.iceberg_like``
- training-data ops (dedup / ANN / text)        -> ``operators.dedup`` etc.

Everything is DataFrame + vectorized pandas/Arrow UDFs; no RDDs, no
per-row Python UDFs (BASELINE.json:16).
"""

__version__ = "0.1.0"
