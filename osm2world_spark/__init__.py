"""osm2world_spark — a PySpark-native spatial tiling + join engine.

A from-scratch re-expression of the query semantics of tordanik/OSM2World
(reference at /root/reference, studied read-only) as idiomatic PySpark:

- slippy-map tile assignment (z12/z14) as pure Column expressions
  (reference: core/.../math/geo/TileNumber.java)
- S2 level-13 cell ids + an H3-analog hex grid as vectorized numpy
  pandas UDF encoders (functions/cells.py)
- point-in-polygon / segment-intersection / containment spatial
  self-join over a cell-cover explode (operators/spatial_join.py;
  reference: OSMToMapDataConverter.addOverlapBetween)
- kNN via grid k-ring expansion + window refinement (operators/knn.py;
  reference: LeastSquaresInterpolator.findNearestSites)
- raster<->vector zonal join (operators/zonal.py; reference: SRTMData)
- tile-by-tile decomposition with commit-manifest resume and
  per-partition lineage (plans/pipeline.py; reference: TilesetCommand)

All hot-path logic is pyspark.sql.functions Column math or Arrow-batched
numpy kernels — no per-row Python.
"""

__version__ = "0.1.0"
