"""PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the capabilities of
evansiroky/timezone-boundary-builder (reference at /root/reference, studied
for behaviour only) as an idiomatic PySpark engine:

- Part A (boundary build): per-tzid ordered op-fold over source geometries
  (union / difference / intersect), post-processing, ocean gap-fill,
  pairwise overlap validation — mirrors reference index.js:791-867,
  1045-1202, 1223-1285.
- Part B (serving): two-stage spatial join (broadcast compact cell cover +
  exact vectorized ray-casting point-in-polygon), kNN for offshore points
  with 1852 m territorial-waters semantics, raster/vector tiles — over an
  Iceberg-style table of Common-Crawl-style web pages.

All geometry kernels are pure numpy inside vectorized pandas/Arrow UDFs;
no shapely / JTS / h3 dependency.
"""

__version__ = "0.1.0"
