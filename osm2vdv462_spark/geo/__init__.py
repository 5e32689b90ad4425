"""Pure-numpy geospatial kernel: WKB codec, geometry math, grid cell index.

No shapely / h3 / GEOS — everything is implemented from scratch on numpy
arrays so it can run Arrow-vectorized inside pandas UDFs.
"""
