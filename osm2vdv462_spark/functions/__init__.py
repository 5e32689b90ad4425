"""Scalar function library: unit parsers, tag-map helpers, XML builders,
image codec. All pure column expressions or Arrow-vectorized UDFs.
"""
