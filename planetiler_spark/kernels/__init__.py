"""Pure vectorized-numpy kernels (no Spark imports).

These are the bit-faithful re-implementations of the reference's scalar math
(GeoUtils / TileCoord / Hilbert / FeatureGroup key packing), written as numpy
array functions so pandas UDFs can call them on whole Arrow batches.
"""
