"""Distributed operators: render (slice-into-tiles), tile reduce (MVT +
raster patches), spatial joins, checkpointed pipeline driver."""
