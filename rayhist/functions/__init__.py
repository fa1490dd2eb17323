"""Scalar function library: geodesic metrics, sketches, time binning."""
