"""Compute ops: math core, projection, binning, rasterization, losses, kNN."""
