"""Pallas/XLA device kernels: HDR tone-map family, color match, cleanup."""
