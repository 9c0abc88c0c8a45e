"""Scalar/array function packs: sensor-domain kernels and schema helpers."""
