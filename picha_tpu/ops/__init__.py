"""Compute ops: resize, colour conversion, codec pixel stages.

Each op has a host (numpy) reference implementation and a JAX
batched implementation; the two are held bit-identical (or ≤1 LSB where
float accumulation order differs) by the test suite.
"""
