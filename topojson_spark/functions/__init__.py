"""Vectorized numpy kernels + Spark column helpers used inside Arrow UDFs."""
