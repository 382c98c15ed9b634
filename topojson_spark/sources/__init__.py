"""Input adapters: interleaved documents corpus + in-memory dict features."""
