"""Checkpointing, config, profiling utilities."""
