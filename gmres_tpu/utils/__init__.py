"""Reporting, checkpointing, and profiling utilities."""
