"""Utilities: checkpointing, metrics, logging, profiling."""
