"""Spark DataFrame-level operators of the engine."""
