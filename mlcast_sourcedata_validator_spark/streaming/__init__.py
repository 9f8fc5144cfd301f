"""Structured Streaming validation (foreachBatch wrapper)."""
