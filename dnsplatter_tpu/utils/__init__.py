"""Shared utilities: profiling, logging."""
