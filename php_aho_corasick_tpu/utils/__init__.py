"""Shared utilities: logging, profiling hooks, serialization helpers."""
