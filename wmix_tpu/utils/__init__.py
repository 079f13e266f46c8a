"""Shared utilities: tracing/profiling instrumentation."""
