"""Structured Streaming layer: windows, stateful ops, cron-driven triggers."""
