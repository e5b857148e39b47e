"""Structured Streaming operators: windowed aggregations, sessionization,
stateful dedup — plus a deterministic file-replay harness for testing."""
