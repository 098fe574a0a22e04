"""Offline evidence / rehearsal tools (importable for the test suite)."""
