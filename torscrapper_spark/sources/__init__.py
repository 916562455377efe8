"""Snapshot-table I/O (sandbox Iceberg stand-in)."""
