"""Structured Streaming surface (events table)."""
