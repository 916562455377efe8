"""Crawl wave-loop driver."""
