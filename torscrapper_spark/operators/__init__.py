"""Crawl dataflow operators (SURVEY.md §2.A)."""
