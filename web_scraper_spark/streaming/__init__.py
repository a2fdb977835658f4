"""Structured Streaming surface of the crawl engine."""
