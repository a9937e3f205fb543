"""Structured Streaming variants of the ingestion path + event analytics."""
