"""Structured Streaming front-end (the `dlt sync` daemon analog)."""
