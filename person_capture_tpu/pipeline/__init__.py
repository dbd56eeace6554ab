"""Pipelines: batched pre-scan, main pass, caching, async export, engine."""
