"""Composite operators: kNN joins, dedup families, sampling,
extraction pipeline stages, evaluation aggregations."""
