"""Spark-native operators: extraction, linking, CC, sampling, dedup,
similarity search, and text analysis."""
