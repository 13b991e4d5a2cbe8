"""Engine operators: index build, query, autocomplete, dedup, similarity."""
