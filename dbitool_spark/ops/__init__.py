"""Engine operators: projection, dedup, similarity, text analysis."""
