"""Engine operators: graph traversal, hybrid search, pattern mining,
capsule budgeting, dedup, similarity, text analysis."""
