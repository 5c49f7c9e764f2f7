"""Cross-stage state: connected components, IDF tables, broadcasts."""
