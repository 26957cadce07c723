"""empty: symbols only needed by the RandomChunkSEF0Dataset path (unused)."""
