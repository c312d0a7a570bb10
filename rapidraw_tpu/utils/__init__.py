"""Cross-cutting utilities: cache-key hashing, settings, caches."""
