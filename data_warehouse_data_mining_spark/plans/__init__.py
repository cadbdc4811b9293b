"""Physical-plan introspection helpers."""
