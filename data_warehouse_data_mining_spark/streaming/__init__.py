"""Structured Streaming builders and their batch mirrors."""
