"""Readers/writers: CSV with sentinel cleaning, parquet, in-memory."""
