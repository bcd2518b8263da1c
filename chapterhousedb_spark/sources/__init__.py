"""Data sources: sample fixture generator (reference create_sample_data parity)."""
