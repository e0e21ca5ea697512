"""Host-side utilities: oracles, benchmarking helpers."""
