"""Benchmark harnesses (importable so bench.py can reuse the roofline
measurement machinery)."""
