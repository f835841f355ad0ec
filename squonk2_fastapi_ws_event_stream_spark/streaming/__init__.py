"""Structured Streaming pipeline + control plane."""
