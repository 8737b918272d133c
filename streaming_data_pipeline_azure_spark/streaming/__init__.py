"""Structured Streaming pipeline assembly + load generator."""
