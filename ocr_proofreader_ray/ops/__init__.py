"""Reusable distributed operator building blocks (joins, sampling, hashing)."""
