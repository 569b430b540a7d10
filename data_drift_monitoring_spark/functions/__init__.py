"""Scalar/verdict helper functions (severity chains, scoring, hashing)."""
