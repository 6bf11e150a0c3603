"""Scalar and feature-engineering function surface (SURVEY §2.5, §2.8)."""
