"""Scalar/vector function helpers — JVM-side expressions first."""
