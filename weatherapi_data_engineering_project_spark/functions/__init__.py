"""Scalar expression builders (keys, text, exact-arithmetic helpers)."""
