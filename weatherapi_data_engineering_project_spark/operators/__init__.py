"""Composite operators built from stock DataFrame primitives."""
