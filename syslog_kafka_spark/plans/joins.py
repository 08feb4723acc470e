"""Placeholder — populated incrementally."""
