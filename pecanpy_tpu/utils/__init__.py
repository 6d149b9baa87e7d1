"""Utilities: timing, progress reporting."""
