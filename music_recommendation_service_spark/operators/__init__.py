"""Reusable relational operator building blocks."""
