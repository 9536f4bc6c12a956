"""Reusable operator implementations (dedup, similarity, text, CDC)."""
