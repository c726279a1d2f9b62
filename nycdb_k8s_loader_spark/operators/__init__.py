"""Operator packs: relational, dedup, similarity, text, multimodal."""
