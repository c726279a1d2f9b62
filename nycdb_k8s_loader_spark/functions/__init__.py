"""Scalar function pack: trigram similarity, slugify, fuzzy match."""
