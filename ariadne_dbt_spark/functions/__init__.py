"""Reusable column-level functions: tokenization, stemming, hashing."""
