"""Scalar/enrichment column expressions."""
