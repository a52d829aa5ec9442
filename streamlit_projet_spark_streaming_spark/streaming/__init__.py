"""Structured Streaming ingest/enrichment pipeline (the reconstructed
Consumer) + gold-table refresh."""
