"""Reusable relational building blocks + extension operators.

- ``relational``  : bucketing, top-k per group (QUALIFY emulation), ordered
                    array_agg, pivot, histogram, latest-N (SURVEY.md §2.B-G)
- ``dedup``       : exact + fuzzy deduplication (extension layer)
- ``similarity``  : embedding similarity search (extension layer)
- ``text``        : text analysis operators (extension layer)
- ``multimodal``  : binary-column (image/audio) plumbing (extension layer)
"""
