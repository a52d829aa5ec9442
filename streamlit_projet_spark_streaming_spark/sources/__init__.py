"""Batch and streaming sources (SURVEY.md §2.A)."""

from .catalog import TABLES, load_table, register_tables

__all__ = ["TABLES", "load_table", "register_tables"]
