"""Structured Streaming surface (SURVEY.md §2.10/§7.4 — no reference
counterpart; the reference is pure batch). Batch twins of every
streaming query here are oracle-checked in queries/events.py."""
