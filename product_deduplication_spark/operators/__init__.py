"""Relational dedup operators composed from DataFrame primitives.

Each module documents which reference operator(s) from SURVEY.md §2 it
re-expresses and cites the reference file:line it derives semantics from.
"""
