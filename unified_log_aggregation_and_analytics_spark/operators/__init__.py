"""Operators: transforms, compat envelope, relational surface, LLM ops."""
