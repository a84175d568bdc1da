"""Logical query surface: SearchQuery records, keyword parsing, filter
trees, and their compilation to Column expressions."""
