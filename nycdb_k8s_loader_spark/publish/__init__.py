"""Atomic publish protocol, created-table discovery, name resolution."""
