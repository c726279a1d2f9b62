"""Typed source readers: CSV, Excel, multi-file unions."""
