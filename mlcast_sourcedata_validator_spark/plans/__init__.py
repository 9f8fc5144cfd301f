"""Concrete check suites (analog of the reference's specs/ packages)."""
