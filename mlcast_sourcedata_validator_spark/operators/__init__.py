"""Check implementations. Each module exposes ``compile_*`` functions that
turn a declarative CheckSpec into a compiled contribution (see suite.py)."""
