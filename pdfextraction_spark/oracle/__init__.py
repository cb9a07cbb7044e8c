"""Golden (loop-based) reference extractor — the pytest oracle.

Mirrors the deterministic core of /root/reference/services/* ; see
module docstrings for exact file:line parity citations.
"""

from .extract import extract_turn  # noqa: F401
