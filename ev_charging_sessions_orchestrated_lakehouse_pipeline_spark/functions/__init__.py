"""Scalar-function layer (SURVEY.md §2.3) + oracle-stable aggregate helpers."""

from .cleaning import decode_map, fix_year, safe_div
from .oracle import davg, dsum, DEC

__all__ = ["decode_map", "fix_year", "safe_div", "davg", "dsum", "DEC"]
