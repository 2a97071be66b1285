"""Standard relational surface (SURVEY §2.7 gap list): joins, windows,
sort/limit, set ops, distinct, rollup/cube, scalar functions."""

from __future__ import annotations
