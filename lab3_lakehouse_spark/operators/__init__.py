"""Operator library: thin, named, parameterized operators over stock
Spark primitives. Each module documents which reference behavior
(SURVEY.md §2 operator IDs, file:line into /root/reference) it
generalizes, and how the implementation scales to 100 TB.
"""
