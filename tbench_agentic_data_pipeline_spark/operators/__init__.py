"""Operator families re-expressed Spark-first (SURVEY.md §2).

Each module pairs a reusable DataFrame-level API with the registered
oracle-checkable query forms that exercise it against the driver fixtures.
"""
