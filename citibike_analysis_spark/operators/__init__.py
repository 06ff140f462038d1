"""Composite dataflow operators.

Each operator is pure DataFrame composition (no RDDs, no Python UDFs in the
hot path) so Catalyst/AQE keep full visibility: predicate pushdown, partial
aggregation, broadcast decisions and skew handling all still apply.
"""
