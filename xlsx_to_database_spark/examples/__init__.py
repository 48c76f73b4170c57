"""Runnable examples OUTSIDE the verified op contract.

Everything registered in `xlsx_to_database_spark.registry` carries a
driver/mirror correctness signal. Code here is the opposite: correct by
construction and unit-testable on a real cluster, but impossible to
execute in this sandbox (missing system dependency), so it is kept out
of the registry rather than counted as a verified op (round-4 verdict
item 4 — the contract lists only verifiable ops).
"""
