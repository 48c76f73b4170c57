"""Query modules: one per SURVEY.md §2 category.

Importing a module registers its (op id -> Spark fn, oracle SQL) pairs
with :mod:`xlsx_to_database_spark.registry`.
"""
