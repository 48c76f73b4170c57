"""xlsx_to_database_spark — a PySpark-native analytics + ETL engine.

A from-scratch Spark-first build of the capability surface of
``mayorandrew/xlsx-to-database`` (an xlsx -> relational-database ETL tool;
see SURVEY.md §0 for provenance: the reference checkout was empty, so the
surface is reconstructed from the driver's authoritative characterization
in BASELINE.json plus public knowledge of the tool class), extended with
the mandated LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) and a full relational core.

Layers
------
- Layer A (reference surface): xlsx -> typed DataFrame -> JDBC/parquet,
  via a custom PySpark Python Data Source (``sources/``).
- Layer B (extensions): dedup / similarity / text analysis / multimodal
  (``operators/``).
- Layer C (relational core): scans, joins, aggregations, windows, set
  ops, scalar functions, Structured Streaming (``queries/``, ``streaming/``).

Everything is public-API PySpark 4.x: DataFrame + SQL + Structured
Streaming + the Python Data Source API. No RDD code, no collect() in
operator paths, declarative plans so Catalyst/AQE optimize freely.
"""

from xlsx_to_database_spark.session import get_spark, tune_session

__all__ = ["get_spark", "tune_session"]
__version__ = "0.1.0"
