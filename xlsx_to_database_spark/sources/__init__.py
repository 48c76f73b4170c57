"""Sources & sinks (SURVEY.md §2.1): the xlsx Python Data Source (the
reference tool's input surface), plus parquet/csv/json scans and the
database sink abstraction."""

from xlsx_to_database_spark.sources.xlsx import XlsxDataSource, register_xlsx_source
from xlsx_to_database_spark.sources.xlsx_io import read_workbook, write_workbook

__all__ = ["XlsxDataSource", "register_xlsx_source", "read_workbook", "write_workbook"]
