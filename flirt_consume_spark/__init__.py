"""flirt_consume_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``ecohealthalliance/flirt-consume`` (a flight-schedule
ETL pipeline: parse -> validate -> enrich -> temporally expand ->
aggregate -> indexed sink), built Spark-first:

- every transform is a pure ``DataFrame -> DataFrame`` function usable
  in both batch (``spark.read``) and streaming (``spark.readStream``);
- built-in ``pyspark.sql.functions`` everywhere (JVM-side, codegen);
  Pandas UDFs only where built-ins genuinely cannot express semantics;
- Catalyst/AQE own physical planning; we declare logical plans only.

Reference provenance note: the reference snapshot at /root/reference
was empty at survey time (SURVEY.md §0); semantics are derived from
the driver contract and public knowledge of the flirt-consume ETL
dataflow. Citations in docstrings therefore point at SURVEY.md §2
operator rows rather than reference file:line.
"""

__version__ = "0.1.0"

from flirt_consume_spark.session import get_spark  # noqa: F401
from flirt_consume_spark.io import load_table, load_tables  # noqa: F401
