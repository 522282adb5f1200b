"""automotive_big_data_analysis_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``z131f/Automotive-big-data-analysis`` (a Flask + Hive car
analytics service), re-expressed Spark-first:

* the reference's storage/SQL layer (Hive TEXTFILE + impyla SQL strings,
  reference ``backend/utils.py``) becomes parquet + Catalyst;
* the reference's client-side Python analytics (reference
  ``backend/app.py:33-164,282-481``) become DataFrame operators that the
  optimizer plans end-to-end;
* beyond reference parity, the engine adds the operators a large-scale
  training-data pipeline needs: dedup, similarity search, text analysis,
  and event-time windows.

Everything here targets a real multi-executor cluster: filters/projections
push to the scan, small dimensions broadcast, aggregations combine
map-side, and nothing round-trips through the driver.
"""

from automotive_big_data_analysis_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
