"""database_extractor_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the public reference repo
``generalmattza/database-extractor`` (a time-series extraction pipeline:
InfluxDB bucket scan -> time-range filter -> timezone shift -> row
predicate -> long->wide pivot -> sort -> drop columns -> 1 s downsample
with take-last -> null-row pruning -> dated CSV sink, batched over date
ranges) as one lazy Spark DataFrame plan, and extends the surface with
general relational operators and LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Public API mirrors the reference's exports
(reference: src/database_extractor/__init__.py:4-13) so a user of the
reference can switch with minimal relearning:

- :class:`DeltaTime`, :func:`load_config`,
  :func:`construct_query_time_endpoints`  — driver-side parameter layer
- :class:`DataExtractorQueryConfig`        — query knob dataclass
- :func:`create_spark_client`              — replaces create_influxdb_client
- :func:`query_database`                   — the central pipeline composer
  (returns a *lazy* DataFrame instead of materialized pandas)
- :func:`query_data_for_day`, :func:`query_data_for_range` — batch modes
"""

from database_extractor_spark.timeutil import (
    DEFAULT_TIME_FORMAT,
    DeltaTime,
    construct_query_time_endpoints,
    generate_datetime_list,
    iter_days,
    shift_string_time,
    timezone_offset,
)
from database_extractor_spark.config import DataExtractorQueryConfig, load_config
from database_extractor_spark.session import create_spark_client, get_spark
from database_extractor_spark.extract import (
    query_database,
    query_data_for_day,
    query_data_for_range,
)

__all__ = [
    "DEFAULT_TIME_FORMAT",
    "DeltaTime",
    "load_config",
    "construct_query_time_endpoints",
    "shift_string_time",
    "timezone_offset",
    "generate_datetime_list",
    "iter_days",
    "DataExtractorQueryConfig",
    "create_spark_client",
    "get_spark",
    "query_database",
    "query_data_for_day",
    "query_data_for_range",
]
