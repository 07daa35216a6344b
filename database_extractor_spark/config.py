"""Config loading + the query-knob dataclass.

Parity targets in the reference (/root/reference):
- ``load_config``               -> src/database_extractor/database_extractor.py:91-128
  (TOML/JSON/YAML by extension, raw bytes fallback)
- ``DataExtractorQueryConfig``  -> src/database_extractor/database_extractor.py:131-169
  (field names kept verbatim so reference configs like
  config/application.toml load unchanged; Mapping protocol so
  ``query_database(client, qt, **config)`` splats).

Spark-specific additions are kept in a separate dataclass section with
defaults that make them optional: ``source`` (parquet path / table name
replacing the InfluxDB bucket), column-name bindings (``time_col``,
``value_col``) and ``pivot_values`` (explicit pivot domain to skip the
distinct-scan pass at scale).
"""

from __future__ import annotations

import json
from collections.abc import Mapping
from dataclasses import dataclass, field
from pathlib import Path
from typing import Union

from database_extractor_spark.timeutil import DEFAULT_TIME_FORMAT, DeltaTime


def load_config(filepath: Union[str, Path]) -> Union[dict, bytes]:
    """Load a TOML / JSON / YAML config file by extension; bytes otherwise."""
    path = Path(filepath)
    if not path.exists():
        raise FileNotFoundError(f"File not found: {path}")

    suffix = path.suffix.lower()
    if suffix == ".json":
        return json.loads(path.read_text())
    if suffix in (".yaml", ".yml"):
        import yaml

        return yaml.safe_load(path.read_text())
    if suffix == ".toml":
        import tomllib

        return tomllib.loads(path.read_text())
    return path.read_bytes()


@dataclass
class DataExtractorQueryConfig(Mapping):
    """All query knobs, defaulted like the reference's dataclass.

    ``filter`` accepts an ANSI SQL boolean expression (the Spark-idiomatic
    replacement for the reference's Flux row-predicate strings like
    ``r["id"] =~ /.*/`` — use e.g. ``"id RLIKE '.*'"`` or
    ``"_measurement = 'liner_heater'"``).
    """

    time_format: str = DEFAULT_TIME_FORMAT
    delta_time_start: DeltaTime = None
    delta_time_end: DeltaTime = None
    tz_offset: int = 0
    bucket: str = ""          # kept for API familiarity; aliased to `source`
    columns_to_drop: list = None
    filter: str = "TRUE"
    column_key: str = "id"
    aggregate_function: str = "last"
    aggregate_window: str = "1 second"
    sort_by: list = None
    # --- Spark-native extensions (all optional) ---
    source: str = ""          # parquet path or registered table name
    time_col: str = "_time"
    value_col: str = "_value"
    pivot_values: list = None  # explicit pivot domain -> skips distinct scan

    def __post_init__(self):
        if self.delta_time_start is None:
            self.delta_time_start = DeltaTime()
        elif isinstance(self.delta_time_start, (tuple, list)):
            self.delta_time_start = DeltaTime(*self.delta_time_start)
        if self.delta_time_end is None:
            self.delta_time_end = DeltaTime()
        elif isinstance(self.delta_time_end, (tuple, list)):
            self.delta_time_end = DeltaTime(*self.delta_time_end)
        if self.sort_by is None:
            self.sort_by = ["_time", "_field"]
        if not self.source:
            self.source = self.bucket

    # Mapping protocol -> `**config` splat works like the reference's.
    def __getitem__(self, key):
        if key in self.__dict__:
            return self.__dict__[key]
        raise KeyError(f"{key} not found in DataExtractorQueryConfig")

    def __iter__(self):
        return iter(self.__dict__)

    def __len__(self):
        return len(self.__dict__)
