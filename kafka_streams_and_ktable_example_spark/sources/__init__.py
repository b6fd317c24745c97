"""Sources: parquet table loaders and changelog synthesis."""

from .tables import TABLE_NAMES, load_table, register_tables
from .changelog import (
    CHANGELOG_SCHEMA,
    changelog_from_rows,
    orders_changelog,
    shareholders_changelog,
)
from .kafka import kafka_changelog_stream, parse_changelog_records

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "register_tables",
    "CHANGELOG_SCHEMA",
    "changelog_from_rows",
    "orders_changelog",
    "shareholders_changelog",
    "kafka_changelog_stream",
    "parse_changelog_records",
]
