"""Map-column helpers shared by config merge (F20) and cookie jars (X3)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def map_override(base: Column, override: Column) -> Column:
    """Merge two map columns, ``override`` keys winning (dict.update
    semantics). Null-safe on either side; pure JVM expressions."""
    # Drop base entries whenever override *contains* the key, regardless of
    # the override value: element_at() returns NULL for both missing keys and
    # null VALUES, so filtering on it would keep a base key that override maps
    # to NULL and then map_concat would fail with DUPLICATED_MAP_KEY (and
    # dict.update semantics say a None-valued key still wins).
    return (
        F.when(base.isNull(), override)
        .when(override.isNull(), base)
        .otherwise(
            F.map_concat(
                F.map_filter(base, lambda k, v: ~F.map_contains_key(override, k)),
                override,
            )
        )
    )
