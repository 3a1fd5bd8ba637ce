"""Map-column helpers shared by config merge (F20) and cookie jars (X3)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def map_override(base: Column, override: Column) -> Column:
    """Merge two map columns, ``override`` keys winning (dict.update
    semantics). Null-safe on either side; pure JVM expressions."""
    return (
        F.when(base.isNull(), override)
        .when(override.isNull(), base)
        .otherwise(
            F.map_concat(
                F.map_filter(base, lambda k, v: F.element_at(override, k).isNull()),
                override,
            )
        )
    )
