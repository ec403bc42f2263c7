"""Join operators (SURVEY.md §2.3).

The reference emulates anti/semi joins with dummy-column left joins plus
null filters (03_link_datasets.ipynb:1909-1921,2110-2126,3059-3065); Spark
has them as first-class join types — one shuffle, and Catalyst pushes
filters through them. Small sides should be broadcast: callers pass
``broadcast=True`` and the hash side ships to every executor instead of
shuffling the big fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anti_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    broadcast: bool = False,
) -> DataFrame:
    """J3: rows of ``left`` with no key match in ``right`` (the cascade's
    "exclude already-PIKed records" step)."""
    right = F.broadcast(right) if broadcast else right
    return left.join(right, on=on, how="left_anti")


def semi_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    broadcast: bool = False,
) -> DataFrame:
    """J4: rows of ``left`` with at least one key match in ``right``."""
    right = F.broadcast(right) if broadcast else right
    return left.join(right, on=on, how="left_semi")


def validated_one_to_one_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
) -> DataFrame:
    """J8: join asserting key uniqueness on both sides first — the Spark
    rendering of pandas ``merge(validate="1:1")``
    (reference 03_link_datasets.ipynb:3274-3285).

    The two count checks are cheap partial-agg jobs; at scale they read the
    (usually cached) inputs once each.
    """
    keys = [on] if isinstance(on, str) else list(on)
    for side, df in (("left", left), ("right", right)):
        total, distinct = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(*[F.col(k) for k in keys]).alias("d"),
        ).first()
        if total != distinct:
            raise ValueError(
                f"1:1 join validation failed on {side}: {total} rows, "
                f"{distinct} distinct keys {keys}"
            )
    return left.join(right, on=on, how=how)
