"""Count-min sketch (Cormode & Muthukrishnan 2005) as DataFrame rows —
the frequency twin of the HLL distinct sketch (functions/hll.py).

Exact per-key counts need state proportional to the number of distinct
keys; a count-min sketch bounds state at d×w counters while answering
point frequency queries with a one-sided error: estimates never
undercount, and overcount by at most ε·N (ε = e/w) with probability
1-δ (δ = e^-d). Materializing the counters AS ROWS —
(group..., depth, bucket, cnt) — buys the same three properties the
HLL row form does:

- **mergeable**: counters are plain sums, so per-batch partials
  combine exactly in the batch-partitioned store pattern
  (operators/rollup.py) — an incrementally maintained frequency
  service over an unbounded key space;
- **engine-visible**: hashing is xxhash64 with the depth index as
  seed; updates are one partial-aggregated shuffle of d rows per
  input row into at most d×w groups;
- **bounded**: at most d×w rows per group regardless of input size
  (d=4, w=2048 → 8192 counters, ε≈0.13%, δ≈1.8%).

Point queries join the queried keys' (depth, bucket) coordinates
against the sketch and take the MIN over depths — never a scan of the
original data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 2048


def _bucket(key_col, depth_idx: int, width: int, portable: bool = False):
    """Counter coordinate for one hash row. ``portable=True`` derives
    the bucket from the first 32 md5 bits of ``"<depth>|<key>"`` —
    reproducible in any engine with md5 (the checkable-twin lever, same
    move as the minhash/simhash/DSIR twins); the xxhash64 default is
    the scale path (cheaper, seeded natively)."""
    if portable:
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit(depth_idx), F.col(key_col).cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(width),
        ).cast("int")
    return F.pmod(
        F.xxhash64(F.col(key_col).cast("string"), F.lit(depth_idx)), F.lit(width)
    ).cast("int")


def cms_partials(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    weight_col: str | None = None,
    portable: bool = False,
) -> DataFrame:
    """(group..., depth, bucket, cnt) counter rows for the keys in
    ``df`` (optionally weighted). One explode to d rows per input row,
    then one partial-aggregated shuffle into ≤ d×w groups.
    ``portable=True`` swaps the coordinate hash for md5 so the whole
    sketch replays in SQL (see ``_bucket``)."""
    group_cols = group_cols or []
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = df.select(
        *group_cols,
        w.alias("_w"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        _bucket(key_col, i, width, portable).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    )
    return (
        rows.select(*group_cols, "c.depth", "c.bucket", "_w")
        .groupBy(*group_cols, "depth", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*partials: DataFrame) -> DataFrame:
    """Sum counters coordinate-wise — the exact merge."""
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cms_point_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    portable: bool = False,
) -> DataFrame:
    """Estimated frequency for each key in ``keys`` (one row per key,
    plus group columns if the sketch is grouped): compute the key's d
    (depth, bucket) coordinates, join the sketch, take min(cnt) —
    absent coordinates mean a true zero. Never undercounts."""
    group_cols = group_cols or []
    coords = keys.select(
        key_col,
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        _bucket(key_col, i, width, portable).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, *group_cols, "c.depth", "c.bucket")
    joined = coords.join(sketch, [*group_cols, "depth", "bucket"], "left")
    return (
        joined.groupBy(key_col, *group_cols)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("approx_count"))
        .orderBy(key_col, *group_cols)
    )
