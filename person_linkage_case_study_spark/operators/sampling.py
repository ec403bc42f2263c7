"""Deterministic (hash-based) seeded sampling — P11 done the scale-correct
way.

``DataFrame.sample(fraction, seed)`` is partition-DEPENDENT: the sampler
runs per partition off a seed derived from the partition index, so the
selected rows change whenever the input's layout changes (repartition,
AQE coalescing, file split sizing, a retry after executor loss). At 100 TB
that means a "seeded" sample is not reproducible run-to-run, and a
recomputed lost partition can silently disagree with its first
materialization mid-job.

``hash_sample`` keys the decision on row CONTENT instead: keep the row iff
``md5(seed ⊕ key) / 2³² < fraction``. Properties:

- deterministic across partitionings, retries, engines — the same
  (seed, key) always makes the same decision (reference seeded-sampling
  surface: ``02_generate_case_study_files.ipynb`` seeded noise draws,
  ``03_link_datasets.ipynb:1427`` estimate_u's seeded pair sampling);
- embarrassingly parallel: a scan-time filter, no shuffle, pushdown-safe;
- portable: DuckDB replicates it exactly (functions/hashing.py), so the
  catalog entry is value-hash oracle-checked, not rows-only;
- coordinated sampling for free: the same seed over two tables samples
  matching keys together (the trick behind sampled joins).

The md5 of a short key costs ~100ns/row JVM-side — noise next to the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MOD32, md5_hash32, md5_hash32_sql

#: field separator inside the hash key — keeps ("ab","c") ≠ ("a","bc")
_SEP = "\x1f"


def _key(seed: int, key_cols: Sequence[str]) -> Column:
    return F.concat_ws(_SEP, F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols])


def hash_sample(
    df: DataFrame, key_cols: Sequence[str], fraction: float, seed: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by content hash of ``key_cols``.

    ``key_cols`` should identify a row (a primary key) — duplicate keys are
    kept or dropped together, which is exactly what coordinated /
    entity-consistent sampling wants.
    """
    threshold = int(fraction * MOD32)
    return df.filter(md5_hash32(_key(seed, key_cols)) < F.lit(threshold))


def hash_sample_sql(key_cols: Sequence[str], fraction: float, seed: int = 0) -> str:
    """DuckDB WHERE-clause predicate replicating ``hash_sample`` exactly."""
    threshold = int(fraction * MOD32)
    return f"{_key_sql(seed, key_cols)} < {threshold}"


def _key_sql(seed: int, key_cols: Sequence[str]) -> str:
    cast_cols = ", ".join(f"CAST({c} AS VARCHAR)" for c in key_cols)
    return md5_hash32_sql(f"concat_ws(chr(31), '{seed}', {cast_cols})")


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: Sequence[str],
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-data rebalancing
    primitive (e.g. keep 100% of low-resource languages, 5% of English).

    A stratum absent from ``fractions`` is dropped (fraction 0). Same
    content-hash decision rule as ``hash_sample``, so the draw stays
    partition-independent and engine-portable; the per-stratum threshold
    rides in a broadcast literal map — no join, no shuffle, scan-time
    filter.
    """
    thr = F.lit(None).cast("long")
    for stratum, frac in fractions.items():
        thr = F.when(F.col(strata_col) == stratum, F.lit(int(frac * MOD32))).otherwise(thr)
    return df.filter(md5_hash32(_key(seed, key_cols)) < thr)


def stratified_hash_sample_sql(
    strata_col: str,
    fractions: dict[str, float],
    key_cols: Sequence[str],
    seed: int = 0,
) -> str:
    """DuckDB predicate replicating ``stratified_hash_sample``."""
    arms = " ".join(
        f"WHEN {strata_col} = '{s}' THEN {int(f * MOD32)}" for s, f in fractions.items()
    )
    return f"{_key_sql(seed, key_cols)} < (CASE {arms} ELSE NULL END)"


def hash_split(
    df: DataFrame,
    key_cols: Sequence[str],
    weights: dict[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket the content hash
    into cumulative weight ranges. Every engine/run/partitioning assigns
    the same row to the same split — the property random splits lose the
    moment data is re-read, and the reason leakage-free splits at 100 TB
    are hash-based. Weights must sum to ~1 (the last split absorbs the
    remainder of the hash range).
    """
    h = md5_hash32(_key(seed, key_cols))
    names = list(weights)
    edges = _cum_edges(weights)
    expr = None
    for name, hi in zip(names, edges + [MOD32]):
        cond = h < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(split_col, expr)


def hash_split_sql(
    key_cols: Sequence[str], weights: dict[str, float], seed: int = 0
) -> str:
    """DuckDB CASE expression replicating ``hash_split``'s split column."""
    names = list(weights)
    edges = _cum_edges(weights)
    h = _key_sql(seed, key_cols)
    arms = " ".join(
        f"WHEN {h} < {hi} THEN '{name}'" for name, hi in zip(names, edges + [MOD32])
    )
    return f"CASE {arms} END"


def _cum_edges(weights: dict[str, float]) -> list[int]:
    """Cumulative hash-range upper edges for all but the last split."""
    edges, acc = [], 0.0
    for w in list(weights.values())[:-1]:
        acc += w
        edges.append(int(acc * MOD32))
    return edges


def hash_shuffle(
    df: DataFrame,
    key_cols: Sequence[str],
    seed: int = 0,
    pos_col: str = "shuffle_pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle — assign every row its position in the
    order sorted by ``md5(seed ⊕ key)`` (ties broken by the key itself, so
    the order is total and reproducible). This is the pre-training
    "shuffle the corpus" step done the 100 TB way:

    - ``repartitionByRange`` on the hash spreads the sort across the
      cluster (one range exchange; NO single-reducer global window);
    - positions are minted as per-partition ranks plus broadcast
      cumulative offsets (the zipWithIndex recipe in DataFrame terms —
      the offsets table has one row per partition);
    - the offset computation re-reads the sorted shuffle output (classic
      two-job zipWithIndex cost; the exchange itself is reused from
      shuffle files, not recomputed). At extreme scale the same shape
      drops to ``mapPartitions`` with a running counter — same plan, one
      fewer pass.

    Reading the result ordered by ``pos_col`` yields the same training
    order on any cluster, any partitioning, any engine (DuckDB replica:
    ``row_number() OVER (ORDER BY hash, key) - 1``).

    Within-partition ranks come from ``monotonically_increasing_id``'s
    low 33 bits (a per-partition row counter over the sorted partition) —
    a narrow projection, NOT a window, so the range exchange is the ONLY
    data movement; a pid-partitioned window here would re-shuffle the
    whole dataset a second time.
    """
    from pyspark.sql import Window

    h = md5_hash32(_key(seed, key_cols))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    order_cols = ["__h", *key_cols]
    ranked = (
        df.withColumn("__h", h)
        .repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftrightunsigned("__mid", 33))
        .withColumn("__rn", F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)))
        .drop("__mid")
    )
    counts = ranked.groupBy("__pid").agg((F.max("__rn") + 1).alias("__cnt"))
    w_off = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )  # one row per range partition — bounded window on a tiny table
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        ranked.join(F.broadcast(offsets), on="__pid")
        .withColumn(pos_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__h", "__pid", "__rn", "__off")
    )


def hash_shuffle_sql(key_cols: Sequence[str], seed: int = 0) -> str:
    """DuckDB expression for ``hash_shuffle``'s position column."""
    tiebreak = ", ".join(key_cols)
    return f"row_number() OVER (ORDER BY {_key_sql(seed, key_cols)}, {tiebreak}) - 1"


def mixture_upsample(
    df: DataFrame,
    weights_by: str,
    weights: dict[str, float],
    key_cols: Sequence[str],
    seed: int = 0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Fractional-epoch corpus mixing: repeat each row ``w`` times where
    ``w`` is its source's mixture weight — ``floor(w)`` guaranteed copies
    plus one more iff the row's content hash lands under ``frac(w)``.

    This is the "epochs per dataset" primitive of LLM pre-training mixes
    (e.g. 3.3 epochs of wiki, 0.7 of web): deterministic per row (same
    hash-decision rule as ``hash_sample``, so re-runs/retries/engines
    agree), shuffle-free (a literal CASE for the weight, one ``explode``
    of a ``sequence`` at the scan — no join, no agg), and portable (the
    DuckDB replica pairs ``generate_series`` with the same md5 decision).
    Sources absent from ``weights`` get weight 0 (dropped). ``copy_col``
    numbers the copies 0..n-1 so downstream global shuffling
    (``hash_shuffle`` keyed on key+copy) spreads repeats apart.

    The per-source base count and fractional-copy hash threshold are
    computed driver-side as Python ints and enter BOTH the Spark plan and
    the SQL replica as identical integer literals (``_mixture_literals``)
    — engine-side float→int casts disagree at the margin (Spark ``cast``
    truncates, DuckDB rounds: a 2^-32-per-doc latent flake, r2 ADVICE),
    matching the established ``hash_sample`` literal pattern.
    """
    base = F.lit(None).cast("long")
    frac_thr = F.lit(None).cast("long")
    for src, wt in weights.items():
        b, t = _mixture_literals(wt)
        base = F.when(F.col(weights_by) == src, F.lit(b)).otherwise(base)
        frac_thr = F.when(F.col(weights_by) == src, F.lit(t)).otherwise(frac_thr)
    extra = (md5_hash32(_key(seed, key_cols)) < frac_thr).cast("long")
    n = (base + extra).alias("__n")
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )


def _mixture_literals(wt: float) -> tuple[int, int]:
    """(base copies, fractional-copy hash threshold) for one mixture
    weight, as plain ints — the same double arithmetic the engines would
    run (float mul then truncation), done ONCE driver-side so both the
    Spark CASE and the DuckDB CASE carry the identical literal."""
    w = float(wt)
    b = int(w)
    return b, int((w - b) * MOD32)


def mixture_upsample_sql(
    weights_by: str,
    weights: dict[str, float],
    key_cols: Sequence[str],
    seed: int = 0,
    copy_col: str = "copy_idx",
    table: str = "t",
) -> str:
    """DuckDB SELECT replicating ``mixture_upsample``: scalar
    ``generate_series`` (a LIST) unnested in the projection — DuckDB's
    table-function form rejects lateral column arguments. Compose as a
    subquery; the caller selects columns on top. Thresholds are the same
    integer literals the Spark plan carries (``_mixture_literals``)."""
    lits = {s: _mixture_literals(w) for s, w in weights.items()}
    base_arms = " ".join(
        f"WHEN {weights_by} = '{s}' THEN CAST({b} AS BIGINT)"
        for s, (b, _) in lits.items()
    )
    thr_arms = " ".join(
        f"WHEN {weights_by} = '{s}' THEN CAST({t} AS BIGINT)"
        for s, (_, t) in lits.items()
    )
    extra = (
        f"(CASE WHEN {_key_sql(seed, key_cols)} < "
        f"(CASE {thr_arms} ELSE NULL END) THEN 1 ELSE 0 END)"
    )
    n = f"((CASE {base_arms} ELSE NULL END) + {extra})"
    return (
        f"SELECT {table}.*, CAST(unnest(generate_series(0, {n} - 1)) AS BIGINT)"
        f" AS {copy_col} FROM {table} WHERE {n} > 0"
    )


def temperature_weights(
    counts: dict[str, int], temperature: float, target_total: float | None = None
) -> dict[str, float]:
    """Per-source mixture weights for temperature-``T`` resampling: the
    sampling probability of source s becomes ∝ ``counts[s]^(1/T)``
    (T=1 → natural distribution, T→∞ → uniform). Returned weights are
    *epoch multipliers* for ``mixture_upsample``: expected post-mix size
    matches ``target_total`` (default: the input total). Driver-side math
    on a #sources-sized dict — deliberately NOT a Spark job; feed it the
    output of a tiny groupBy-count collect."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    total = sum(counts.values())
    tgt = float(total if target_total is None else target_total)
    p = {s: c ** (1.0 / temperature) for s, c in counts.items()}
    z = sum(p.values())
    return {s: (p[s] / z) * tgt / counts[s] for s in counts if counts[s]}
