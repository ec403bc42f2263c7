"""The PVS linkage cascade (SURVEY.md §3.3, §7.1 step 6).

The reference's ``PersonLinkageCascade`` / ``PersonLinkageModule``
(03_link_datasets.ipynb:1781-2234) orchestrates 4 modules × up to 5 passes:
each pass equi-joins the not-yet-linked input file against a reference file
on cut+blocking columns, scores the pairs with a trained Fellegi-Sunter
model restricted to the pass's matching columns, keeps pairs over a
probability threshold, and removes the linked records; each module ends by
confirming at most one PIK per raw input record.

Spark-first shape: the whole pass is ONE DataFrame pipeline
(block-join → gamma → score → filter), and the cascade is a driver loop
over persisted DataFrames — the reference's engine-boundary parquet
round-trips (steps 2/6 of §3.3) disappear. Cross-pass state is persisted
and the previous state unpersisted each pass so lineage doesn't grow
(reference clears checkpoints at the same points, K12).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..operators.blocking import (
    PairStats,
    blocked_pairs,
    derive_pair_pin,
    derive_pin_cap,
    derive_salt,
    estimate_pair_row_bytes,
    estimate_pair_stats,
)
from ..operators.dedup import keep_best, max_per_group_with_ties
from ..operators.joins import anti_join
from ..operators.scoring import LinkageModel, score_pairs
from ..session import shuffle_partitions

CENSUS_DAY = "2030-04-01"


def switch_first_and_last_names(df: DataFrame) -> DataFrame:
    """Name-switch input transformation for the transposed-name passes
    (reference 03_link_datasets.ipynb:2496-2520): swap every first_*/last_*
    derived column pair."""
    pairs = [
        (c, "last_" + c.removeprefix("first_"))
        for c in df.columns
        if c.startswith("first_") and ("last_" + c.removeprefix("first_")) in df.columns
    ]
    out = df
    for fcol, lcol in pairs:
        out = out.withColumnRenamed(fcol, "__tmp__").withColumnRenamed(
            lcol, fcol
        ).withColumnRenamed("__tmp__", lcol)
    return out


#: the schema :meth:`PersonLinkageCascade.build_pass_links` actually emits
#: (name, typeName) — the checkpoint gate's initial row-width derivation
#: uses this template before any pass exists; a test pins it against the
#: real ``build_pass_links`` output so the two can't drift (r11).
LINKS_FRAME_TEMPLATE: tuple[tuple[str, str], ...] = (
    ("record_id_census_2030", "string"),
    ("record_id_reference_file", "string"),
    ("record_id_raw_input_file", "string"),
    ("match_weight", "double"),
    ("match_probability", "double"),
    ("module_name", "string"),
    ("pass_name", "string"),
)


def estimate_checkpoint_row_bytes(fields: "object") -> int:
    """Estimated DESERIALIZED JVM bytes of one checkpointed row — the
    numerator unit for :func:`derive_checkpoint_storage` (r11: the gate
    used a constant 350 B/row while the pin/salt derivations had already
    graduated to schema-derived widths — the same hole-class, reachable
    via row WIDTH instead of row count: a links frame with many wide
    columns under-gated; r10 verdict top-next).

    A locally-checkpointed block stores ``GenericInternalRow`` objects,
    not UnsafeRows, so the model is object-per-field: ~40 B row fixture
    (row object header + values-array reference + ``Object[]`` header),
    8 B per element slot, then per field a boxed primitive (~16 B) or a
    ``UTF8String`` + backing ``byte[]`` (~48 B for the short name/id
    strings these frames carry); arrays/maps/binary get a coarse 64.

    Calibration: the links template (5 strings + 2 doubles) estimates
    368 B vs the 512×-ladder's OBSERVED ~330 B/row deserialized — ~11%
    conservative, and both measured bracket points stay on their sides
    of the half-heap gate (76.8M × 368 = 28.3 GB ≤ 32 GB on-heap fine;
    153.6M × 368 = 56.5 GB > 32 GB flips to DISK_ONLY, the rung that
    OOM'd).

    ``fields`` is a pyspark ``StructType`` (iterating yields
    ``StructField``) or the template's ``(name, typeName)`` tuples."""
    total = 40  # row object + values-array ref + Object[] header
    for f in fields:
        type_name = f[1] if isinstance(f, tuple) else f.dataType.typeName()
        total += 8  # Object[] element slot
        if type_name == "string":
            total += 48  # UTF8String header + short byte[] payload
        elif type_name in ("array", "map", "struct", "binary"):
            total += 64
        else:
            total += 16  # boxed primitive
    return total


def derive_checkpoint_storage(
    frame_rows: int | None,
    heap_bytes: int | None,
    *,
    row_bytes: int = 350,
    heap_fraction: float = 0.5,
) -> StorageLevel | None:
    """Auto-derived storage level for 'local' checkpoints, or ``None``
    to keep Spark's on-heap-first default — the checkpoint analog of
    :func:`derive_pair_pin` / :func:`derive_salt` (r9 closed the pin and
    salt knobs; this closes the one the 1024× OOM fix introduced, so a
    caller who sets nothing survives the mega regime too).

    Measured bracket (in-process ladder, 64 g heap): the 512× rung's
    76.8M-row links frame (~25 GB deserialized at the observed ~330
    B/row) checkpointed on-heap FINE; the 1024× rung's 153.6M-row frame
    (~51 GB) OOM'd a shuffle writer while 32 tasks unrolled partitions
    concurrently. ``heap_fraction=0.5`` keeps both measured points on
    their correct sides: flip to DISK_ONLY when the frame's estimated
    deserialized bytes exceed half the executor heap. ``row_bytes``
    defaults to the bracket's calibrated constant, but the cascade now
    passes :func:`estimate_checkpoint_row_bytes` of the links frame's
    ACTUAL schema (r11 — a wide links frame flips at proportionally
    fewer rows; the template schema derives 368, within 11% of the
    observed 330). On a multi-executor cluster the comparison (TOTAL rows vs ONE
    executor's heap) is conservative — it flips to disk sooner than
    strictly needed, which at 100 TB is the posture you want anyway
    (node-local-disk checkpoints, zero MemoryStore pressure).

    ``frame_rows`` proxy (r10, advisor): the cascade seeds this with the
    CENSUS row count — exact when link rate ≈ 1 (the whole ladder), an
    UNDERCOUNT for a pass whose links multiply census rows (nickname-
    style record multiplication) or whose row width exceeds
    ``row_bytes``. The cascade therefore RE-derives per pass with
    ``max(census_rows, K8 pair estimate)`` and escalates to DISK_ONLY
    mid-run the moment any pass's pair bound flips the gate (escalation
    is one-way — a level already derived never downgrades mid-run, so
    checkpoint behavior stays monotone). The pair estimate upper-bounds
    the links frame (links ⊆ scored pairs), so the escalated gate can
    only fire early — the conservative side."""
    if not frame_rows or not heap_bytes:
        return None
    if frame_rows * row_bytes > heap_fraction * heap_bytes:
        return StorageLevel.DISK_ONLY
    return None


@dataclass
class PassConfig:
    name: str
    blocking_columns: list[str]
    probability_threshold: float = 0.97
    input_data_transformation: Callable[[DataFrame], DataFrame] | None = None
    # splits hot blocking keys across n salt lanes (blocked_pairs
    # salt_partitions — the reference's salting_partitions,
    # 03_link_datasets.ipynb:1971-1975). None (default) = AUTO-DERIVE
    # from the per-key max pair product in the K8 estimate (r9:
    # derive_salt — the pin below spreads DISTINCT keys but hash
    # partitioning still sends one monster key's every pair to ONE
    # task, so a pass author who forgot this knob re-entered the
    # serial regime even with the r8 auto-pin); an explicit int
    # overrides (1 disables salting); the cascade's auto_pin=False
    # disables derivation entirely.
    salt_partitions: int | None = None
    # pins the block join's shuffle partitioning (blocked_pairs
    # num_partitions). Needed whenever the pass's INPUT is small but its
    # pair OUTPUT is not: AQE coalesces post-shuffle partitions by input
    # bytes — and zstd crushes a salted pass's replicated reference side,
    # so even salt_partitions can collapse back into ONE reduce task that
    # then scores every pair serially (measured r7: a 150k-record corpus
    # with a 176M-pair hot block ran 932s no-pin vs ~the same WITH salt
    # but no pin; pinning restores the spread). Big inputs don't need it
    # — their own bytes keep AQE partition counts high (the 512x ladder).
    # None (default) = AUTO-DERIVE from the K8 pair estimate (r8:
    # derive_pair_pin — the manual knob silently re-entered the serial
    # regime when forgotten); an explicit int overrides; the cascade's
    # auto_pin=False disables derivation entirely.
    num_partitions: int | None = None


@dataclass
class ModuleConfig:
    name: str
    reference_file_name: str
    cut_columns: list[str]
    matching_columns: list[str]
    passes: list[PassConfig]
    bayes_factor_cut_columns: float = 1.0


@dataclass
class CascadeConfig:
    modules: list[ModuleConfig]


@dataclass(frozen=True)
class PassPlan:
    """A pass's resolved physical knobs (see ``resolve_pass_plan``):
    the effective partition pin and salt for ``blocked_pairs``, plus the
    K8 estimate that derived them (``stats`` is None when the estimate
    wasn't needed — both knobs explicit and stats not requested)."""

    stats: PairStats | None
    num_partitions: int | None
    salt_partitions: int | None


@dataclass
class PassStats:
    module: str
    pass_name: str
    n_pairs_estimated: int
    n_links: int
    n_still_eligible: int


@dataclass
class ConfirmStats:
    """Per-module confirm drops (reference 03:2132-2234 reports both:
    small_sample drops 115 deceased links and 4 multi-PIK conflicts).

    ``n_deceased_dropped`` is ``None`` — not a numeric sentinel — for a
    module run without a dates_of_death table, so aggregating consumers
    (sums, reports) don't silently absorb placeholder values."""

    module: str
    n_deceased_dropped: int | None
    n_multi_pik_dropped: int


class PersonLinkageCascade:
    """Driver-side cascade state machine.

    Parameters
    ----------
    census:          preprocessed input file (must carry ``record_id`` and
                     ``record_id_raw_input_file``)
    reference_files: name → preprocessed reference DataFrame (each with
                     ``record_id`` and ``pik``)
    model:           trained LinkageModel covering the union of all
                     matching columns
    dates_of_death:  (pik, date_of_death DATE) — deceased links dropped at
                     confirm (reference 03:2146-2169)
    jw_strategy:     how Jaro-Winkler materializes in scoring (see
                     add_gammas). 'auto' uses the native JVM UDF when the
                     sparklinkage jar is shipped, else the Arrow pandas
                     UDF.
    auto_pin:        derive a ``num_partitions`` pin for passes that
                     leave it None (default True): the K8 pair estimate
                     (already computed when ``collect_stats``) feeds
                     ``derive_pair_pin``, so a pass whose pair output
                     explodes relative to its input gets its reduce
                     stage spread even though AQE — which sizes by
                     shuffle INPUT bytes — cannot see the explosion
                     (the r7 932s-serial regime, SKEW_BENCH_r07).
                     Passes below the explosion gate keep their exact
                     unpinned plan. With ``collect_stats=False`` the
                     estimate costs two small aggs per pass.
    checkpoint:      'local' (default) truncates lineage with
                     localCheckpoint at every pass boundary; 'reliable'
                     uses the SparkContext checkpoint dir (set it first) —
                     REQUIRED behavior, not an optimization: without it the
                     logical plan grows exponentially across passes (each
                     anti-join embeds the prior state's plan twice; a
                     13-pass run was measured producing a 2 GB plan string
                     and OOMing the driver). The reference clears Spark
                     checkpoints at exactly these points (K12). 'off'
                     skips truncation entirely — sound ONLY for shallow
                     configs (single-digit total passes): plan depth grows
                     exponentially in passes, but a 1-pass run pays zero
                     materialization jobs (cascade_mini at sf0.1: ~0.3s
                     saved; the rest of its wall is genuine pair scoring).
    checkpoint_storage_level: storage level for 'local' checkpoints.
                     None (default) = AUTO-DERIVE from the census row
                     count vs the executor heap
                     (``derive_checkpoint_storage`` — frames past ~half
                     the heap's worth of deserialized rows stream to
                     DISK_ONLY; smaller corpora keep Spark's on-heap
                     default untouched). An explicit StorageLevel
                     overrides; ``auto_pin=False`` disables this
                     derivation along with pin/salt. See ``_truncate``
                     for the measured 1024× OOM the derivation avoids.
    """

    def __init__(
        self,
        spark: SparkSession,
        census: DataFrame,
        reference_files: dict[str, DataFrame],
        model: LinkageModel,
        dates_of_death: DataFrame | None = None,
        collect_stats: bool = True,
        jw_strategy: str = "auto",
        checkpoint: str = "local",
        auto_pin: bool = True,
        checkpoint_storage_level: StorageLevel | None = None,
    ) -> None:
        self.jw_strategy = jw_strategy
        self.checkpoint = checkpoint
        self.checkpoint_storage_level = checkpoint_storage_level
        self._ckpt_level: StorageLevel | None = None
        self._ckpt_level_resolved = False
        self._ckpt_rows = 0  # largest frame-row bound fed to the gate
        self._ckpt_bytes = 0  # largest rows x row_bytes bound fed to it
        self._row_bytes = estimate_checkpoint_row_bytes(LINKS_FRAME_TEMPLATE)
        self._heap_bytes: int | None = None
        self.auto_pin = auto_pin
        self.spark = spark
        self.census = census.persist(StorageLevel.MEMORY_AND_DISK)
        self.reference_files = reference_files
        self.model = model
        self.dates_of_death = dates_of_death
        self.collect_stats = collect_stats
        self.stats: list[PassStats] = []
        self.confirm_stats: list[ConfirmStats] = []
        self._stats_caches: list[DataFrame] = []
        # accumulator: ≤1 row per record_id_raw_input_file after each module
        self.confirmed_piks: DataFrame = spark.createDataFrame(
            [],
            "record_id_raw_input_file string, record_id_census_2030 string, "
            "record_id_reference_file string, pik string, module_name string, "
            "pass_name string, match_probability double",
        )
        self._module: ModuleConfig | None = None
        self._census_to_match: DataFrame | None = None
        self._provisional_links: DataFrame | None = None
        self._reference_file: DataFrame | None = None

    def _truncate(self, df: DataFrame) -> DataFrame:
        """Materialize and cut lineage (plan depth back to O(1)).

        ``checkpoint_storage_level`` (local mode only) controls WHERE the
        materialized blocks live. The default (None → Spark's
        MEMORY_AND_DISK, deserialized rows on-heap first) is right while
        the per-pass links frame is small against the heap, but it is a
        measured scale cliff: at the 1024× ladder rung (153.6M records)
        the pass-1 links frame (~51 GB across 228 × ~226 MiB partitions)
        unrolled as deserialized objects saturated the 64 g heap and a
        concurrent shuffle writer's allocation threw
        ``java.lang.OutOfMemoryError`` (LADDER_r09 first attempt) — the
        512× rung, at half the frame, fit. ``StorageLevel.DISK_ONLY``
        streams the serialized UnsafeRow bytes straight to local disk
        (no MemoryStore unroll at all), which is exactly how a real
        cluster spills a once-per-pass frame; the blocks are still
        GC-reclaimed when the pass drops its refs (observed r8,
        tools/check_checkpoint_cleanup.py)."""
        if self.checkpoint == "reliable":
            return df.checkpoint(eager=True)
        if self.checkpoint == "local":
            lvl = self._resolve_ckpt_level()
            if lvl is not None:
                return df.localCheckpoint(eager=True, storageLevel=lvl)
            return df.localCheckpoint(eager=True)
        if self.checkpoint == "off":
            return df
        return df.persist(StorageLevel.MEMORY_AND_DISK)

    def _resolve_ckpt_level(self) -> StorageLevel | None:
        """Resolve once, lazily (the census count that feeds the
        derivation materializes the persisted census — which the first
        module needs immediately anyway, so the count is ~free). An
        explicit ``checkpoint_storage_level`` wins; ``auto_pin=False``
        restores the fully manual contract (None = Spark default)."""
        if self._ckpt_level_resolved:
            return self._ckpt_level
        if self.checkpoint_storage_level is not None or not self.auto_pin:
            self._ckpt_level = self.checkpoint_storage_level
        else:
            from ..session import executor_heap_bytes

            self._ckpt_rows = self.census.count()
            self._heap_bytes = executor_heap_bytes(self.spark)
            # initial width: the links-frame template (set in __init__ —
            # the frame whose unroll actually OOM'd the 1024x bracket; a
            # drift test pins it to build_pass_links' real output schema)
            self._ckpt_bytes = self._ckpt_rows * self._row_bytes
            self._ckpt_level = derive_checkpoint_storage(
                self._ckpt_rows, self._heap_bytes, row_bytes=self._row_bytes
            )
        self._ckpt_level_resolved = True
        return self._ckpt_level

    def _note_frame_rows(
        self, rows: int | None, row_bytes: int | None = None
    ) -> None:
        """Escalate the derived checkpoint level when a pass's K8 pair
        estimate bounds a bigger links frame than the census-row proxy
        (r10, advisor: a pass emitting MULTIPLES of census rows —
        nickname-style record multiplication — could blow past half-heap
        while the census-seeded gate still said on-heap, the exact 1024×
        failure reached via row explosion instead of corpus size). The
        pair estimate upper-bounds the links frame, so this only flips
        EARLY, and only one way: an auto-derived level never downgrades
        mid-run. Explicit levels and ``auto_pin=False`` are untouched.

        r11: takes the frame's schema-derived ``row_bytes`` (the caller
        passes :func:`estimate_checkpoint_row_bytes` of the actual links
        plan) and compares estimated BYTES, not rows — a wide pass
        escalates at fewer rows than a narrow one (r10 verdict
        top-next); ``None`` falls back to the template width."""
        if (
            not rows
            or self.checkpoint != "local"  # only 'local' consults the level
            or self.checkpoint_storage_level is not None
            or not self.auto_pin
        ):
            return
        # in 'local' mode start_module's first _truncate already resolved
        # the level, so this seeds _ckpt_rows / _heap_bytes for free
        self._resolve_ckpt_level()
        rb = row_bytes if row_bytes else self._row_bytes
        est_bytes = rows * rb
        if est_bytes <= self._ckpt_bytes:
            return
        self._ckpt_bytes = est_bytes
        lvl = derive_checkpoint_storage(rows, self._heap_bytes, row_bytes=rb)
        if lvl is not None:
            self._ckpt_level = lvl

    # -- module lifecycle ---------------------------------------------------

    def start_module(self, cfg: ModuleConfig) -> None:
        self._module = cfg
        self._reference_file = self.reference_files[cfg.reference_file_name]
        # exclude raw input records already PIKed by earlier modules (J3)
        self._census_to_match = self._truncate(
            anti_join(
                self.census,
                self.confirmed_piks.select("record_id_raw_input_file"),
                on="record_id_raw_input_file",
            )
        )
        self._provisional_links = self.spark.createDataFrame(
            [],
            "record_id_census_2030 string, record_id_reference_file string, "
            "record_id_raw_input_file string, match_weight double, "
            "match_probability double, module_name string, pass_name string",
        )

    def _pass_sides(
        self, pass_cfg: PassConfig
    ) -> tuple[DataFrame, DataFrame, list[str]]:
        cfg = self._module
        block_on = cfg.cut_columns + pass_cfg.blocking_columns
        columns_needed = list(
            dict.fromkeys(["record_id"] + block_on + cfg.matching_columns)
        )
        census_side = self._census_to_match
        if pass_cfg.input_data_transformation is not None:
            census_side = pass_cfg.input_data_transformation(census_side)
        census_side = census_side.select(
            *[c for c in columns_needed if c in census_side.columns],
            "record_id_raw_input_file",
        )
        ref_side = self._reference_file.select(
            *[c for c in columns_needed if c in self._reference_file.columns]
        )
        return census_side, ref_side, block_on

    def build_pass_links(
        self,
        pass_cfg: PassConfig,
        num_partitions: int | None = None,
        salt_partitions: int | None = None,
    ) -> DataFrame:
        """The (lazy) new-links pipeline for a pass: block-join → gamma →
        score → threshold → select. Exposed so plan pins can audit a pass
        without executing it — e.g. a bucketed reference file must show no
        shuffle exchange on its side of the block join. Stays fully lazy
        (no auto-pin estimation jobs here — ``run_matching_pass`` resolves
        the knobs via ``resolve_pass_plan`` and passes them in);
        ``num_partitions`` / ``salt_partitions`` override the pass
        config's when given."""
        assert self._module is not None, "start_module first"
        cfg = self._module
        census_side, ref_side, block_on = self._pass_sides(pass_cfg)

        # pass-specific model: comparisons restricted to matching columns,
        # prior scaled by the cut-column Bayes factor (reference 03:1977-2001)
        pass_model = self.model.subset(cfg.matching_columns)
        pass_model.bayes_factor_cut_columns = cfg.bayes_factor_cut_columns

        pairs = blocked_pairs(
            census_side,
            ref_side,
            block_on,
            salt_partitions=(
                salt_partitions
                if salt_partitions is not None
                else pass_cfg.salt_partitions
            ),
            num_partitions=(
                num_partitions
                if num_partitions is not None
                else pass_cfg.num_partitions
            ),
        )
        # a column can be both blocking key and matching column (e.g. the
        # DOB parts in namesearch): blocked keys come out unsuffixed, so
        # alias them to both sides for the comparisons (values are equal by
        # construction — the gamma lands on the exact-match level, exactly
        # as in Splink where the blocking rule guarantees l.col = r.col)
        for c in cfg.matching_columns:
            if c in block_on:
                pairs = pairs.withColumn(f"{c}_l", F.col(c)).withColumn(
                    f"{c}_r", F.col(c)
                )
        scored = score_pairs(
            pairs,
            pass_model,
            threshold_match_probability=pass_cfg.probability_threshold,
            jw_strategy=self.jw_strategy,
        )
        return scored.select(
            F.col("record_id_l").alias("record_id_census_2030"),
            F.col("record_id_r").alias("record_id_reference_file"),
            F.col("record_id_raw_input_file_l").alias("record_id_raw_input_file"),
            "match_weight",
            "match_probability",
            F.lit(cfg.name).alias("module_name"),
            F.lit(pass_cfg.name).alias("pass_name"),
        )

    def resolve_pass_plan(
        self, pass_cfg: PassConfig, force_estimate: bool = False
    ) -> PassPlan:
        """The pass's effective physical knobs in ONE place (r9 advice:
        ``resolve_pass_pin`` and ``run_matching_pass`` used to duplicate
        this derivation — two copies that could drift, and an auditing
        caller paid the estimate job twice).

        Each knob is the explicit config value, else (``auto_pin``) the
        one derived from the K8 estimate: :func:`derive_pair_pin` for
        the partition pin (a pair-exploding pass can no longer silently
        re-enter the one-reduce-task regime because its author forgot
        the knob — SKEW_BENCH_r07: salt WITHOUT the pin measured
        useless) and :func:`derive_salt` for the salt (the OTHER half of
        that regime — the pin spreads distinct keys but cannot split ONE
        monster key; SKEW_BENCH_r08's auto row still hard-coded salt).
        Runs the estimate's two small aggs only when a knob needs
        deriving (or ``force_estimate`` — stats collection reuses the
        same job); with both knobs explicit it is free."""
        pin = pass_cfg.num_partitions
        salt = pass_cfg.salt_partitions
        derive = self.auto_pin and (pin is None or salt is None)
        if not (derive or force_estimate):
            return PassPlan(None, pin, salt)
        census_side, ref_side, block_on = self._pass_sides(pass_cfg)
        stats = estimate_pair_stats(census_side, ref_side, block_on)
        if self.auto_pin:
            # size the derivations from the pass's ACTUAL pair-row schema
            # (r10 — the r9 constant 256 under-pinned wide passes and
            # over-pinned narrow ones; schema inspection is free) and the
            # MEASURED string widths the estimate job just aggregated
            # (r11 — address-heavy passes beat the 16-byte assumption)
            row_bytes = estimate_pair_row_bytes(
                census_side, ref_side, block_on, stats=stats
            )
            if pin is None:
                pin = derive_pair_pin(
                    stats.pairs,
                    stats.n_left,
                    stats.n_right,
                    shuffle_partitions(self.spark),
                    pair_row_bytes=row_bytes,
                    # the cap scales with the fleet (r11): 4096 on this
                    # box, 32x slots on a real cluster; conf makes the
                    # dyn-alloc max fleet win over live parallelism (r12)
                    cap=derive_pin_cap(
                        self.spark.sparkContext.defaultParallelism,
                        conf=self.spark.conf,
                    ),
                )
            if salt is None:
                salt = derive_salt(stats.max_key_pairs, pair_row_bytes=row_bytes)
        return PassPlan(stats, pin, salt)

    def resolve_pass_pin(self, pass_cfg: PassConfig) -> int | None:
        """The pass's effective ``blocked_pairs`` partition pin (see
        ``resolve_pass_plan``, which this delegates to)."""
        return self.resolve_pass_plan(pass_cfg).num_partitions

    def run_matching_pass(self, pass_cfg: PassConfig) -> None:
        assert self._module is not None, "start_module first"
        cfg = self._module
        plan = self.resolve_pass_plan(pass_cfg, force_estimate=self.collect_stats)
        n_pairs = plan.stats.pairs if plan.stats is not None else -1
        links_plan = self.build_pass_links(
            pass_cfg,
            num_partitions=plan.num_partitions,
            salt_partitions=plan.salt_partitions,
        )
        # escalate the checkpoint storage gate BEFORE this pass's links
        # frame is checkpointed — the pair estimate bounds its rows, and
        # the lazy plan's ACTUAL schema sizes its row width (r11)
        self._note_frame_rows(
            plan.stats.pairs if plan.stats is not None else None,
            row_bytes=estimate_checkpoint_row_bytes(links_plan.schema),
        )

        new_links = self._truncate(links_plan)
        # with the eager checkpoint above the count is free, but under a
        # non-eager checkpoint mode it would be a whole extra job — only
        # pay it when stats were asked for
        n_links = new_links.count() if self.collect_stats else -1

        self._provisional_links = self._provisional_links.unionByName(new_links)

        # remove matched linkage records (NOT raw records — a nickname
        # variant matching doesn't stop the canonical record, SURVEY §7.3.5)
        self._census_to_match = self._truncate(
            anti_join(
                self._census_to_match,
                new_links.select(
                    F.col("record_id_census_2030").alias("record_id")
                ).distinct(),
                on="record_id",
            )
        )
        n_eligible = self._census_to_match.count() if self.collect_stats else -1

        if self.collect_stats:
            self.stats.append(
                PassStats(cfg.name, pass_cfg.name, n_pairs, n_links, n_eligible)
            )

    def confirm_piks(self) -> DataFrame:
        """Module post-search confirm (reference 03:2132-2234): attach PIKs,
        drop deceased, argmax by probability per raw record, drop raw
        records whose best links disagree on PIK, dedup deterministically.
        Returns the newly confirmed links and folds them into the
        accumulator."""
        assert self._module is not None
        cfg = self._module

        piks = self._reference_file.select(
            F.col("record_id").alias("record_id_reference_file"), "pik"
        )
        links = self._provisional_links.join(
            piks, on="record_id_reference_file", how="left"
        )

        # stats caches from the PREVIOUS module can be released now; this
        # module's (registered below) must outlive confirm_piks because
        # the accumulator fold may be lazy (persist / off checkpoint modes)
        for c in self._stats_caches:
            c.unpersist()
        self._stats_caches = []

        n_deceased_dropped = None
        if self.dates_of_death is not None:
            dod = self.dates_of_death.select("pik", "date_of_death")
            alive = F.col("date_of_death").isNull() | (
                F.col("date_of_death") > F.lit(CENSUS_DAY).cast("date")
            )
            links = links.join(F.broadcast(dod), on="pik", how="left")
            if self.collect_stats:
                # the deceased count and the alive path both consume the
                # full provisional-links+piks+dod join: cache it so the
                # stats action doesn't recompute the module's whole link
                # pipeline a second time
                links = links.persist(StorageLevel.MEMORY_AND_DISK)
                self._stats_caches.append(links)
                n_deceased_dropped = links.filter(~alive).count()
            links = links.filter(alive).drop("date_of_death")

        # best links per raw input record (ties kept), then drop records
        # whose tied best links name >1 distinct PIK (reference 03:2171-2207)
        best = max_per_group_with_ties(
            links, ["record_id_raw_input_file"], "match_probability"
        )
        if self.collect_stats:
            # consumed by the n_multi count and the confirmed pipeline —
            # cache the window result once
            best = best.persist(StorageLevel.MEMORY_AND_DISK)
            self._stats_caches.append(best)
        # single-PIK gate as a WINDOW over the same partition key the
        # best-window and the keep_best row_number already use (r15,
        # guide §2.4/§3.3): the former groupBy(count_distinct) + left_semi
        # self-join put `best` under TWO consumers, and with stats off
        # (nothing persisted) the whole module link pipeline — blocking,
        # gammas, scoring — executed twice, once per semi-join side
        # (measured: the duplicated subtree was both 1.25s broadcast
        # builds in the sf0.1 plan). collect_set drops NULL piks exactly
        # as count_distinct ignored them, so the kept record set is
        # identical; one exchange now feeds max → gate → row_number.
        w_rec = Window.partitionBy("record_id_raw_input_file")
        gated = (
            best.withColumn(
                "__npik", F.size(F.collect_set("pik").over(w_rec))
            )
            .filter(F.col("__npik") <= 1)
            .drop("__npik")
        )
        if self.collect_stats:
            n_multi = (
                best.groupBy("record_id_raw_input_file")
                .agg(F.count_distinct("pik").alias("num_unique_piks"))
                .filter(F.col("num_unique_piks") > 1)
                .count()
            )
            self.confirm_stats.append(
                ConfirmStats(cfg.name, n_deceased_dropped, n_multi)
            )
        confirmed = keep_best(
            gated,
            keys=["record_id_raw_input_file"],
            order_by=[F.desc("match_probability")],
            tiebreak="record_id_census_2030",
        ).select(
            "record_id_raw_input_file",
            "record_id_census_2030",
            "record_id_reference_file",
            "pik",
            "module_name",
            "pass_name",
            "match_probability",
        )

        self.confirmed_piks = self._truncate(
            self.confirmed_piks.unionByName(confirmed)
        )
        self._module = None
        self._census_to_match = None
        self._provisional_links = None
        return confirmed

    # -- whole-cascade driver ----------------------------------------------

    def run(self, config: CascadeConfig) -> DataFrame:
        for mod in config.modules:
            self.start_module(mod)
            for p in mod.passes:
                self.run_matching_pass(p)
            self.confirm_piks()
        return self.confirmed_piks

    def attach_piks(self, census_raw: DataFrame) -> DataFrame:
        """Final 1:1 PIK attach onto the raw input file (J8; reference
        03:3274-3285)."""
        piks = self.confirmed_piks.select(
            F.col("record_id_raw_input_file").alias("record_id"), "pik"
        )
        return census_raw.join(piks, on="record_id", how="left")


def default_cascade_config(salt_hot_passes: bool = False) -> CascadeConfig:
    """The reference's 4-module / 15-pass configuration (FIXTURES.md §8;
    reference 03_link_datasets.ipynb:2332-3210)."""
    name_dob_matching = [
        "first_name_15",
        "last_name_12",
        "middle_initial",
        "day_of_birth",
        "month_of_birth",
        "year_of_birth",
    ]
    salt = 10 if salt_hot_passes else None
    return CascadeConfig(
        modules=[
            ModuleConfig(
                name="geosearch",
                reference_file_name="geobase_reference_file",
                cut_columns=["zip3"],
                matching_columns=name_dob_matching + ["geokey"],
                passes=[
                    PassConfig("geokey", ["geokey_for_blocking"], salt_partitions=salt),
                    PassConfig(
                        "geokey name switch",
                        ["geokey_for_blocking"],
                        input_data_transformation=switch_first_and_last_names,
                        salt_partitions=salt,
                    ),
                    PassConfig(
                        "street address",
                        ["street_number_for_blocking", "street_name_for_blocking_soundex"],
                        salt_partitions=salt,
                    ),
                    PassConfig(
                        "street address name switch",
                        ["street_number_for_blocking", "street_name_for_blocking_soundex"],
                        input_data_transformation=switch_first_and_last_names,
                        salt_partitions=salt,
                    ),
                    PassConfig(
                        "name and birth year",
                        ["first_name_2", "last_name_2", "year_of_birth"],
                    ),
                ],
            ),
            ModuleConfig(
                name="namesearch",
                reference_file_name="name_dob_reference_file",
                cut_columns=["first_initial_cut", "last_initial_cut"],
                matching_columns=name_dob_matching,
                passes=[
                    PassConfig(
                        "dob and nysiis",
                        [
                            "day_of_birth",
                            "month_of_birth",
                            "year_of_birth",
                            "first_name_nysiis",
                            "last_name_nysiis",
                        ],
                    ),
                    PassConfig(
                        "dob and first initial",
                        [
                            "day_of_birth",
                            "month_of_birth",
                            "year_of_birth",
                            "first_name_1",
                            "last_name_1",
                        ],
                    ),
                    PassConfig(
                        "birth year and name_2",
                        ["year_of_birth", "first_name_2", "last_name_2"],
                    ),
                    PassConfig(
                        "birth day-month and name_2",
                        ["day_of_birth", "month_of_birth", "first_name_2", "last_name_2"],
                    ),
                ],
            ),
            ModuleConfig(
                name="dobsearch",
                reference_file_name="name_dob_reference_file",
                cut_columns=["day_of_birth", "month_of_birth"],
                matching_columns=name_dob_matching,
                passes=[
                    PassConfig(
                        "name_1 switched",
                        ["first_name_1", "last_name_1"],
                        input_data_transformation=switch_first_and_last_names,
                    ),
                    PassConfig("name_3", ["first_name_3", "last_name_3"]),
                    PassConfig(
                        "reverse soundex",
                        ["first_name_reverse_soundex", "last_name_reverse_soundex"],
                    ),
                    PassConfig("first_2 and year", ["first_name_2", "year_of_birth"]),
                ],
            ),
            ModuleConfig(
                name="hhcompsearch",
                reference_file_name="hhcomp_reference_file",
                cut_columns=["pseudo_household_id"],
                matching_columns=name_dob_matching,
                bayes_factor_cut_columns=1000.0,
                passes=[
                    PassConfig("name_1", ["first_name_1", "last_name_1"]),
                    PassConfig("birth year", ["year_of_birth"]),
                ],
            ),
        ]
    )
