"""S7 generator source: parity, determinism, noise-config surface, and
downstream schema compatibility."""

from __future__ import annotations

import duckdb
import pytest

from person_linkage_case_study_spark.sources.generator import (
    DATASETS,
    generate_dataset,
    generate_dataset_sql,
    generate_decennial_census,
    get_config,
    very_noisy_config,
)

N = 800


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def _duck_rows(sql):
    o = duckdb.connect().execute(sql)
    cols = [c[0] for c in o.description]
    return cols, sorted(tuple(str(x) for x in r) for r in o.fetchall())


@pytest.mark.parametrize("dataset", DATASETS)
def test_duckdb_parity(spark, dataset):
    """The Spark plan and the DuckDB replay of the same spec produce
    byte-identical tables under the reference's very-noisy config."""
    cfg = very_noisy_config()
    df = generate_dataset(spark, dataset, N, seed=5, config=cfg)
    cols, orows = _duck_rows(generate_dataset_sql(dataset, N, seed=5, config=cfg))
    assert df.columns == cols
    assert _rows(df) == orows


def test_partition_and_seed_determinism(spark):
    """Generation is a pure function of (dataset, n, seed, config) — the
    partition layout must not leak into values (the property pseudopeople's
    per-worker numpy RNG does not have)."""
    a = _rows(generate_dataset(spark, "decennial_census", N, seed=3, num_partitions=1))
    b = _rows(generate_dataset(spark, "decennial_census", N, seed=3, num_partitions=7))
    assert a == b
    c = _rows(generate_dataset(spark, "decennial_census", N, seed=4, num_partitions=7))
    assert a != c


def _clean_config():
    cfg = get_config()
    for dcfg in cfg.values():
        for rn in dcfg["row_noise"].values():
            rn["row_probability"] = 0.0
        for ccfg in dcfg["column_noise"].values():
            for leaf in ccfg.values():
                leaf["cell_probability"] = 0.0
    return cfg


def test_noise_config_surface(spark):
    """Zeroed config yields the clean truth (no omissions, no dups, no
    blanks); the very-noisy override corrupts strictly more first names
    than the defaults, and omit_row strictly reduces rows."""
    clean = generate_decennial_census(spark, N, seed=9, config=_clean_config()).cache()
    n_clean = clean.count()
    assert clean.filter("record_id LIKE '%_dup'").count() == 0
    assert clean.filter("first_name IS NULL").count() == 0

    def corrupted(cfg):
        noisy = generate_decennial_census(spark, N, seed=9, config=cfg)
        j = clean.select("record_id", "first_name").join(
            noisy.select("record_id", "first_name").withColumnRenamed(
                "first_name", "noisy_first"
            ),
            "record_id",
        )
        return j.filter(
            "noisy_first IS NULL OR noisy_first != first_name"
        ).count(), noisy.count()

    c_default, n_default = corrupted(get_config())
    c_noisy, _ = corrupted(very_noisy_config())
    assert n_default < n_clean  # omit_row fired
    assert 0 < c_default < c_noisy  # cell noise fired and scales with config
    clean.unpersist()


def test_census_feeds_preprocess(spark):
    """The generated census is schema-compatible with the linkage
    pipeline's census preprocessor (generator → engine, no adapters)."""
    from person_linkage_case_study_spark.plans.preprocess import preprocess_census

    census = generate_decennial_census(spark, 300, seed=1)
    fake = spark.createDataFrame([("UNKNOWN",)], ["fake_name"])
    out = preprocess_census(census, fake)
    assert out.count() > 0
    assert "record_id" in out.columns


def test_ssa_event_structure(spark):
    """Every SSA-known simulant has a creation event; name-change and
    death events are strict subsets keyed to the same ssn."""
    ssa = generate_dataset(spark, "social_security", N, seed=5,
                           config=_clean_config()).cache()
    by_type = {r["event_type"]: r["n"] for r in
               ssa.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    assert by_type["creation"] > by_type.get("name_change", 0) > 0
    assert by_type.get("date_of_death", 0) > 0
    ssa.unpersist()


def test_zero_shuffle_plan(spark):
    """The generator plan contains no Exchange — generation is scan-side
    only, the property that makes it linear at 100 TB."""
    plan = generate_decennial_census(spark, N, seed=1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
