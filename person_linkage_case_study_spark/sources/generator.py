"""Pseudopeople-style generator source — SURVEY §2.1 S7, Spark-first.

The reference generates its four simulated administrative datasets with
the external ``pseudopeople`` library: ``generate_decennial_census`` /
``generate_social_security`` / ``generate_taxes_1040`` /
``generate_taxes_w2_and_1099``, each seeded and driven by a nested noise
configuration (01_generate_pseudopeople_simulated_datasets.ipynb:377-387,
412-422,451-459,507-512; noise config cells 15-18). The survey scoped the
external library out of the engine, but a 100 TB pipeline needs an
in-engine generator — data that large is generated where it is consumed,
not copied in.

This module re-expresses that generator surface Spark-first:

- one ``spark.range(n_simulants)`` seed axis: embarrassingly parallel,
  zero shuffle, linear in ``n``; ``num_partitions`` controls layout
  directly, so a 1000-executor cluster generates 10^11 simulants as fast
  as its scan bandwidth;
- every latent attribute and every noise decision is a pure projection of
  the portable 32-bit content hash (functions/hashing.py), so generation
  is deterministic across partitionings, retries, and engines — a lost
  partition regenerates bit-identically;
- the SAME column-expression spec renders to Spark SQL and DuckDB SQL
  through a small dialect table, so a generated dataset is value-hash
  verifiable against a DuckDB replay (catalog entry
  ``s7_generated_census``) — a property pseudopeople's numpy RNG cannot
  offer;
- the noise model mirrors pseudopeople's config surface: ``row_noise``
  (``omit_row`` / ``duplicate_row`` row probabilities) and
  ``column_noise`` (``leave_blank`` / ``make_typos`` /
  ``write_wrong_digits`` cell probabilities), overridable per dataset and
  column exactly like the reference's cell-16/17 "very noisy" pattern.
  Token-level noise applies one deterministic character substitution per
  noised cell — a portable simplification of pseudopeople's per-token
  Bernoulli process (the reference configures cell 0.1 × token 0.1 on
  ~10-char fields ≈ one corrupted character per noised cell).

Row-noise order matches pseudopeople: omit, then duplicate, then column
noise (duplicated rows draw their own independent cell noise).
"""

from __future__ import annotations

import copy

from pyspark.sql import DataFrame, SparkSession

from ..functions.hashing import MOD32

# name/place pools — syllable-composed first/last names give a vocabulary
# wide enough that distinct simulants rarely collide on (name, dob) while
# still producing JW-close variants for fuzzy comparison levels
_F1 = ["JAM", "ROB", "LIN", "MAR", "DAV", "SAR", "KAR", "TOM", "BEN", "LIS", "NAT", "PAU"]
_F2 = ["ES", "ERT", "DA", "IA", "ID", "AH", "EN", "AS", "JAMIN", "ETTE", "HAN", "LINE"]
_L1 = ["SMI", "JOHN", "WIL", "BRO", "GAR", "MIL", "DAV", "LOP", "PER", "AND", "TAY", "MOO", "CLA", "HAR"]
_L2 = ["TH", "SON", "LIAMS", "WN", "CIA", "LER", "IS", "EZ", "KINS", "ERSON", "LOR", "RE", "RK", "RIS"]
_STREETS = ["MAPLE", "OAK", "CEDAR", "ELM", "PINE", "BIRCH", "WALNUT", "SPRUCE",
            "HICKORY", "ASPEN", "WILLOW", "LAUREL", "MAGNOLIA", "JUNIPER", "ALDER",
            "HAWTHORN", "SYCAMORE", "POPLAR", "CHESTNUT", "DOGWOOD"]
_CITIES = ["SPRINGFIELD", "RIVERTON", "LAKEVIEW", "FAIRVIEW", "GREENVILLE",
           "BRISTOL", "CLINTON", "GEORGETOWN", "SALEM", "MADISON", "ASHLAND", "DOVER"]
_STATES = ["WA", "OR", "CA", "NV", "ID", "MT", "UT", "AZ"]
_RACES = ["White", "Black", "Asian", "AIAN", "NHOPI", "Multiracial or Other", "Latino"]
_RELATIONSHIPS = ["Reference person", "Opposite-sex spouse", "Biological child",
                  "Adopted child", "Parent", "Sibling", "Roommate or housemate"]

DATASETS = ("decennial_census", "social_security", "taxes_w2_and_1099", "taxes_1040")

# ---------------------------------------------------------------------------
# dialect table: the 6 spots where Spark SQL and DuckDB SQL spell the same
# computation differently. Everything else below is shared text.
# ---------------------------------------------------------------------------


def _s(d: str, text: str) -> str:
    """Spark SQL spells the string type ``STRING``; DuckDB ``VARCHAR``.
    Expressions are authored in the DuckDB spelling and fixed up here."""
    return text.replace("AS VARCHAR", "AS STRING") if d == "spark" else text


def _h32(d: str, expr: str) -> str:
    """Portable 32-bit hash (functions/hashing.py semantics) as SQL text."""
    if d == "spark":
        m = f"md5({expr})"
        return (
            f"CAST(conv(concat(substr({m},23,2),substr({m},21,2),"
            f"substr({m},19,2),substr({m},17,2)),16,10) AS BIGINT)"
        )
    return f"(md5_number_lower({expr}) & 4294967295)"


def _H(d: str, seed: int, salt: str, key: str = "CAST(sid AS VARCHAR)") -> str:
    return _h32(d, f"('{seed}:{salt}:' || {key})")


def _pick(d: str, pool: list[str], h: str) -> str:
    items = ", ".join(f"'{p}'" for p in pool)
    idx = f"CAST({h} % {len(pool)} AS INT) + 1"
    if d == "spark":
        return f"element_at(array({items}), {idx})"
    return f"list_extract([{items}], {idx})"


def _dateadd(d: str, date_expr: str, n_expr: str) -> str:
    if d == "spark":
        return f"date_add({date_expr}, CAST({n_expr} AS INT))"
    return f"({date_expr} + CAST({n_expr} AS INT))"


def _fmt(d: str, date_expr: str, style: str) -> str:
    if d == "spark":
        return f"date_format({date_expr}, '{style}')"
    duck = {"yyyyMMdd": "%Y%m%d", "MM/dd/yyyy": "%m/%d/%Y"}[style]
    return f"strftime({date_expr}, '{duck}')"


# ---------------------------------------------------------------------------
# noise configuration surface (mirrors pseudopeople get_config())
# ---------------------------------------------------------------------------

_NAME_NOISE = {"make_typos": {"cell_probability": 0.01, "token_probability": 0.1},
               "leave_blank": {"cell_probability": 0.01}}
_NUMBER_NOISE = {"write_wrong_digits": {"cell_probability": 0.01, "token_probability": 0.1},
                 "leave_blank": {"cell_probability": 0.01}}


def get_config() -> dict:
    """Default noise configuration, one nested dict per dataset — the same
    ``{dataset: {row_noise, column_noise}}`` shape pseudopeople exposes, so
    the reference's override pattern (walk the dict, replace leaves) ports
    verbatim."""
    return {
        "decennial_census": {
            "row_noise": {"omit_row": {"row_probability": 0.0145},
                          "duplicate_row": {"row_probability": 0.008}},
            "column_noise": {
                "first_name": copy.deepcopy(_NAME_NOISE),
                "middle_initial": {"make_typos": {"cell_probability": 0.01, "token_probability": 1.0},
                                   "leave_blank": {"cell_probability": 0.01}},
                "last_name": copy.deepcopy(_NAME_NOISE),
                "date_of_birth": {"leave_blank": {"cell_probability": 0.03},
                                  "write_wrong_digits": {"cell_probability": 0.01,
                                                         "token_probability": 0.1}},
                "street_number": copy.deepcopy(_NUMBER_NOISE),
                "street_name": copy.deepcopy(_NAME_NOISE),
                "zipcode": copy.deepcopy(_NUMBER_NOISE),
            },
        },
        "social_security": {
            "row_noise": {"omit_row": {"row_probability": 0.005},
                          "duplicate_row": {"row_probability": 0.0}},
            "column_noise": {
                "first_name": copy.deepcopy(_NAME_NOISE),
                "last_name": copy.deepcopy(_NAME_NOISE),
                # the reference never corrupts SSN in the SSA dataset
                # (01 cell 16: write_wrong_digits excluded there)
                "date_of_birth": {"write_wrong_digits": {"cell_probability": 0.01,
                                                         "token_probability": 0.1}},
            },
        },
        "taxes_w2_and_1099": {
            "row_noise": {"omit_row": {"row_probability": 0.005},
                          "duplicate_row": {"row_probability": 0.005}},
            "column_noise": {
                "first_name": copy.deepcopy(_NAME_NOISE),
                "last_name": copy.deepcopy(_NAME_NOISE),
                "ssn": copy.deepcopy(_NUMBER_NOISE),
                "wages": copy.deepcopy(_NUMBER_NOISE),
                "mailing_address_street_number": copy.deepcopy(_NUMBER_NOISE),
                "mailing_address_street_name": copy.deepcopy(_NAME_NOISE),
                "mailing_address_zipcode": copy.deepcopy(_NUMBER_NOISE),
            },
        },
        "taxes_1040": {
            "row_noise": {"omit_row": {"row_probability": 0.005},
                          "duplicate_row": {"row_probability": 0.005}},
            "column_noise": {
                "first_name": copy.deepcopy(_NAME_NOISE),
                "last_name": copy.deepcopy(_NAME_NOISE),
                "ssn": copy.deepcopy(_NUMBER_NOISE),
                "mailing_address_street_number": copy.deepcopy(_NUMBER_NOISE),
                "mailing_address_street_name": copy.deepcopy(_NAME_NOISE),
                "mailing_address_zipcode": copy.deepcopy(_NUMBER_NOISE),
            },
        },
    }


def very_noisy_config() -> dict:
    """The reference's "give ourselves more of a challenge" override
    (01 cells 14-17): typo cell probability 0.1 on free-text name/street
    columns, 0.05 on middle_initial, wrong-digit cell probability 0.1 on
    number columns (never SSN-in-SSA)."""
    cfg = get_config()
    for dataset, dcfg in cfg.items():
        if dataset not in ("decennial_census", "taxes_w2_and_1099", "social_security"):
            continue
        for col, ccfg in dcfg["column_noise"].items():
            if "make_typos" in ccfg:
                ccfg["make_typos"]["cell_probability"] = (
                    0.05 if col == "middle_initial" else 0.1
                )
            if "write_wrong_digits" in ccfg:
                ccfg["write_wrong_digits"]["cell_probability"] = 0.1
    return cfg


# ---------------------------------------------------------------------------
# latent population (the noise-free truth table)
# ---------------------------------------------------------------------------


def _population_cols(d: str, seed: int) -> dict[str, str]:
    H = lambda salt: _H(d, seed, str(salt))  # noqa: E731
    hh = "CAST(CAST(floor(sid / 3) AS BIGINT) AS VARCHAR)"
    Hh = lambda salt: _H(d, seed, str(salt), hh)  # noqa: E731
    return {
        "sid": "sid",
        "ssn": "lpad(CAST(100000000 + sid AS VARCHAR), 9, '0')",
        "first_name": f"({_pick(d, _F1, H(3))} || {_pick(d, _F2, H(4))})",
        "middle_name": f"CASE WHEN {H(7)} % 5 != 0 THEN {_pick(d, _F1, H(8))} END",
        "last_name": f"({_pick(d, _L1, H(5))} || {_pick(d, _L2, H(6))})",
        "dob": _dateadd(d, "DATE '1940-01-01'", f"{H(9)} % 29200"),
        "sex": f"CASE WHEN {H(10)} % 2 = 0 THEN 'Female' ELSE 'Male' END",
        "race_ethnicity": _pick(d, _RACES, H(11)),
        "relationship": _pick(d, _RELATIONSHIPS, H(13)),
        "has_ssa": f"({H(2)} % 100 >= 6)",
        "deceased": f"({H(12)} % 90 = 0)",
        "is_gq": f"({H(14)} % 40 = 0)",
        # household-keyed address: members share it, like pseudopeople's
        # household structure (3-person households on average)
        "street_number": f"CAST(({Hh(20)} % 9900) + 1 AS VARCHAR)",
        "street_name": f"({_pick(d, _STREETS, Hh(21))} || ' ST')",
        "unit_number": "CAST(NULL AS VARCHAR)",
        "city": _pick(d, _CITIES, Hh(22)),
        "state": _pick(d, _STATES, Hh(23)),
        "zipcode": (
            f"(lpad(CAST(100 + {Hh(24)} % 90 AS VARCHAR), 3, '0') || "
            f"lpad(CAST({Hh(25)} % 100 AS VARCHAR), 2, '0'))"
        ),
        "wages": f"CAST(20000 + {H(15)} % 80000 AS VARCHAR)",
        "employer_id": f"CAST({H(16)} % 500 AS VARCHAR)",
        "is_filer": f"({H(40)} % 100 < 92)",
    }


# ---------------------------------------------------------------------------
# dataset projections (pre-noise). Each group: (suffix, predicate,
# ordered {col: expr-over-pop}); multi-group datasets (SSA events) union.
# ---------------------------------------------------------------------------


def _dataset_groups(d: str, seed: int, dataset: str, year: int):
    H = lambda salt: _H(d, seed, str(salt))  # noqa: E731
    dob_us = _fmt(d, "dob", "MM/dd/yyyy")
    dob_compact = _fmt(d, "dob", "yyyyMMdd")
    if dataset == "decennial_census":
        age = (
            f"CAST({year} - year(dob) - (CASE WHEN month(dob) > 4 OR "
            f"(month(dob) = 4 AND day(dob) > 1) THEN 1 ELSE 0 END) AS VARCHAR)"
        )
        cols = {
            "record_id": f"('census_{year}_' || CAST(sid AS VARCHAR))",
            "first_name": "first_name",
            "middle_initial": "substr(middle_name, 1, 1)",
            "last_name": "last_name",
            "age": age,
            "date_of_birth": dob_us,
            "street_number": "street_number",
            "street_name": "street_name",
            "unit_number": "unit_number",
            "city": "city",
            "state": "state",
            "zipcode": "zipcode",
            "housing_type": "CASE WHEN is_gq THEN 'Nursing home' ELSE 'Household' END",
            "relationship_to_reference_person": "relationship",
            "sex": "sex",
            "race_ethnicity": "race_ethnicity",
            "year": f"CAST({year} AS INT)",
        }
        return [("", "NOT deceased", cols)]
    if dataset == "social_security":
        base = {
            "record_id": None,  # per group
            "ssn": "ssn",
            "first_name": "first_name",
            "middle_name": "middle_name",
            "last_name": "last_name",
            "date_of_birth": dob_compact,
            "event_type": None,
            "event_date": None,
        }
        creation = dict(base)
        creation["record_id"] = "('ssa_' || CAST(sid AS VARCHAR) || '_0')"
        creation["event_type"] = "'creation'"
        creation["event_date"] = _fmt(
            d, _dateadd(d, "dob", f"6570 + {H(30)} % 3650"), "yyyyMMdd"
        )
        name_change = dict(base)
        name_change["record_id"] = "('ssa_' || CAST(sid AS VARCHAR) || '_1')"
        name_change["last_name"] = f"({_pick(d, _L1, H(31))} || {_pick(d, _L2, H(32))})"
        name_change["event_type"] = "'name_change'"
        name_change["event_date"] = _fmt(
            d, _dateadd(d, "DATE '2012-01-01'", f"{H(33)} % 3650"), "yyyyMMdd"
        )
        death = dict(base)
        death["record_id"] = "('ssa_' || CAST(sid AS VARCHAR) || '_2')"
        death["event_type"] = "'date_of_death'"
        death["event_date"] = "'20290615'"
        return [
            ("creation", "has_ssa", creation),
            ("name_change", f"has_ssa AND {H(34)} % 8 = 0", name_change),
            ("death", "has_ssa AND deceased", death),
        ]
    if dataset in ("taxes_w2_and_1099", "taxes_1040"):
        prefix = "w2" if dataset == "taxes_w2_and_1099" else "1040"
        cols = {
            "record_id": f"('{prefix}_{year}_' || CAST(sid AS VARCHAR))",
            "ssn": "ssn",
            "first_name": "first_name",
            "middle_initial": "substr(middle_name, 1, 1)",
            "last_name": "last_name",
            "mailing_address_street_number": "street_number",
            "mailing_address_street_name": "street_name",
            "mailing_address_unit_number": "unit_number",
            "mailing_address_city": "city",
            "mailing_address_state": "state",
            "mailing_address_zipcode": "zipcode",
            "tax_year": f"CAST({year} AS INT)",
        }
        if dataset == "taxes_w2_and_1099":
            cols["employer_id"] = "employer_id"
            cols["wages"] = "wages"
        return [("", "has_ssa AND is_filer AND NOT deceased", cols)]
    raise ValueError(f"unknown dataset {dataset!r}; one of {DATASETS}")


# ---------------------------------------------------------------------------
# noise rendering
# ---------------------------------------------------------------------------


def _noised_cols(d: str, seed: int, dataset: str, out_cols: list[str], config: dict):
    """Column list for the final projection: each configured column wrapped
    in its cell-noise CASEs, keyed on (record_id, column, noise type)."""
    ccfg = config.get(dataset, {}).get("column_noise", {})
    rendered = []
    for col in out_cols:
        expr = col
        noise = ccfg.get(col, {})
        for kind in ("make_typos", "write_wrong_digits"):
            p = noise.get(kind, {}).get("cell_probability", 0.0)
            if p <= 0:
                continue
            t = int(p * MOD32)
            key = f"(record_id || ':{col}')"
            hsel = _H(d, seed, f"{kind}_{dataset}", key)
            pos = f"CAST(1 + {_H(d, seed, f'{kind}_pos', key)} % length({col}) AS INT)"
            if kind == "make_typos":
                repl = f"chr(CAST(65 + {_H(d, seed, 'typo_ch', key)} % 26 AS INT))"
            else:
                repl = f"chr(CAST(48 + {_H(d, seed, 'digit_ch', key)} % 10 AS INT))"
            expr = (
                f"CASE WHEN {expr} IS NOT NULL AND length({col}) > 0 "
                f"AND {hsel} < {t} THEN "
                f"(substr({expr}, 1, {pos} - 1) || {repl} || substr({expr}, {pos} + 1)) "
                f"ELSE {expr} END"
            )
        p_blank = noise.get("leave_blank", {}).get("cell_probability", 0.0)
        if p_blank > 0:
            t = int(p_blank * MOD32)
            hsel = _H(d, seed, f"blank_{dataset}", f"(record_id || ':{col}')")
            expr = f"CASE WHEN {hsel} < {t} THEN NULL ELSE {expr} END"
        rendered.append(f"{expr} AS {col}" if expr != col else col)
    return rendered


def _row_noise(d: str, seed: int, dataset: str, config: dict):
    rcfg = config.get(dataset, {}).get("row_noise", {})
    p_omit = rcfg.get("omit_row", {}).get("row_probability", 0.0)
    p_dup = rcfg.get("duplicate_row", {}).get("row_probability", 0.0)
    omit_pred = None
    if p_omit > 0:
        omit_pred = (
            f"{_H(d, seed, f'omit_{dataset}', 'record_id')} >= {int(p_omit * MOD32)}"
        )
    dup_pred = None
    if p_dup > 0:
        dup_pred = f"{_H(d, seed, f'dup_{dataset}', 'record_id')} < {int(p_dup * MOD32)}"
    return omit_pred, dup_pred


# ---------------------------------------------------------------------------
# engine path (Spark DataFrames) and oracle path (one DuckDB query)
# ---------------------------------------------------------------------------


def generate_dataset(
    spark: SparkSession,
    dataset: str,
    n_simulants: int,
    *,
    year: int = 2030,
    seed: int = 0,
    config: dict | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate one simulated administrative dataset as a DataFrame.

    The plan is projections/filters/unions over ``spark.range`` only — no
    shuffle, no UDF, whole-stage-codegen throughout; repartitioning or
    retrying any subset regenerates identical rows.
    """
    config = get_config() if config is None else config
    d = "spark"
    rng = spark.range(0, n_simulants, 1, num_partitions) if num_partitions else (
        spark.range(n_simulants)
    )
    pop = rng.selectExpr("id AS sid").selectExpr(
        *[_s(d, f"{e} AS {c}") if e != c else c
          for c, e in _population_cols(d, seed).items()]
    )
    groups = _dataset_groups(d, seed, dataset, year)
    base = None
    for _suffix, pred, cols in groups:
        g = pop.filter(_s(d, pred)).selectExpr(
            *[_s(d, f"{e} AS {c}") for c, e in cols.items()]
        )
        base = g if base is None else base.unionByName(g)
    out_cols = list(groups[0][2].keys())
    omit_pred, dup_pred = _row_noise(d, seed, dataset, config)
    kept = base.filter(omit_pred) if omit_pred else base
    if dup_pred:
        dup = kept.filter(dup_pred).selectExpr(
            "(record_id || '_dup') AS record_id", *[c for c in out_cols if c != "record_id"]
        ).select(*out_cols)
        kept = kept.unionByName(dup)
    return kept.selectExpr(
        *[_s(d, e) for e in _noised_cols(d, seed, dataset, out_cols, config)]
    )


def generate_dataset_sql(
    dataset: str,
    n_simulants: int,
    *,
    year: int = 2030,
    seed: int = 0,
    config: dict | None = None,
) -> str:
    """The DuckDB replay of :func:`generate_dataset` — same spec, same
    hashes, byte-identical output (the catalog oracle)."""
    config = get_config() if config is None else config
    d = "duckdb"
    pop_cols = ", ".join(
        f"{e} AS {c}" if e != c else c for c, e in _population_cols(d, seed).items()
    )
    groups = _dataset_groups(d, seed, dataset, year)
    selects = [
        f"SELECT {', '.join(f'{e} AS {c}' for c, e in cols.items())} FROM pop WHERE {pred}"
        for _suffix, pred, cols in groups
    ]
    base_sql = " UNION ALL ".join(selects)
    out_cols = list(groups[0][2].keys())
    omit_pred, dup_pred = _row_noise(d, seed, dataset, config)
    kept_sql = f"SELECT * FROM base WHERE {omit_pred}" if omit_pred else "SELECT * FROM base"
    if dup_pred:
        others = ", ".join(c for c in out_cols if c != "record_id")
        union_sql = (
            f"SELECT * FROM kept UNION ALL "
            f"SELECT (record_id || '_dup') AS record_id, {others} FROM kept WHERE {dup_pred}"
        )
    else:
        union_sql = "SELECT * FROM kept"
    noised = ", ".join(_noised_cols(d, seed, dataset, out_cols, config))
    return (
        f"WITH pop AS (SELECT {pop_cols} FROM range({n_simulants}) t(sid)), "
        f"base AS ({base_sql}), kept AS ({kept_sql}), unioned AS ({union_sql}) "
        f"SELECT {noised} FROM unioned"
    )


def generate_decennial_census(spark, n_simulants, *, year=2030, seed=0,
                              config=None, num_partitions=None) -> DataFrame:
    """Noisy census enumeration (ref 01:451-459): one row per enumerated
    living simulant plus duplicate enumerations."""
    return generate_dataset(spark, "decennial_census", n_simulants, year=year,
                            seed=seed, config=config, num_partitions=num_partitions)


def generate_social_security(spark, n_simulants, *, year=2029, seed=0,
                             config=None, num_partitions=None) -> DataFrame:
    """SSA Numident transaction records (ref 01:507-512): creation,
    name-change, and date-of-death events per SSA-known simulant."""
    return generate_dataset(spark, "social_security", n_simulants, year=year,
                            seed=seed, config=config, num_partitions=num_partitions)


def generate_taxes_w2_and_1099(spark, n_simulants, *, year=2029, seed=0,
                               config=None, num_partitions=None) -> DataFrame:
    """W2/1099 filings (ref 01:412-422): one row per filing simulant with
    employer, wages, and mailing address."""
    return generate_dataset(spark, "taxes_w2_and_1099", n_simulants, year=year,
                            seed=seed, config=config, num_partitions=num_partitions)


def generate_taxes_1040(spark, n_simulants, *, year=2029, seed=0,
                        config=None, num_partitions=None) -> DataFrame:
    """1040 filings (ref 01:377-387): one row per filing simulant with
    mailing address."""
    return generate_dataset(spark, "taxes_1040", n_simulants, year=year,
                            seed=seed, config=config, num_partitions=num_partitions)


def generate_decennial_census_sql(n_simulants, *, year=2030, seed=0, config=None) -> str:
    return generate_dataset_sql("decennial_census", n_simulants, year=year,
                                seed=seed, config=config)
