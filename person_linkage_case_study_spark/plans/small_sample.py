"""Small_sample-shaped dataset synthesis — the system-level parity harness.

The reference's small_sample case study (executed notebooks under
diagnostics/executed_notebooks/small_sample/) links a ~11,043-record
simulated census against reference files built from simulated SSA/tax
records (geobase ≈32,951 rows, name_dob ≈20,110 rows), confirms PIKs for
89.38% of input records (03_link_datasets.ipynb cell 150), with 99.60% of
assigned PIKs correct (04_calculate_ground_truth_accuracy.ipynb cell 49)
and 0.45% of records impossible to PIK (04 cell 20). Pass-level profile
(03 cells 86-143): the first geokey pass finds the bulk of the matches
(6,950 of 27,542 compared pairs), later passes mop up progressively less,
and confirm drops deceased links (115) and multi-PIK conflicts (4).

pseudopeople (the reference's simulated-population source) is not in this
environment, so exact record-for-record parity is impossible; this module
synthesizes a dataset with the same STRUCTURE — households, SSA numident
transactions with alternate names/DOBs and dates of death, tax address
records, a noisy census with nicknames/typos/GQ/fake names/duplicates —
runs the identical reference-file builders and cascade, and the test
(tests/test_small_sample_parity.py) asserts the reference's system-level
metrics within bands.

Everything is deterministic: structural choices are murmur3 hashes of the
simulant id (F.hash), and the notebook-02 custom noise layer is the seeded
X3 generators (sources/noise.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.noise import shuffle_columns, split_columns_incorrectly

# name pools: syllable-composed so the vocabulary is wide enough that
# distinct simulants rarely collide on (name, dob) but JW-close variants
# still exercise fuzzy levels
_F1 = ["JAM", "ROB", "LIN", "MAR", "DAV", "SAR", "KAR", "TOM", "BEN", "LIS", "NAT", "PAU"]
_F2 = ["ES", "ERT", "DA", "IA", "ID", "AH", "EN", "AS", "JAMIN", "ETTE", "HAN", "LINE"]
_L1 = ["SMI", "JOHN", "WIL", "BRO", "GAR", "MIL", "DAV", "LOP", "WIL", "AND", "TAY", "MOO", "CLA", "HAR"]
_L2 = ["TH", "SON", "LIAMS", "WN", "CIA", "LER", "IS", "EZ", "SON", "ERSON", "LOR", "RE", "RK", "RIS"]
_STREETS = ["MAPLE", "OAK", "CEDAR", "ELM", "PINE", "BIRCH", "WALNUT", "SPRUCE",
            "HICKORY", "ASPEN", "WILLOW", "LAUREL", "MAGNOLIA", "JUNIPER", "ALDER",
            "HAWTHORN", "SYCAMORE", "POPLAR", "CHESTNUT", "DOGWOOD"]
_CITIES = ["SPRINGFIELD", "RIVERTON", "LAKEVIEW", "FAIRVIEW", "GREENVILLE",
           "BRISTOL", "CLINTON", "GEORGETOWN", "SALEM", "MADISON", "ASHLAND", "DOVER"]
_STATES = ["WA", "OR", "CA", "NV", "ID", "MT", "UT", "AZ"]

# the nickname pairs the preprocessing standardizes (plans/preprocess.py
# NICKNAME_STANDARDIZATIONS; reference 03:406-435)
_NICKNAMES = [("Bill", "William"), ("Chuck", "Charles"), ("Matt", "Matthew")]

FAKE_NAMES = ["UNKNOWN", "REFUSED", "XXX"]

CENSUS_DAY = "2030-04-01"


def _arr(vals):
    return F.array(*[F.lit(v) for v in vals])


def _pick(pool, h):
    return F.element_at(_arr(pool), (h % len(pool) + 1).cast("int"))


def _h(col, salt: int):
    return F.abs(F.hash(col, F.lit(salt)))


def synthesize_small_sample(
    spark: SparkSession, n_simulants: int = 12_000, seed: int = 7
) -> dict[str, DataFrame]:
    """Build the simulated administrative world. Returns a dict with:

    ``simulants``         (sid, ssn?, names, dob, address, household, flags)
    ``ssa_numident``      transaction records (alternate names/DOBs, DOD)
    ``tax_addresses``     mailing-address records keyed by ssn
    ``census_raw``        the noisy 2030 census input file
    ``census_ground_truth``  (record_id, simulant_id)
    ``source_truth``      (ssn, simulant_id) for reference sidecars
    ``fake_names``        the PVS fake-name list
    """
    s = spark.range(n_simulants).select(F.col("id").alias("sid"))
    h = lambda salt: _h(F.col("sid"), salt)  # noqa: E731

    hh = (F.col("sid") / 3).cast("long")
    hhash = lambda salt: _h(hh, salt)  # noqa: E731

    # ~0.25% of simulants share the previous simulant's SSN (reference-file
    # construction collisions -> multi-simulant PIKs, 04 'Collisions')
    shares_ssn = (h(1) % 400 == 0) & (F.col("sid") > 0)
    ssn_owner = F.when(shares_ssn, F.col("sid") - 1).otherwise(F.col("sid"))
    sim = s.select(
        "sid",
        F.concat(F.lit("sim_"), F.col("sid")).alias("simulant_id"),
        (h(2) % 100 >= 6).alias("has_ssa"),  # 94% are in SSA at all
        F.lpad((F.lit(100_000_000) + ssn_owner).cast("string"), 9, "0").alias("ssn"),
        _pick(_F1, h(3)).alias("fn1"),
        _pick(_F2, h(4)).alias("fn2"),
        _pick(_L1, h(5)).alias("ln1"),
        _pick(_L2, h(6)).alias("ln2"),
        F.when(h(7) % 5 != 0, _pick(_F1, h(8))).alias("middle_name"),
        F.date_add(F.lit("1940-01-01").cast("date"), (h(9) % 29200).cast("int")).alias("dob"),
        (h(10) % 90 == 0).alias("deceased"),  # ~1.1%: DOD before census day
        hh.alias("hh"),
    )
    nick_idx = (h(11) % (3 * 50))  # 2% of simulants carry a nickname pair
    sim = sim.withColumn(
        "first_name",
        F.when(
            nick_idx < 3,
            F.element_at(_arr([f for _, f in _NICKNAMES]), (nick_idx + 1).cast("int")),
        ).otherwise(F.concat("fn1", "fn2")),
    ).withColumn(
        "census_first_name",
        F.when(
            nick_idx < 3,
            F.element_at(_arr([n for n, _ in _NICKNAMES]), (nick_idx + 1).cast("int")),
        ).otherwise(F.concat("fn1", "fn2")),
    ).withColumn(
        "last_name",
        F.when(h(12) % 50 == 0, F.concat("ln1", "ln2", F.lit("-"), _pick(_L1, h(13))))
        .otherwise(F.concat("ln1", "ln2")),
    )
    # household address; ~2.5% live in one of 4 GQ facilities
    is_gq = h(14) % 40 == 0
    gq_k = (h(15) % 4 + 1).cast("int")
    sim = sim.select(
        "*",
        F.when(is_gq, F.concat(F.lit("9"), gq_k.cast("string"), F.lit("00")))
        .otherwise(((hhash(20) % 9900) + 1).cast("string"))
        .alias("street_number"),
        F.when(is_gq, F.concat(F.lit("GQ FACILITY "), gq_k.cast("string")))
        .otherwise(F.concat(_pick(_STREETS, hhash(21)), F.lit(" ST")))
        .alias("street_name"),
        F.lit(None).cast("string").alias("unit_number"),
        F.when(is_gq, F.lit("GQTOWN")).otherwise(_pick(_CITIES, hhash(22))).alias("city"),
        F.when(is_gq, F.lit("WA")).otherwise(_pick(_STATES, hhash(23))).alias("state"),
        F.when(is_gq, (F.lit(99900) + gq_k).cast("string"))
        .otherwise(
            F.concat(
                F.lpad((F.lit(100) + hhash(24) % 90).cast("string"), 3, "0"),
                F.lpad((hhash(25) % 100).cast("string"), 2, "0"),
            )
        )
        .alias("zipcode"),
        is_gq.alias("is_gq"),
    )
    # ~5% of (non-GQ) households MOVED after last filing taxes: every
    # member's tax record carries the old address. These households are the
    # reason HHCompSearch exists — the PIKed members are found by
    # name/dob search, their geobase geokeys (the old address) pull in the
    # rest of the family's unconfirmed reference records, and members whose
    # census DOB is missing (elevated to ~23% here; PVS: proxy responses
    # cluster within households) are findable ONLY there, with the 1000×
    # household prior covering the absent DOB evidence
    # (03_link_datasets.ipynb:2982-3131, Wagner & Layne p. 16).
    hhash = lambda salt: _h((F.col("sid") / 3).cast("long"), salt)  # noqa: E731
    moved = (hhash(60) % 20 == 0) & ~F.col("is_gq")
    # old-address street suffix is " RD" (census uses " ST"), so a moved
    # household's old geokey never collides with any current census geokey
    sim = sim.withColumn("moved", moved).select(
        "*",
        F.when(F.col("moved"), ((hhash(61) % 9900) + 1).cast("string"))
        .otherwise(F.col("street_number"))
        .alias("tax_street_number"),
        F.when(F.col("moved"), F.concat(_pick(_STREETS, hhash(62)), F.lit(" RD")))
        .otherwise(F.col("street_name"))
        .alias("tax_street_name"),
        F.when(F.col("moved"), _pick(_CITIES, hhash(63)))
        .otherwise(F.col("city"))
        .alias("tax_city"),
        F.when(F.col("moved"), _pick(_STATES, hhash(64)))
        .otherwise(F.col("state"))
        .alias("tax_state"),
        F.when(
            F.col("moved"),
            F.concat(
                F.lpad((F.lit(100) + hhash(65) % 90).cast("string"), 3, "0"),
                F.lpad((hhash(66) % 100).cast("string"), 2, "0"),
            ),
        )
        .otherwise(F.col("zipcode"))
        .alias("tax_zipcode"),
    )
    return _assemble(spark, sim, seed)


def _assemble(spark, sim, seed) -> dict[str, DataFrame]:
    h = lambda salt: _h(F.col("sid"), salt)  # noqa: E731
    dob_str = F.date_format("dob", "yyyyMMdd")

    ssa = sim.filter("has_ssa")
    dod = F.when(F.col("deceased"), F.lit("2029-06-15")).cast("string")
    base_txn = ssa.select(
        F.concat(F.lit("ssa_"), F.col("sid"), F.lit("_0")).alias("record_id"),
        "ssn",
        "first_name",
        "middle_name",
        "last_name",
        F.lit("20100101").alias("event_date"),
        dob_str.alias("date_of_birth"),
        dod.alias("date_of_death"),
    )
    # name-change transaction (~12.5%): later event, new last name
    name_change = ssa.filter(h(30) % 8 == 0).select(
        F.concat(F.lit("ssa_"), F.col("sid"), F.lit("_1")).alias("record_id"),
        "ssn",
        "first_name",
        "middle_name",
        F.concat(_pick(_L1, h(31)), _pick(_L2, h(32))).alias("last_name"),
        F.lit("20150101").alias("event_date"),
        dob_str.alias("date_of_birth"),
        dod.alias("date_of_death"),
    )
    # DOB-typo transaction (~9%): day shifted by one in an older record
    dob_typo = ssa.filter(h(33) % 11 == 0).select(
        F.concat(F.lit("ssa_"), F.col("sid"), F.lit("_2")).alias("record_id"),
        "ssn",
        "first_name",
        "middle_name",
        "last_name",
        F.lit("20050101").alias("event_date"),
        F.date_format(F.date_add("dob", 1), "yyyyMMdd").alias("date_of_birth"),
        dod.alias("date_of_death"),
    )
    ssa_numident = base_txn.unionByName(name_change).unionByName(dob_typo)

    # tax address records: 92% of SSA simulants file at the household
    # address; ~7.7% also have a stale prior address on file
    taxable = sim.filter("has_ssa").filter(h(40) % 100 < 92)
    cur_addr = taxable.select(
        F.concat(F.lit("tax_"), F.col("sid"), F.lit("_0")).alias("record_id"),
        "ssn",
        F.col("tax_street_number").alias("mailing_address_street_number"),
        F.col("tax_street_name").alias("mailing_address_street_name"),
        F.col("unit_number").alias("mailing_address_unit_number"),
        F.col("tax_city").alias("mailing_address_city"),
        F.col("tax_state").alias("mailing_address_state"),
        F.col("tax_zipcode").alias("mailing_address_zipcode"),
    )
    old_addr = taxable.filter(h(41) % 13 == 0).select(
        F.concat(F.lit("tax_"), F.col("sid"), F.lit("_1")).alias("record_id"),
        "ssn",
        ((h(42) % 9900) + 1).cast("string").alias("mailing_address_street_number"),
        F.concat(_pick(_STREETS, h(43)), F.lit(" AVE")).alias("mailing_address_street_name"),
        F.lit(None).cast("string").alias("mailing_address_unit_number"),
        _pick(_CITIES, h(44)).alias("mailing_address_city"),
        _pick(_STATES, h(45)).alias("mailing_address_state"),
        F.concat(
            F.lpad((F.lit(100) + h(46) % 90).cast("string"), 3, "0"),
            F.lpad((h(47) % 100).cast("string"), 2, "0"),
        ).alias("mailing_address_zipcode"),
    )
    tax_addresses = cur_addr.unionByName(old_addr)

    # ---- the noisy census input file -------------------------------------
    in_census = sim.filter(_h(F.col("sid"), 50) % 1000 < 973)  # ~97.3% enumerated
    # post-name-change simulants: 80% report the new name, 20% the old one
    changed = _h(F.col("sid"), 30) % 8 == 0
    reports_old = changed & (_h(F.col("sid"), 51) % 5 == 0)
    census_last = F.when(
        changed & ~reports_old,
        F.concat(_pick(_L1, _h(F.col("sid"), 31)), _pick(_L2, _h(F.col("sid"), 32))),
    ).otherwise(F.col("last_name"))
    # ~6% name typo: drop the 3rd character (JW stays ≥0.9)
    typo = _h(F.col("sid"), 52) % 17 == 0
    census_first = F.when(
        typo & (F.length("census_first_name") > 4),
        F.concat(
            F.substring("census_first_name", 1, 2), F.expr("substring(census_first_name, 4)")
        ),
    ).otherwise(F.col("census_first_name"))
    # ~0.2% fake-name responses
    census_first = F.when(
        _h(F.col("sid"), 53) % 500 == 0, F.lit("UNKNOWN")
    ).otherwise(census_first)
    # DOB: 3% missing (~23% in moved households — proxy-response clustering;
    # the HHComp-only population), 3.5% day-off-by-one typo, MM/dd/yyyy
    census_dob = F.when(
        (_h(F.col("sid"), 54) % 33 == 0)
        | (F.col("moved") & (_h(F.col("sid"), 57) % 5 == 0)),
        F.lit(None),
    ).otherwise(
        F.when(
            _h(F.col("sid"), 55) % 29 == 0,
            F.date_format(F.date_add("dob", 1), "MM/dd/yyyy"),
        ).otherwise(F.date_format("dob", "MM/dd/yyyy"))
    )
    census_cols = [
        F.col("census_record_id").alias("record_id"),
        F.col("census_first").alias("first_name"),
        F.substring("middle_name", 1, 1).alias("middle_initial"),
        F.col("census_last").alias("last_name"),
        F.col("census_dob").alias("date_of_birth"),
        "street_number",
        "street_name",
        "unit_number",
        "city",
        "state",
        "zipcode",
        F.when(F.col("is_gq"), F.lit("Nursing home")).otherwise(F.lit("Household")).alias(
            "housing_type"
        ),
        "simulant_id",
    ]
    census_base = in_census.withColumn("census_first", census_first).withColumn(
        "census_last", census_last
    ).withColumn("census_dob", census_dob).withColumn(
        "census_record_id", F.concat(F.lit("census_2030_"), F.col("sid"))
    ).select(*census_cols)
    # ~0.8% duplicate enumerations of the same person
    dups = (
        in_census.filter(_h(F.col("sid"), 56) % 120 == 0)
        .withColumn("census_first", F.col("census_first_name"))
        .withColumn("census_last", F.col("last_name"))
        .withColumn("census_dob", F.date_format("dob", "MM/dd/yyyy"))
        .withColumn("census_record_id", F.concat(F.lit("census_2030_"), F.col("sid"), F.lit("_dup")))
        .select(*census_cols)
    )
    census_with_truth = census_base.unionByName(dups)
    census_ground_truth = census_with_truth.select("record_id", "simulant_id")
    census_raw = census_with_truth.drop("simulant_id")
    # notebook-02 census noise layer (cells 42-43): 1% bad column splits,
    # 1% column shuffles — the X3 seeded generators
    census_raw = split_columns_incorrectly(
        census_raw, ["first_name", "middle_initial", "last_name"], 0.01, seed=seed
    )
    census_raw = shuffle_columns(
        census_raw, ["first_name", "middle_initial", "last_name"], 0.01, seed=seed + 1
    )

    source_truth = sim.filter("has_ssa").select("ssn", "simulant_id")
    fake_names = spark.createDataFrame([(n,) for n in FAKE_NAMES], ["fake_name"])
    return {
        "simulants": sim,
        "ssa_numident": ssa_numident,
        "tax_addresses": tax_addresses,
        "census_raw": census_raw,
        "census_ground_truth": census_ground_truth,
        "source_truth": source_truth,
        "fake_names": fake_names,
    }
