"""Property tests for the reproducible-sampling and time-series rollup
operators (the newest scale-toolkit entries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iconic_data_science_spark.catalog import Catalog
from iconic_data_science_spark.operators.sampling import stratified_hash_sample
from iconic_data_science_spark.operators.timeseries import multi_grain_counts


def test_stratified_sample_nesting_and_determinism(spark, sf_dir):
    """Raising a stratum's rate must keep every previously sampled row
    (hash-bucket nesting), never resample; and two runs are identical."""
    cust = Catalog(spark, sf_dir).customer.select("c_custkey", "c_mktsegment")
    lo = stratified_hash_sample(cust, "c_custkey", "c_mktsegment", {"BUILDING": 20})
    hi = stratified_hash_sample(cust, "c_custkey", "c_mktsegment", {"BUILDING": 60})
    lo_ids = {r.c_custkey for r in lo.collect()}
    hi_ids = {r.c_custkey for r in hi.collect()}
    assert lo_ids <= hi_ids
    assert lo_ids == {r.c_custkey for r in lo.collect()}  # rerun identical


def test_stratified_sample_stratum_isolation(spark, sf_dir):
    """Changing one stratum's rate must not affect which rows of another
    stratum are kept."""
    cust = Catalog(spark, sf_dir).customer.select("c_custkey", "c_mktsegment")
    a = stratified_hash_sample(
        cust, "c_custkey", "c_mktsegment", {"BUILDING": 30, "MACHINERY": 10}
    )
    b = stratified_hash_sample(
        cust, "c_custkey", "c_mktsegment", {"BUILDING": 30, "MACHINERY": 90}
    )
    keep = lambda df: {
        r.c_custkey for r in df.filter(F.col("c_mktsegment") == "BUILDING").collect()
    }
    assert keep(a) == keep(b)


def test_multi_grain_counts_conserve_totals(spark, sf_dir):
    """Every grain partitions the event stream: per-grain event sums must
    each equal the table row count."""
    events = Catalog(spark, sf_dir).events
    total = events.count()
    sums = {
        r.grain: r.s
        for r in multi_grain_counts(events)
        .groupBy("grain")
        .agg(F.sum("n_events").alias("s"))
        .collect()
    }
    assert sums == {"minute": total, "hour": total, "day": total}


def test_multi_grain_buckets_align(spark, sf_dir):
    """Coarser buckets must contain their finer buckets' counts: summing
    minute buckets up to the hour reproduces the hour rows."""
    events = Catalog(spark, sf_dir).events
    g = multi_grain_counts(events)
    minute_up = (
        g.filter(F.col("grain") == "minute")
        .withColumn(
            "h", F.unix_micros(F.date_trunc("hour", F.timestamp_micros(F.col("bucket_us"))))
        )
        .groupBy("h", "event_type")
        .agg(F.sum("n_events").alias("n"))
    )
    hour = g.filter(F.col("grain") == "hour").select(
        F.col("bucket_us").alias("h"), "event_type", F.col("n_events").alias("n")
    )
    assert minute_up.exceptAll(hour).count() == 0
    assert hour.exceptAll(minute_up).count() == 0


def test_weighted_sample_determinism_and_rule(spark, sf_dir):
    """The weighted Bernoulli sampler must (a) be identical across runs,
    (b) reproduce the documented integer rule exactly (md5-fold draw ×
    total weight < target × weight × space), and (c) never keep a
    zero-weight row."""
    import hashlib

    from iconic_data_science_spark.operators.sampling import weighted_bernoulli_sample

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "n_chars")
    got = weighted_bernoulli_sample(docs, "doc_id", "n_chars", target_n=50)
    kept = {r.doc_id for r in got.collect()}
    assert kept == {r.doc_id for r in got.collect()}  # rerun identical

    rows = {r.doc_id: r.n_chars for r in docs.collect()}
    total = sum(rows.values())
    fold = lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16)  # noqa: E731
    expect = {
        d for d, w in rows.items() if (fold(d) % 1_000_000) * total < 50 * 1_000_000 * w
    }
    assert kept == expect
    # E[|kept|] = 50; a 5x band is ~7 sigma for 500 Bernoulli draws
    assert 10 <= len(kept) <= 250

    zeroed = docs.withColumn("n_chars", F.lit(0).cast("long"))
    assert weighted_bernoulli_sample(zeroed, "doc_id", "n_chars", 50).count() == 0


def test_weighted_sample_weight_monotone(spark, sf_dir):
    """Scaling EVERY weight by the same factor must not change the kept
    set (the rule is scale-free: u*W < n*w*S on both sides), and a row
    whose weight saturates (target*w >= W) is always kept."""
    from iconic_data_science_spark.operators.sampling import weighted_bernoulli_sample

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "n_chars")
    base = {
        r.doc_id
        for r in weighted_bernoulli_sample(docs, "doc_id", "n_chars", 50).collect()
    }
    scaled = docs.withColumn("n_chars", (F.col("n_chars") * 7).cast("long"))
    assert base == {
        r.doc_id
        for r in weighted_bernoulli_sample(scaled, "doc_id", "n_chars", 50).collect()
    }
    # one row with ~all the weight: p saturates at 1 regardless of draw
    heavy = docs.withColumn(
        "n_chars",
        F.when(F.col("doc_id") == 0, F.lit(10_000_000)).otherwise(F.lit(1)).cast("long"),
    )
    kept = {
        r.doc_id
        for r in weighted_bernoulli_sample(heavy, "doc_id", "n_chars", 10).collect()
    }
    assert 0 in kept


def test_group_uniform_k_exact_size_and_reproducible(spark, sf_dir):
    from iconic_data_science_spark.catalog import Catalog
    from iconic_data_science_spark.operators.sampling import group_uniform_k

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "source", "lang")
    out = group_uniform_k(docs, "source", "doc_id", 7)
    per = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    avail = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {s: min(7, n) for s, n in avail.items() if min(7, n) > 0}
    # reproducible: same rows on a second run
    a = sorted((r.source, r.doc_id) for r in out.collect())
    b = sorted((r.source, r.doc_id) for r in group_uniform_k(docs, "source", "doc_id", 7).collect())
    assert a == b


def test_group_uniform_k_independent_of_partitioning(spark, sf_dir):
    """The sample is content-determined: repartitioning the input must
    not change which rows are kept (df.sample would)."""
    from iconic_data_science_spark.catalog import Catalog
    from iconic_data_science_spark.operators.sampling import group_uniform_k

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "source")
    a = sorted((r.source, r.doc_id) for r in group_uniform_k(docs, "source", "doc_id", 5).collect())
    b = sorted(
        (r.source, r.doc_id)
        for r in group_uniform_k(docs.repartition(13), "source", "doc_id", 5).collect()
    )
    assert a == b


def test_weighted_sample_large_target_not_empty(spark, sf_dir):
    """target_n*bucket_space >= 1e14 used to overflow the decimal(14,0)
    literal to NULL (empty sample); with the widened literal a target
    beyond the row count keeps every row, and a too-large parameter
    raises instead of silently emptying."""
    import pytest as _pytest

    from iconic_data_science_spark.catalog import Catalog
    from iconic_data_science_spark.operators.sampling import weighted_bernoulli_sample

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.length("text").cast("long").alias("w")
    )
    n = docs.count()
    kept = weighted_bernoulli_sample(docs, "doc_id", "w", target_n=10**9).count()
    assert kept == n
    with _pytest.raises(ValueError, match="bucket_space"):
        weighted_bernoulli_sample(docs, "doc_id", "w", target_n=10, bucket_space=10**8)
    with _pytest.raises(ValueError, match="decimal"):
        weighted_bernoulli_sample(docs, "doc_id", "w", target_n=10**15)


def test_global_uniform_n_exact_and_partition_invariant(spark, sf_dir):
    """Exactly n rows, identical set under repartitioning, nested in a
    larger n (prefix property of the md5 ranking)."""
    from iconic_data_science_spark.operators.sampling import global_uniform_n

    docs = Catalog(spark, sf_dir).documents.select("doc_id")
    a = sorted(r.doc_id for r in global_uniform_n(docs, "doc_id", 50).collect())
    assert len(a) == 50
    b = sorted(r.doc_id for r in global_uniform_n(docs.repartition(13), "doc_id", 50).collect())
    assert a == b
    big = sorted(r.doc_id for r in global_uniform_n(docs, "doc_id", 100).collect())
    assert set(a) <= set(big)


def test_gap_fill_hand_series(spark):
    """Gap-fill triple on a hand series (one type, hours 100..104 with
    103 missing and 101-102 missing): locf carries the last observed
    sum, interpolation is the exact weighted average, edges before the
    first / after the last observation stay NULL, and observed rows
    pass through untouched."""
    import datetime as dt

    from iconic_data_science_spark.operators.timeseries import gap_fill

    def at(h, m=0):
        return dt.datetime(1970, 1, 1) + dt.timedelta(hours=h, minutes=m)

    rows = [
        # hour 100: two events summing 3.50 -> 350 cents
        (1, at(100, 5), 1, "click", 1.25, "{}"),
        (2, at(100, 40), 1, "click", 2.25, "{}"),
        # hours 101, 102 missing; hour 103: 9.50 -> 950
        (3, at(103, 10), 2, "click", 9.50, "{}"),
        # hour 104 missing is OUTSIDE the span (103 is the max) -> no row
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r.bucket_h: r for r in gap_fill(ev).collect()}
    assert sorted(out) == [100, 101, 102, 103]
    assert (out[100].observed_cents, out[100].locf_cents, out[100].interp_cents) == (350, 350, 350)
    # interp(101) = (350*(103-101) + 950*(101-100)) div 3 = 1650 div 3 = 550
    assert (out[101].observed_cents, out[101].locf_cents, out[101].interp_cents) == (None, 350, 550)
    # interp(102) = (350*1 + 950*2) div 3 = 2250 div 3 = 750
    assert (out[102].observed_cents, out[102].locf_cents, out[102].interp_cents) == (None, 350, 750)
    assert (out[103].observed_cents, out[103].locf_cents, out[103].interp_cents) == (950, 950, 950)

    # single-observation type: span collapses to one row, no interior
    solo = spark.createDataFrame(
        [(9, at(50, 1), 3, "signup", 4.00, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    srows = gap_fill(solo).collect()
    assert len(srows) == 1
    r = srows[0]
    assert (r.bucket_h, r.observed_cents, r.locf_cents, r.interp_cents) == (50, 400, 400, 400)
