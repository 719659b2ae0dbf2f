"""HLL sketch table: error bound vs exact, and the merge identity that
makes sketch tables safe to roll up (union of per-cell sketches gives
the same estimate as sketching the raw column directly)."""

import pyspark.sql.functions as F

from hadoop_stuff_spark.catalog import load_table
from hadoop_stuff_spark.operators.sketches import (
    build_user_sketches,
    distinct_users_between,
    rollup_distinct_users,
    sketch_distinct_users_by_type,
)


def test_sketch_rollup_error_bound(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r.event_type: r.approx_distinct_users
        for r in sketch_distinct_users_by_type(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] - n) / n < 0.02, (t, est[t], n)


def test_sketch_union_equals_direct_sketch(spark, sf_dir):
    """The mergeability contract: rolling up daily sketches must give the
    SAME estimate as one sketch over the raw facts — otherwise persisted
    sketch tables would drift from truth."""
    events = load_table(spark, sf_dir, "events")
    via_table = {
        r.event_type: r.approx_distinct_users
        for r in rollup_distinct_users(build_user_sketches(events)).collect()
    }
    direct = {
        r.event_type: r.est
        for r in events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    assert via_table == direct


def test_sketch_range_rollup_and_persistence(spark, sf_dir, tmp_path):
    """Sketch table survives a parquet round-trip (binary column) and
    answers date-range queries without the fact table."""
    events = load_table(spark, sf_dir, "events")
    table = build_user_sketches(events)
    path = str(tmp_path / "user_sketches")
    table.write.parquet(path)
    reloaded = spark.read.parquet(path)

    lo, hi = (
        events.agg(
            F.date_format(F.min(F.to_date("ts")), "yyyy-MM-dd").alias("lo"),
            F.date_format(F.date_add(F.max(F.to_date("ts")), 1), "yyyy-MM-dd").alias("hi"),
        ).collect()[0]
    )
    est = distinct_users_between(reloaded, lo, hi).collect()[0].approx_distinct_users
    exact = events.agg(F.countDistinct("user_id").alias("n")).collect()[0].n
    assert abs(est - exact) / exact < 0.02


# ---------------------------------------------------------------------------
# theta sketch set algebra


def test_theta_set_algebra_exact_below_k(spark):
    """Below 2^lg_k distinct values a theta sketch is in exact mode, so
    on constructed sets with known overlap every estimate must be EXACT:
    |A|, |B|, A∩B, A∪B, A\\B, B\\A."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        build_user_theta_sketches,
        theta_audience_overlap,
    )

    a = spark.range(0, 1000).select(
        F.lit("2024-01-01").cast("timestamp").alias("ts"),
        F.lit("purchase").alias("event_type"),
        F.col("id").alias("user_id"),
    )
    b = spark.range(500, 1500).select(
        F.lit("2024-01-02").cast("timestamp").alias("ts"),
        F.lit("click").alias("event_type"),
        F.col("id").alias("user_id"),
    )
    # duplicates must not matter: double up A's rows
    events = a.unionAll(a).unionAll(b)
    row = theta_audience_overlap(
        build_user_theta_sketches(events), "purchase", "click"
    ).collect()[0]
    assert (row.n_a, row.n_b) == (1000.0, 1000.0)
    assert row.n_both == 500.0
    assert row.n_either == 1500.0
    assert (row.n_only_a, row.n_only_b) == (500.0, 500.0)
    assert abs(row.jaccard - 500 / 1500) < 1e-12


def test_theta_union_of_cells_matches_direct_sketch(spark, sf_dir):
    """Merge identity: unioning the daily per-cell sketches must estimate
    the same distinct count as one sketch over the raw facts — the
    property that makes the persisted table answer any rollup."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.operators.sketches import (
        THETA_LG_K,
        build_user_theta_sketches,
        theta_distinct_users_by_type,
    )

    events = load_table(spark, sf_dir, "events")
    via_table = {
        r.event_type: r.approx_distinct_users
        for r in theta_distinct_users_by_type(
            build_user_theta_sketches(events)
        ).collect()
    }
    direct = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(
            F.theta_sketch_estimate(
                F.theta_sketch_agg("user_id", F.lit(THETA_LG_K))
            ).alias("n")
        )
        .collect()
    }
    assert via_table == direct


def test_theta_estimation_mode_error_bounded(spark):
    """Past exact mode (100k distinct at lg_k=12) estimates stay within
    a few standard errors (~0.8% rse at 2^12 entries → assert 5%)."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        build_user_theta_sketches,
        theta_distinct_users_by_type,
    )

    events = spark.range(100_000).select(
        F.lit("2024-01-01").cast("timestamp").alias("ts"),
        F.lit("view").alias("event_type"),
        F.col("id").alias("user_id"),
    )
    est = theta_distinct_users_by_type(
        build_user_theta_sketches(events, lg_k=12)
    ).collect()[0]
    assert abs(est.approx_distinct_users - 100_000) / 100_000 < 0.05


def test_theta_retention_matches_exact_sets(spark, sf_dir):
    """Retention report vs exact per-day user sets on the testdata
    (well below exact-mode threshold → equality, not tolerance)."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.operators.sketches import (
        build_user_theta_sketches,
        theta_retention,
    )

    events = load_table(spark, sf_dir, "events")
    d0, d1 = [
        str(r.d)
        for r in events.select(F.to_date("ts").alias("d"))
        .distinct()
        .orderBy("d")
        .limit(2)
        .collect()
    ]
    row = theta_retention(
        build_user_theta_sketches(events), d0, d1
    ).collect()[0]
    day = lambda d: {  # noqa: E731
        r.user_id
        for r in events.filter(F.to_date("ts") == d)
        .select("user_id")
        .distinct()
        .collect()
    }
    a, b = day(d0), day(d1)
    assert row.n_day_a == float(len(a))
    assert row.n_retained == float(len(a & b))
    assert row.n_churned == float(len(a - b))


# ---------------------------------------------------------------------------
# KLL quantile sketch tables


def test_kll_merged_quantiles_within_rank_error(spark, sf_dir):
    """Each merged-sketch quantile must be a value whose TRUE rank in the
    exact per-type distribution is within the sketch's rank-error bound
    (~1.65% at k=200; assert 3% for merge headroom)."""
    import bisect

    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.operators.sketches import (
        build_value_kll_sketches,
        kll_quantiles_by_type,
    )

    events = load_table(spark, sf_dir, "events")
    got = kll_quantiles_by_type(build_value_kll_sketches(events)).collect()
    exact: dict[str, list[float]] = {}
    for r in events.select("event_type", "value").collect():
        exact.setdefault(r.event_type, []).append(float(r.value))
    for vals in exact.values():
        vals.sort()
    for row in got:
        vals = exact[row.event_type]
        for p, est in ((0.5, row.p50), (0.95, row.p95), (0.99, row.p99)):
            rank = bisect.bisect_right(vals, est) / len(vals)
            assert abs(rank - p) <= 0.03, (row.event_type, p, est, rank)


def test_kll_fold_matches_single_sketch(spark):
    """Folding daily sketches must agree with one sketch over all rows
    (same quantile within twice the single-sketch rank error)."""
    import bisect

    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        build_value_kll_sketches,
        kll_quantiles_by_type,
    )

    rows = spark.range(50_000).select(
        F.concat(F.lit("2024-01-"), F.lpad((F.col("id") % 28 + 1).cast("string"), 2, "0"))
        .cast("timestamp")
        .alias("ts"),
        F.lit("view").alias("event_type"),
        (F.pmod(F.col("id") * 2654435761, F.lit(100_000)).cast("double") / 100).alias("value"),
    )
    got = kll_quantiles_by_type(build_value_kll_sketches(rows)).collect()[0]
    vals = sorted(float(r.value) for r in rows.select("value").collect())
    for p, est in ((0.5, got.p50), (0.95, got.p95), (0.99, got.p99)):
        rank = bisect.bisect_right(vals, est) / len(vals)
        assert abs(rank - p) <= 0.033, (p, est, rank)


# ---------------------------------------------------------------------------
# count-min sketch frequency tables


def test_cms_point_estimates_one_sided_and_merge_consistent(spark):
    """CMS guarantees: estimate >= true count, <= true + eps*N (with
    high probability); merging per-day sketches must answer like one
    sketch over everything. Constructed frequencies make both checkable
    exactly."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        CMS_EPS,
        build_user_cms,
        cms_point_estimates,
    )

    # user u occurs (u+1) times, spread across 4 days
    events = (
        spark.range(200)
        .select(F.col("id").alias("u"))
        .select(
            F.col("u"),
            F.explode(F.sequence(F.lit(0), F.col("u"))).alias("i"),
        )
        .select(
            F.concat(
                F.lit("2024-03-0"), ((F.col("i") % 4) + 1).cast("string")
            ).cast("timestamp").alias("ts"),
            F.col("u").alias("user_id"),
        )
    )
    n_total = events.count()
    sketches = build_user_cms(events)
    assert sketches.count() == 4

    probes = [0, 1, 50, 123, 199, 100_000]
    est = cms_point_estimates(spark, sketches, probes)
    for u in probes[:-1]:
        true = u + 1
        assert est[u] >= true
        assert est[u] <= true + CMS_EPS * n_total + 1
    assert est[100_000] <= CMS_EPS * n_total + 1  # absent key

    # date-range scoping: only days 1-2
    est_range = cms_point_estimates(
        spark, sketches, [199], start="2024-03-01", end="2024-03-03"
    )
    true_range = events.filter(
        (F.col("user_id") == 199) & (F.to_date("ts") < F.lit("2024-03-03"))
    ).count()
    assert est_range[199] >= true_range
    assert est_range[199] <= true_range + CMS_EPS * n_total + 1


def test_cms_empty_range_returns_zeros(spark):
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        build_user_cms,
        cms_point_estimates,
    )

    events = spark.range(10).select(
        F.lit("2024-03-01").cast("timestamp").alias("ts"),
        F.col("id").alias("user_id"),
    )
    sketches = build_user_cms(events)
    assert cms_point_estimates(
        spark, sketches, [1, 2], start="2030-01-01"
    ) == {1: 0, 2: 0}


def test_cms_vectorized_estimates_match_jvm(spark):
    """The executor-side numpy estimator must be BIT-EXACT with the JVM
    CountMinSketch reader on the same blob — including negative and
    64-bit-range keys — and with_frequency_estimates must agree with the
    driver-side cms_point_estimates for merged multi-day tables."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        _parse_cms_blob,
        build_user_cms,
        cms_point_estimates,
        with_frequency_estimates,
    )

    events = spark.range(5000).select(
        F.concat(F.lit("2024-04-0"), ((F.col("id") % 3) + 1).cast("string"))
        .cast("timestamp")
        .alias("ts"),
        (F.col("id") % 37 - 5).alias("user_id"),  # includes negative keys
    )
    sketches = build_user_cms(events)

    # bit-exact single-blob parity vs the JVM reader
    blob = bytes(sketches.limit(1).collect()[0].user_cms)
    total, hash_a, table = _parse_cms_blob(blob)
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(blob)
    )
    assert total == cms.totalCount()
    import numpy as np

    prime = (1 << 31) - 1
    for item in [-5, -1, 0, 17, 31, 999, 2**40 + 7, -(2**40)]:
        h_item = np.int64(np.array([item], dtype=np.int64)).view(np.uint64)
        mins = None
        for i in range(table.shape[0]):
            h = hash_a[i] * h_item
            h = (h + (h >> np.uint64(32))) & np.uint64(prime)
            v = table[i][(h % np.uint64(table.shape[1])).astype(np.int64)]
            mins = v if mins is None else np.minimum(mins, v)
        assert int(mins[0]) == cms.estimateCount(int(item)), item

    # frame-level estimates == driver-side point estimates (merged table)
    probe_keys = [-5, 0, 17, 31, 100_000]
    probes = spark.createDataFrame([(k,) for k in probe_keys], "user_id long")
    got = {
        r.user_id: r.est_count
        for r in with_frequency_estimates(
            spark, sketches, probes, "user_id"
        ).collect()
    }
    want = cms_point_estimates(spark, sketches, probe_keys)
    assert got == want

    # and the estimates obey the one-sided guarantee vs true counts
    true = {
        r.user_id: r.n
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for k in probe_keys[:-1]:
        if k in true:
            assert got[k] >= true[k]


def test_corpus_overlap_exact_below_capacity(spark, sf_dir):
    """Two constructed corpora with known content overlap: the no-join
    theta report must be exact (document counts are far below sketch
    capacity), including whitespace-normalization (same content, new
    spacing → still shared)."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.catalog import load_table
    from hadoop_stuff_spark.operators.sketches import corpus_overlap

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") < 300)
    # B shares docs 200-299 with A but with doubled whitespace (the
    # fingerprint normalizes it), plus 200 docs A lacks
    shared = docs.filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 300)
    ).withColumn("text", F.regexp_replace("text", " ", "  "))
    only_b = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 500)
    )
    b = shared.unionByName(only_b)

    # ground truth on the SAME fingerprint definition (content may repeat
    # across doc_ids in the synthetic corpus, so count distinct contents)
    from hadoop_stuff_spark.functions.text import fingerprint_md5

    fp = lambda df: {r.fp for r in df.select(fingerprint_md5("text").alias("fp")).collect()}  # noqa: E731
    fa, fb = fp(a), fp(b)

    row = corpus_overlap(a, b).collect()[0]
    assert row.n_docs_a == float(len(fa))
    assert row.n_docs_b == float(len(fb))
    assert row.n_shared == float(len(fa & fb))
    assert row.n_only_a == float(len(fa - fb))
    assert row.n_only_b == float(len(fb - fa))
    assert len(fa & fb) > 0  # the scenario is non-degenerate


def test_cms_string_keys_bit_exact_with_jvm(spark):
    """String-key path: python buckets == the JVM's private
    getHashBuckets (reflection), and frame estimates == JVM
    estimateCount — incl. multi-byte utf-8 and empty strings."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        _string_buckets,
        with_string_frequency_estimates,
    )

    words = ["apple", "banana", "apple", "cherry", "日本語テスト", "", "apple"]
    df = spark.createDataFrame([(w,) for w in words], "k string")
    sketch = df.agg(
        F.count_min_sketch("k", F.lit(0.01), F.lit(0.95), F.lit(42)).alias("user_cms")
    ).withColumn("event_date", F.lit("2024-01-01").cast("date"))

    blob = bytes(sketch.collect()[0].user_cms)
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(blob)
    )

    # bucket-exact vs the JVM's private hash (reflection ground truth)
    gw = spark.sparkContext._gateway
    cls = jvm.java.lang.Class.forName(
        "org.apache.spark.util.sketch.CountMinSketchImpl"
    )
    params = gw.new_array(jvm.java.lang.Class, 3)
    params[0] = jvm.java.lang.Class.forName("[B")
    params[1] = jvm.java.lang.Integer.TYPE
    params[2] = jvm.java.lang.Integer.TYPE
    m = cls.getDeclaredMethod("getHashBuckets", params)
    m.setAccessible(True)
    for s in ["apple", "x", "日本語", "", "a b c", "\x00\x7f"]:
        args = gw.new_array(jvm.java.lang.Object, 3)
        args[0] = bytearray(s.encode("utf-8"))
        args[1] = jvm.java.lang.Integer(7)
        args[2] = jvm.java.lang.Integer(2000)
        assert _string_buckets(s, 7, 2000) == list(m.invoke(None, args)), s

    probes = spark.createDataFrame(
        [("apple",), ("banana",), ("missing",), ("日本語テスト",)], "k string"
    )
    got = {
        r.k: r.est_count
        for r in with_string_frequency_estimates(spark, sketch, probes, "k").collect()
    }
    for k, v in got.items():
        assert v == cms.estimateCount(k), k
    assert got["apple"] >= 3


def test_theta_blob_exact_detection_and_disjointness_gate(spark):
    """The decontamination pre-screen may only claim proof when both
    sketches are exact-mode: pin the blob-preamble exactness detector
    against real theta_sketch_agg output on both sides of the capacity
    cliff, then the gate itself on disjoint vs overlapping corpora."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        shingle_overlap_gate,
        theta_blob_is_exact,
    )

    def blob(n):
        return bytes(
            spark.range(n)
            .agg(F.theta_sketch_agg(F.col("id").cast("string"), F.lit(12)).alias("s"))
            .collect()[0]
            .s
        )

    assert theta_blob_is_exact(blob(0))  # empty form (serVer 3)
    assert theta_blob_is_exact(blob(1))  # single-item form (serVer 3)
    assert theta_blob_is_exact(blob(4096))  # at capacity: still exact
    assert not theta_blob_is_exact(blob(4097))  # over capacity: estimating
    assert not theta_blob_is_exact(b"")  # unreadable: never claim proof

    docs_a = spark.createDataFrame(
        [(i, f"alpha bravo charlie delta echo{i} foxtrot") for i in range(30)],
        "doc_id long, text string",
    )
    disjoint = spark.createDataFrame(
        [(i, f"golf hotel india juliet kilo{i} lima") for i in range(30)],
        "doc_id long, text string",
    )
    overlapping = spark.createDataFrame(
        [(0, "alpha bravo charlie november oscar")], "doc_id long, text string"
    )
    g1 = shingle_overlap_gate(docs_a, disjoint)
    assert g1["provably_disjoint"] and g1["est_shared"] == 0
    assert g1["corpus_exact"] and g1["holdout_exact"]
    g2 = shingle_overlap_gate(docs_a, overlapping)
    assert not g2["provably_disjoint"] and g2["est_shared"] >= 1  # "alpha bravo charlie"


def test_shingle_sketch_blobs_merge_losslessly_and_gate_from_blob(spark):
    """Incremental gate path: per-slice shingle sketch blobs folded with
    merge_theta_blobs must give the gate the same answers as one
    whole-corpus sketch, and over-capacity unions must refuse proof."""
    from hadoop_stuff_spark.operators.sketches import (
        merge_theta_blobs,
        shingle_overlap_gate,
        sketch_shingles_blob,
        theta_blob_is_exact,
    )

    slice_a = spark.createDataFrame(
        [(i, f"alpha bravo charlie delta echo{i} foxtrot") for i in range(20)],
        "doc_id long, text string",
    )
    slice_b = spark.createDataFrame(
        [(i, f"golf hotel india juliet kilo{i} lima") for i in range(20, 40)],
        "doc_id long, text string",
    )
    whole = slice_a.unionByName(slice_b)
    merged = merge_theta_blobs(
        spark, [sketch_shingles_blob(slice_a), sketch_shingles_blob(slice_b)]
    )
    assert theta_blob_is_exact(merged)

    disjoint_holdout = spark.createDataFrame(
        [(99, "mike november oscar papa quebec romeo")], "doc_id long, text string"
    )
    overlapping_holdout = spark.createDataFrame(
        [(99, "golf hotel india zulu yankee")], "doc_id long, text string"
    )
    for holdout in (disjoint_holdout, overlapping_holdout):
        from_blob = shingle_overlap_gate(whole, holdout, corpus_blob=merged)
        direct = shingle_overlap_gate(whole, holdout)
        assert from_blob["provably_disjoint"] == direct["provably_disjoint"]
        assert from_blob["est_shared"] == direct["est_shared"]
    assert shingle_overlap_gate(whole, disjoint_holdout, corpus_blob=merged)[
        "provably_disjoint"
    ]

    # capacity regression (code review): a union of two exact lg_k=20
    # slices totalling >4096 distinct shingles must STAY exact — the
    # default theta_union caps at 2^12 and silently downsampled it
    import pyspark.sql.functions as F

    def chunk(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id AS doc_id",
            "concat('a', id, ' b', id, ' c', id, ' d', id, ' e', id) AS text",
        )

    big_merged = merge_theta_blobs(
        spark, [sketch_shingles_blob(chunk(0, 1500)), sketch_shingles_blob(chunk(1500, 3000))]
    )
    assert theta_blob_is_exact(big_merged)  # 9000 distinct, lg_k=20
    est = (
        spark.range(1)
        .select(F.theta_sketch_estimate(F.lit(bytearray(big_merged))).alias("e"))
        .collect()[0]
        .e
    )
    assert est == 9000  # exact mode: estimate IS the distinct count

    # over-capacity union leaves exact mode -> proof correctly withheld
    # 3 shingles per doc, all distinct across docs -> 9000 distinct
    # shingles, past lg_k=12's 4096 capacity
    big = chunk(0, 3000)
    over = merge_theta_blobs(
        spark,
        [sketch_shingles_blob(big, lg_k=12), sketch_shingles_blob(slice_a, lg_k=12)],
    )
    assert not theta_blob_is_exact(over)
    g = shingle_overlap_gate(big, disjoint_holdout, corpus_blob=over)
    assert not g["provably_disjoint"]


def test_cms_string_buckets_vectorized_equals_scalar():
    """The numpy length-class murmur3 (`_string_buckets_np`) must agree
    bucket-for-bucket with the JVM-verified scalar `_string_buckets` on
    empty, ascii, multi-byte utf-8, long, and every-tail-length strings."""
    import numpy as np

    from hadoop_stuff_spark.operators.sketches import (
        _string_buckets,
        _string_buckets_np,
    )

    strings = [
        "", "a", "ab", "abc", "abcd", "abcde",  # every block/tail shape
        "apple", "banana", "日本語テスト", "\x00\x7f", "a b c",
        "x" * 101, "émoji🙂mix", "the quick brown fox " * 20,
    ]
    byts = np.array([s.encode("utf-8") for s in strings], dtype=object)
    got = _string_buckets_np(byts, 7, 2000)
    for i, s in enumerate(strings):
        assert list(got[i]) == _string_buckets(s, 7, 2000), s


def test_kll_drift_detects_shift_and_ignores_none(spark):
    """KS drift from sketch tables: identical before/after distributions
    → KS within sketch rank error of 0; a mean-shifted after-period →
    KS within a few points of the exact empirical statistic."""
    import numpy as np
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        build_value_kll_sketches,
        kll_drift_by_type,
    )

    n = 20_000
    base = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "2024-05-01").otherwise("2024-05-20")
        .cast("timestamp").alias("ts"),
        F.lit("stable").alias("event_type"),
        (F.pmod(F.col("id") * 2654435761, F.lit(10_000)).cast("double") / 100).alias("value"),
    )
    shifted = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "2024-05-01").otherwise("2024-05-20")
        .cast("timestamp").alias("ts"),
        F.lit("drifted").alias("event_type"),
        (
            F.pmod(F.col("id") * 2654435761, F.lit(10_000)).cast("double") / 100
            + F.when(F.to_date("ts") >= "2024-05-10", 40.0).otherwise(0.0)
        ).alias("value"),
    )
    sketches = build_value_kll_sketches(base.unionByName(shifted))
    got = {
        r.event_type: r.ks_distance
        for r in kll_drift_by_type(sketches, "2024-05-10").collect()
    }
    assert got["stable"] <= 0.05, got
    # exact KS for uniform[0,100] vs uniform[40,140] is 0.4
    vals_a = np.sort((np.arange(0, n, 2, dtype=np.uint64) * 2654435761 % 10_000) / 100)
    vals_b = np.sort((np.arange(1, n, 2, dtype=np.uint64) * 2654435761 % 10_000) / 100 + 40.0)
    grid = np.union1d(vals_a, vals_b)
    exact_ks = np.max(np.abs(
        np.searchsorted(vals_a, grid, side="right") / len(vals_a)
        - np.searchsorted(vals_b, grid, side="right") / len(vals_b)
    ))
    assert abs(got["drifted"] - exact_ks) <= 0.06, (got["drifted"], exact_ks)


def test_kll_psi_flags_shift_and_not_stability(spark):
    """PSI from sketch tables: stable stream ~0; a mean-shifted stream
    lands deep in the 'major shift' band (>0.25) and close to the exact
    binned PSI computed from the raw values."""
    import numpy as np
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        build_value_kll_sketches,
        kll_psi_by_type,
    )

    n = 20_000
    def stream(name, shift):
        return spark.range(n).select(
            F.when(F.col("id") % 2 == 0, "2024-05-01").otherwise("2024-05-20")
            .cast("timestamp").alias("ts"),
            F.lit(name).alias("event_type"),
            (
                F.pmod(F.col("id") * 2654435761, F.lit(10_000)).cast("double") / 100
                + F.when(F.to_date("ts") >= "2024-05-10", float(shift)).otherwise(0.0)
            ).alias("value"),
        )

    sketches = build_value_kll_sketches(
        stream("stable", 0).unionByName(stream("drifted", 40))
    )
    got = {
        r.event_type: r.psi
        for r in kll_psi_by_type(sketches, "2024-05-10").collect()
    }
    assert got["stable"] <= 0.05, got
    assert got["drifted"] > 0.25, got

    # exact binned PSI on the raw values, same decile-edge construction
    va = (np.arange(0, n, 2, dtype=np.uint64) * 2654435761 % 10_000) / 100
    vb = (np.arange(1, n, 2, dtype=np.uint64) * 2654435761 % 10_000) / 100 + 40.0
    allv = np.concatenate([va, vb])
    edges = np.quantile(allv, np.arange(1, 10) / 10)
    eps = 1e-4
    pa = np.maximum(np.histogram(va, bins=[-np.inf, *edges, np.inf])[0] / len(va), eps)
    pb = np.maximum(np.histogram(vb, bins=[-np.inf, *edges, np.inf])[0] / len(vb), eps)
    exact = float(np.sum((pa - pb) * np.log(pa / pb)))
    # KLL compaction is randomized, so the decile edges (and with them
    # the estimated PSI) wobble with partition/merge order — 0.25 rel
    # tolerance flaked once in a fully-loaded suite run while passing in
    # isolation. The semantic pins are the band assertions above; this
    # sanity check just ties the estimate to the exact binned PSI's
    # order of magnitude.
    assert abs(got["drifted"] - exact) / exact < 0.5, (got["drifted"], exact)


def test_kll_drift_and_psi_skip_one_sided_types(spark):
    """A type with data on only ONE side of the split (the typical
    'new event type introduced after the split' monitoring case) must
    be silently excluded, not crash: under Spark 4 ANSI mode an
    element_at(empty_array, 1) fold seed raised
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT before try_element_at (ADVICE r4
    high)."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        build_value_kll_sketches,
        kll_drift_by_type,
        kll_psi_by_type,
    )

    def stream(name, day):
        return spark.range(2_000).select(
            F.lit(day).cast("timestamp").alias("ts"),
            F.lit(name).alias("event_type"),
            (F.col("id") % 100).cast("double").alias("value"),
        )

    events = (
        stream("both", "2024-05-01")
        .unionByName(stream("both", "2024-05-20"))
        .unionByName(stream("new_after", "2024-05-20"))   # after only
        .unionByName(stream("gone_before", "2024-05-01"))  # before only
    )
    sketches = build_value_kll_sketches(events)

    ks = {r.event_type: r.ks_distance
          for r in kll_drift_by_type(sketches, "2024-05-10").collect()}
    assert set(ks) == {"both"}, ks
    assert ks["both"] <= 0.05

    psi = {r.event_type: r.psi
           for r in kll_psi_by_type(sketches, "2024-05-10").collect()}
    assert set(psi) == {"both"}, psi
    assert psi["both"] <= 0.05


def test_cms_long_estimates_null_probe_keys_are_zero(spark):
    """NULL probe keys estimate to 0 in the LONG-key path, matching the
    string-key variant (ADVICE r4 low): pre-fix, to_numpy(dtype=int64)
    raised inside the pandas UDF."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        build_user_cms,
        with_frequency_estimates,
    )

    events = spark.range(1_000).select(
        F.lit("2024-05-01").cast("timestamp").alias("ts"),
        F.lit("click").alias("event_type"),
        (F.col("id") % 10).alias("user_id"),
    )
    sketches = build_user_cms(events)
    probes = spark.createDataFrame(
        [(7,), (None,), (3,), (None,)], "user_id long"
    )
    got = with_frequency_estimates(
        spark, sketches, probes, "user_id"
    ).collect()
    by_key = {r.user_id: r.est_count for r in got}
    assert by_key[None] == 0
    assert by_key[7] >= 100  # CMS one-sided guarantee: est >= true
    assert by_key[3] >= 100


def test_cms_long_estimates_keep_precision_beyond_2_53(spark):
    """A NULL-bearing probe batch must NOT degrade |key| > 2^53 keys
    (ADVICE r5 low): pre-fix, Arrow handed the batch to pandas as
    float64, so such keys hashed to the wrong bucket and the one-sided
    est >= true guarantee silently broke. Keys now travel coalesced as
    exact int64 with a separate is-null flag."""
    import pyspark.sql.functions as F

    from hadoop_stuff_spark.operators.sketches import (
        build_user_cms,
        with_frequency_estimates,
    )

    big = (1 << 60) + 1  # not representable in float64 (rounds to 2^60)
    events = spark.range(500).select(
        F.lit("2024-05-01").cast("timestamp").alias("ts"),
        F.lit("click").alias("event_type"),
        F.lit(big).alias("user_id"),
    )
    sketches = build_user_cms(events)
    probes = spark.createDataFrame(
        [(big,), (None,), (big + 1,)], "user_id long"
    )
    by_key = {
        r.user_id: r.est_count
        for r in with_frequency_estimates(spark, sketches, probes, "user_id").collect()
    }
    assert by_key[None] == 0
    # exact key must satisfy est >= true; the float64-rounded neighbor
    # (big+1 == big after float64 rounding) must NOT inherit the count
    assert by_key[big] >= 500
    assert by_key[big + 1] < 500
