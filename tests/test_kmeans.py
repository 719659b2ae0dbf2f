"""K-means (fixed-iteration Lloyd's) and SemDeDup property tests.

Oracle parity for both registry entries is covered by
tests/test_oracle_parity.py; these tests pin the algorithmic properties a
value-hash cannot see: partition-of-the-corpus, Lloyd monotonicity, the
subset guarantee vs the exact all-pairs baseline, and the soft-assignment
recall improvement."""

from pyspark.sql import functions as F

from hadoop_stuff_spark.catalog import load_table
from hadoop_stuff_spark.operators import dedup
from hadoop_stuff_spark.operators.kmeans import (
    n1_semantic_dedup_pairs,
    n2_kmeans_lloyd,
)


def test_kmeans_assignment_partitions_corpus(spark, sf_dir):
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    prof = n2_kmeans_lloyd(spark, sf_dir).collect()
    assert sum(r.n_vectors for r in prof) == n_vecs
    assert len(prof) <= 8
    # a single-member cell legitimately has inertia exactly 0.0 (its
    # centroid IS the member), so pin non-negativity per cell and a
    # positive total only.
    assert all(r.inertia >= 0 for r in prof)
    assert sum(r.inertia for r in prof) > 0


def test_kmeans_inertia_monotone_in_iterations(spark, sf_dir):
    # Lloyd's iteration never increases total inertia; the fixed-point
    # rounding (1e-6 per term) cannot mask the macroscopic drops on this
    # corpus.
    def total(n_iter):
        rows = n2_kmeans_lloyd(spark, sf_dir, n_iter=n_iter).collect()
        return sum(r.inertia for r in rows)

    i0, i1, i2 = total(0), total(1), total(2)
    assert i1 <= i0
    assert i2 <= i1
    assert i2 < i0  # and it genuinely moved


def test_semantic_dedup_subset_and_recall(spark, sf_dir):
    exact = {
        (r.vec_a, r.vec_b)
        for r in dedup.embedding_cosine_dups(spark, sf_dir).collect()
    }
    sem = {
        (r.vec_a, r.vec_b)
        for r in n1_semantic_dedup_pairs(spark, sf_dir).collect()
    }
    # cell-join only prunes candidates; the cosine predicate is identical
    assert sem <= exact
    # measured 0.77 at sf0.001 with n_assign=2 on unclustered noise
    assert len(sem & exact) / len(exact) >= 0.6


def test_semantic_dedup_soft_assignment_widens_recall(spark, sf_dir):
    hard = n1_semantic_dedup_pairs(spark, sf_dir, n_assign=1)
    soft = n1_semantic_dedup_pairs(spark, sf_dir, n_assign=2)
    hard_pairs = {(r.vec_a, r.vec_b) for r in hard.collect()}
    soft_pairs = {(r.vec_a, r.vec_b) for r in soft.collect()}
    assert hard_pairs <= soft_pairs
    assert len(soft_pairs) > len(hard_pairs)


def test_semantic_dedup_pairs_are_sim_sorted_and_thresholded(spark, sf_dir):
    rows = n1_semantic_dedup_pairs(spark, sf_dir).collect()
    assert rows, "planted near-dups must surface"
    assert all(r.sim >= 0.4 for r in rows)
    assert all(r.vec_a < r.vec_b for r in rows)
    # distinct pairs even though soft assignment can match a pair twice
    assert len({(r.vec_a, r.vec_b) for r in rows}) == len(rows)


def test_semdedup_auto_k_scales_with_corpus():
    """VERDICT r6 #3: the k ∝ N / target_cell_size rule is executable —
    k grows linearly with the corpus at fixed target cell size, never
    shrinks an explicit larger k, and is clamped to N (first-k init)."""
    from hadoop_stuff_spark.operators.kmeans import semdedup_auto_k

    assert semdedup_auto_k(2_000, 8, 250) == 8  # ceil(2000/250)=8 == k
    assert semdedup_auto_k(20_000, 8, 250) == 80  # 10x corpus -> 10x k
    assert semdedup_auto_k(200_000, 8, 250) == 800
    assert semdedup_auto_k(1_000, 64, 250) == 64  # explicit k never shrunk
    assert semdedup_auto_k(10, 8, 2) == 8
    assert semdedup_auto_k(5, 8, 2) == 5  # clamped to N
    import pytest

    with pytest.raises(ValueError, match="target_cell_size"):
        semdedup_auto_k(1_000, 8, 0)


def test_semantic_dedup_target_cell_size_end_to_end(spark, sf_dir):
    """With target_cell_size forcing a larger k, the subset guarantee
    still holds (the cell join only prunes candidates)."""
    exact = {
        (r.vec_a, r.vec_b)
        for r in dedup.embedding_cosine_dups(spark, sf_dir).collect()
    }
    sem = {
        (r.vec_a, r.vec_b)
        for r in n1_semantic_dedup_pairs(
            spark, sf_dir, target_cell_size=50
        ).collect()
    }
    assert sem <= exact
    assert sem  # a finer clustering still finds real near-dups


def test_semantic_dedup_oversized_cell_fails_loudly(spark, sf_dir):
    """A deliberately-tiny max_cell_rows must raise the named guard, not
    an opaque executor error: with k=1 every vector lands in one cell."""
    import pytest

    with pytest.raises(Exception, match="max_cell_rows"):
        n1_semantic_dedup_pairs(
            spark, sf_dir, k=1, n_assign=1, max_cell_rows=10
        ).collect()


def test_fp_round_half_up_matches_spark_round(spark):
    """r12: the fused Lloyd round computes fixed points in numpy via
    _fp_round_half_up, which must reproduce Spark's F.round(x, 0) —
    ROUND_HALF_UP, half away from zero for BOTH signs (numpy's default
    np.round is banker's and would disagree at every exact .5)."""
    import numpy as np
    from pyspark.sql import functions as F

    from hadoop_stuff_spark.operators.kmeans import _fp_round_half_up

    vals = [
        0.5, 1.5, 2.5, -0.5, -1.5, -2.5,          # exact halves, both signs
        0.49999999999999994, -0.49999999999999994,  # just under a half
        1234567.4999999999, -1234567.4999999999,
        3.0000000000000004, -7.999999999999999,
        0.0, -0.0, 12345678.5, -12345678.5,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x: double")
    jvm = [
        r[0]
        for r in df.select(
            F.round(F.col("x"), 0).cast("long").alias("r")
        ).collect()
    ]
    ours = _fp_round_half_up(np.array(vals, dtype=np.float64)).tolist()
    assert ours == jvm, list(zip(vals, ours, jvm))
