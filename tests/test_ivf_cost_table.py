"""IVF build-vs-probe cost table (VERDICT r11 #5): per quantizer size,
recall@k must be non-decreasing in probe width with an exact 1.0 anchor
at full probe, probe_fraction must be non-decreasing with the (N-1)/N
anchor, and the n_cells=16 column must agree exactly with the separately
constructed n2_ivf_recall_curve (same quantizer, same truth rules)."""

from collections import defaultdict

from hadoop_stuff_spark.catalog import load_table
from hadoop_stuff_spark.operators.similarity import (
    n2_ivf_cost_table,
    n2_ivf_recall_curve,
)

_NLISTS = (8, 16, 32)
_WIDTHS = (1, 2, 4, 8)


def _expected_configs():
    return sorted(
        (nl, p)
        for nl in _NLISTS
        for p in sorted(set(w for w in _WIDTHS if w < nl) | {nl})
    )


def test_cost_table_monotone_with_exact_anchors(spark, sf_dir):
    rows = n2_ivf_cost_table(
        spark, sf_dir, nlist_values=_NLISTS, probe_widths=_WIDTHS
    ).collect()
    assert sorted((r["n_cells"], r["n_probe"]) for r in rows) == (
        _expected_configs()
    )
    n_corpus = load_table(spark, sf_dir, "embeddings").count()
    by_nl = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["n_cells"], r["n_probe"])):
        by_nl[r["n_cells"]].append(r)
    for nl, grp in by_nl.items():
        recalls = [r["recall_at_k"] for r in grp]
        fracs = [r["probe_fraction"] for r in grp]
        assert all(b >= a for a, b in zip(recalls, recalls[1:])), nl
        assert all(b >= a for a, b in zip(fracs, fracs[1:])), nl
        # full-probe anchor: every cell probed = brute force (the
        # non-self-referential half of this claim is pinned by
        # test_ivf_full_probe_equals_bruteforce)
        assert grp[-1]["n_probe"] == nl
        assert grp[-1]["recall_at_k"] == 1.0
        # self-filter excludes the query's own row from the scan
        assert grp[-1]["probe_fraction"] == round(
            (n_corpus - 1) / n_corpus, 6
        )
        # probing fewer cells scans strictly less than everything
        assert fracs[0] < fracs[-1]


def test_cost_table_16_column_matches_recall_curve(spark, sf_dir):
    """The table's n_cells=16 slice and the standalone recall curve are
    two plans over the same quantizer and truth convention — their
    recall values must agree EXACTLY (deterministic centroids, 6 dp
    rounds, (sim desc, vec_id) tie order)."""
    table = {
        r["n_probe"]: r["recall_at_k"]
        for r in n2_ivf_cost_table(
            spark, sf_dir, nlist_values=(16,), probe_widths=(1, 2, 4, 8)
        ).collect()
    }
    curve = {
        r["n_probe"]: r["recall_at_k"]
        for r in n2_ivf_recall_curve(
            spark, sf_dir, n_cells=16, probe_widths=(1, 2, 4, 8, 16)
        ).collect()
    }
    assert table == curve
