"""Dump .explain('formatted') for round-16 touched queries into
plans/r16/<query>_{before,after}.txt. 'before' recreates the prior
shape (e.g. distributed CC forced); 'after' is the current default.
For multi-job operators (CC/pagerank: eager materialization inside)
the file also records the JOB COUNT observed while evaluating the
query — the metric the optimization moves — since explain() of the
returned frame only shows the final composition over checkpoint scans.

Usage: python tools/dump_plans_r16.py <query> [<query> ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finlogic_spark import driver_queries as dq
from finlogic_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")

CC_QUERIES = {
    "doc_dedup_clusters",
    "doc_cluster_split",
    "doc_canonical_select",
    "doc_training_export",
    "doc_split_drift",
    "doc_split_assign_sticky",
}


def _capture(spark, name: str, label: str) -> str:
    sc = spark.sparkContext
    group = f"plan-{name}-{label}"
    sc.setJobGroup(group, group)
    try:
        df = dq.QUERIES[name](spark, SF_DIR)
        jobs_build = len(sc.statusTracker().getJobIdsForGroup(group))
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        df.write.format("noop").mode("overwrite").save()
        jobs_total = len(sc.statusTracker().getJobIdsForGroup(group))
    finally:
        sc.setJobGroup(None, None)
    return (
        f"-- {name} [{label}] jobs_during_build={jobs_build} "
        f"jobs_total_incl_noop={jobs_total}\n" + buf.getvalue()
    )


def _patch_union_lsh_index():
    """r15 lsh_index_multi: L-branch union (re-evaluates the corpus per
    table, multiplies partitions by L)."""
    from contextlib import contextmanager

    from pyspark.sql import functions as F

    from finlogic_spark.operators import similarity as sim

    def union_form(corpus, vec_col, dim, num_planes, num_tables,
                   id_col="vec_id"):
        parts = [
            sim.lsh_assign_buckets(
                corpus.select(id_col, vec_col),
                vec_col, dim, num_planes, table=t,
            ).withColumn("__tbl", F.lit(t))
            for t in range(num_tables)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    @contextmanager
    def cm():
        orig = sim.lsh_index_multi
        sim.lsh_index_multi = union_form
        # evict the cached index so the before-build actually runs
        dq._ANN_INDEX.pop(("lsh", SF_DIR), None)
        try:
            yield
        finally:
            sim.lsh_index_multi = orig
            dq._ANN_INDEX.pop(("lsh", SF_DIR), None)

    return cm()


def _patch_sums32_simhash():
    """r15 doc_simhash: 32 one-bit conditional sums instead of the
    packed two-lane accumulators."""
    from contextlib import contextmanager

    from pyspark.sql import functions as F

    from finlogic_spark.operators.text_dedup import SIMHASH_BITS, tokens

    def old_form(df, text_col, id_col):
        tok = df.select(
            F.col(id_col), F.explode(tokens(text_col)).alias("__tok")
        ).withColumn("__hx", F.md5(F.col("__tok")))
        for c in range(SIMHASH_BITS // 8):
            tok = tok.withColumn(
                f"__v{c}",
                F.conv(F.substring("__hx", 8 * c + 1, 8), 16, 10).cast("long"),
            )

        def high_bit(j):
            c, dd = (j - 1) // 8, (j - 1) % 8
            return F.shiftright(
                F.col(f"__v{c}"), 4 * (7 - dd) + 3
            ).bitwiseAND(F.lit(1))

        sums = tok.groupBy(id_col).agg(
            F.count("*").alias("__n"),
            *[
                F.sum(high_bit(j)).alias(f"__b{j}")
                for j in range(1, SIMHASH_BITS + 1)
            ],
        )
        fp = None
        for j in range(1, SIMHASH_BITS + 1):
            bit = F.when(
                F.col(f"__b{j}") * 2 >= F.col("__n"),
                F.lit(2 ** (j - 1)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            fp = bit if fp is None else fp + bit
        return sums.select(F.col(id_col), fp.alias("simhash_fp"))

    @contextmanager
    def cm():
        orig = dq.simhash_agg
        dq.simhash_agg = old_form
        try:
            yield
        finally:
            dq.simhash_agg = orig

    return cm()


def _patch_expr_covariance():
    """r15 _cov_joined: explode-d²-structs expression form, two source
    scans (products + means)."""
    from contextlib import contextmanager

    from pyspark.sql import functions as F

    from finlogic_spark.operators import linalg

    def expr_form(df, vec_col, dim):
        df = df.filter(F.size(F.col(vec_col)) == dim)
        v = F.col(vec_col)
        cells = F.explode(
            F.flatten(
                F.transform(
                    v,
                    lambda x, i: F.transform(
                        v,
                        lambda y, j: F.struct(
                            i.alias("i"), j.alias("j"),
                            F.floor(
                                x.cast("double") * y.cast("double")
                                * F.lit(1e6) + F.lit(0.5)
                            ).cast("long").alias("p"),
                        ),
                    ),
                )
            )
        ).alias("c")
        sums = (
            df.select(cells).select("c.*").groupBy("i", "j")
            .agg(F.sum("p").alias("sp"), F.count(F.lit(1)).alias("n"))
        )
        means = (
            df.select(F.posexplode(v).alias("i", "x"))
            .groupBy("i")
            .agg(
                F.sum(
                    F.floor(
                        F.col("x").cast("double") * F.lit(1e6) + F.lit(0.5)
                    ).cast("long")
                ).alias("sx")
            )
        )
        mi = means.select(F.col("i").alias("i"), F.col("sx").alias("sx_i"))
        mj = means.select(F.col("i").alias("j"), F.col("sx").alias("sx_j"))
        exy = F.col("sp").cast("double") / F.lit(1e6) / F.col("n")
        m_i = F.col("sx_i").cast("double") / F.lit(1e6) / F.col("n")
        m_j = F.col("sx_j").cast("double") / F.lit(1e6) / F.col("n")
        return (
            sums.join(F.broadcast(mi), "i").join(F.broadcast(mj), "j")
            .select(
                "i", "j", (exy - m_i * m_j).alias("cov"),
                m_i.alias("m_i"), m_j.alias("m_j"),
            )
        )

    @contextmanager
    def cm():
        orig = linalg._cov_joined
        linalg._cov_joined = expr_form
        try:
            yield
        finally:
            linalg._cov_joined = orig

    return cm()


def _patch_no_barrier():
    """doc_curation_learned without the r16 lazy localCheckpoint (the
    tokenize+logit subtree evaluated 3x)."""
    from contextlib import contextmanager

    from pyspark.sql import DataFrame

    @contextmanager
    def cm():
        orig = DataFrame.localCheckpoint
        DataFrame.localCheckpoint = lambda self, *a, **k: self
        try:
            yield
        finally:
            DataFrame.localCheckpoint = orig

    return cm()


BEFORE_PATCHES = {
    "emb_lsh_topk": (_patch_union_lsh_index, "before: L-branch union index"),
    "emb_lsh_recall": (_patch_union_lsh_index, "before: L-branch union index"),
    "doc_simhash": (_patch_sums32_simhash, "before: 32 one-bit sums"),
    "emb_covariance": (_patch_expr_covariance, "before: explode-d2 expression"),
    "emb_pca_project": (_patch_expr_covariance, "before: explode-d2 expression"),
    "doc_curation_learned": (_patch_no_barrier, "before: no barrier (3x subtree)"),
}

AFTER_LABELS = {
    "emb_lsh_topk": "after: one-pass explode index",
    "emb_lsh_recall": "after: one-pass explode index",
    "doc_simhash": "after: packed two-lane accumulators",
    "emb_covariance": "after: Arrow outer-product partials",
    "emb_pca_project": "after: Arrow outer-product partials",
    "doc_curation_learned": "after: lazy checkpoint barrier",
}


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plans-r16")
    from finlogic_spark.operators import graph

    orig = graph.connected_components
    for name in sys.argv[1:]:
        if name in CC_QUERIES:
            def forced(*a, **k):
                k["small_graph_max_bytes"] = 0
                return orig(*a, **k)

            graph.connected_components = forced
            try:
                before = _capture(spark, name, "before: distributed cc")
            finally:
                graph.connected_components = orig
            after = _capture(spark, name, "after: single-job cc gate")
        elif name in BEFORE_PATCHES:
            mk, blabel = BEFORE_PATCHES[name]
            with mk():
                before = _capture(spark, name, blabel)
            after = _capture(spark, name, AFTER_LABELS[name])
        else:
            before = None
            after = _capture(spark, name, "current")
        if before is not None:
            with open(os.path.join(OUT_DIR, f"{name}_before.txt"), "w") as fh:
                fh.write(before)
        with open(os.path.join(OUT_DIR, f"{name}_after.txt"), "w") as fh:
            fh.write(after)
        print(f"wrote {name}", flush=True)


if __name__ == "__main__":
    main()
