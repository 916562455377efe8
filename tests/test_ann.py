"""ANN quality: the IVF-bucketed scale path (q35) must actually find
the neighbors the brute-force baseline (q34) finds (VERDICT.md
next-round #9 — "rows-only" only proves it runs)."""

import os

from torscrapper_spark.queries import registry

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def test_ivf_recall_vs_bruteforce(spark):
    reg = registry()
    bf = reg["q34_ann_cosine_topk"][0](spark, SF_DIR).toPandas()
    ivf = reg["q35_ann_ivf_bucketed"][0](spark, SF_DIR).toPandas()
    bf_sets = bf.groupby("q_id")["neighbor"].apply(set)
    ivf_sets = ivf.groupby("q_id")["neighbor"].apply(set)
    assert len(bf_sets) == len(ivf_sets)
    recalls = [
        len(bf_sets[q] & ivf_sets.get(q, set())) / len(bf_sets[q])
        for q in bf_sets.index
    ]
    macro_recall = sum(recalls) / len(recalls)
    # probing IVF_NPROBE=6 of the IVF_K=16 k-means centroid lists
    # (queries.py q35) must recover ≥90% of the true top-3
    assert macro_recall >= 0.9, f"recall@3 = {macro_recall:.3f} ({recalls})"
