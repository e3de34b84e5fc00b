"""Run a few operators from the registry directly over the TPC-H-ish
testdata — the deterministic, LLM-free entry point (the same callables
the driver's correctness harness runs).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from my_polars_ai_spark import get_spark
from my_polars_ai_spark.operators import all_ops

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark("example_operators")
ops = all_ops()

for name in (
    "flagship_revenue_by_nation",
    "tpch_q1_pricing_summary",
    "cosine_topk_brute",
    "dedup_minhash_lsh",
    "dedup_cluster_canonical",
    "training_data_pipeline",
    "asof_join_nearest",
    "profile_columns",
    "bm25_scores",
    "funnel_conversion",
    "retention_cohorts",
    "key_skew_profile",
    # round-5 session-2: classic ML / retrieval / multimodal dedup
    "naive_bayes_langid",
    "item_item_cf_topk",
    "mmr_diversified_topk",
    "ts_decompose_daily",
    "image_ahash_pairs",
):
    print(f"\n=== {name} ===")
    ops[name].fn(spark, sf_dir).show(5, truncate=False)
