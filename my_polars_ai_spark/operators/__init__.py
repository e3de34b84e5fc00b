"""Operator registry: one named, oracle-checked query per SURVEY.md §2b row.

``all_ops()`` aggregates every module's OPS dict; ``__spark_entry__.py``
exposes them to the driver as ``queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

from my_polars_ai_spark.operators.base import Op

_MODULES = (
    "relational",
    "windows",
    "reshape",
    "scalar_funcs",
    "timeseries",
    "asof",
    "ml",
    "dedup",
    "similarity",
    "text",
    "multimodal",
    "udfs",
    "sql_api",
    "extras",
    "fuzzy",
)


# Registry ordering contract: the driver's CORRECTNESS gate verifies a
# prefix window of ``all_ops()`` insertion order (50 entries in round 1).
# _PRIORITY pins the window's composition so every north-star family
# (dedup / ANN / text / multimodal / UDF / as-of / time-series / fuzzy)
# has driver-side green rows, interleaved with the load-bearing
# relational/window ops.  Everything not listed follows in module order.
_PRIORITY = (
    # core relational + TPC-H shapes (scan/filter/agg/join/top-k)
    "flagship_revenue_by_nation",
    "conditional_case_when",
    "group_agg_multi",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "join_inner_broadcast",
    "join_semi",
    "join_theta_inequality",
    "interval_join_bucketed",
    "topk_orders",
    # windows / reshape
    "window_topk_per_group",
    "window_lag_lead",
    "rolling_mean_std",
    "sessionize_gap",
    "pivot_status_qty",
    "explode_tokens",
    # LLM-data-pipeline: dedup family
    "dedup_exact_text",
    "dedup_keyed_first",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cluster_canonical",
    "pagerank_near_dup",
    "simhash_signature",
    "simhash_near_dup",
    "dedup_embedding_cosine",
    # similarity / ANN
    "embedding_norms",
    "cosine_topk_brute",
    "ann_lsh_cosine",
    "ivf_cosine_topk",
    # text analysis
    "lang_id_heuristic",
    "quality_score",
    "token_counts",
    "tfidf_top_terms",
    "training_data_pipeline",
    # multimodal plumbing
    "multimodal_meta",
    "multimodal_decode_stub",
    # UDF surfaces
    "pandas_udf_sigmoid",
    "apply_in_pandas_zscore",
    "ema_per_user",
    "udtf_bigrams",
    # as-of + event-time windows
    "asof_join_backward",
    "tumbling_window_hourly",
    "session_window_10m",
    # fuzzy matching / sampling / SQL entry
    "fuzzy_levenshtein_pairs",
    "hash_sample",
    "stratified_sample",
    "sql_api_revenue",
    # scale-safe twins of the global-window ops (round 2)
    "percent_rank_approx",
    "roc_points_bucketed",
)


def all_ops() -> dict[str, Op]:
    import importlib

    merged: dict[str, Op] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(f"my_polars_ai_spark.operators.{mod_name}")
        except ModuleNotFoundError:
            continue  # module not written yet (incremental build)
        for name, op_ in mod.OPS.items():
            if name in merged:
                raise ValueError(f"duplicate op {name!r} from {mod_name}")
            merged[name] = op_
    if len(set(_PRIORITY)) != len(_PRIORITY):
        raise ValueError("duplicate name in _PRIORITY")
    ordered: dict[str, Op] = {n: merged[n] for n in _PRIORITY if n in merged}
    ordered.update((n, op_) for n, op_ in merged.items() if n not in ordered)
    return ordered
