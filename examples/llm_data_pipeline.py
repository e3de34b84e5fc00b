"""End-to-end LLM training-data pipeline over the documents corpus —
every pass is the registry operator the driver verifies, run here as one
narrative: quality filter -> PII scrub -> boilerplate strip -> near-dup
clustering -> keep-longest retention -> benchmark decontamination ->
source triage -> split assignment -> token + packing economics.

Each stage is an independent Catalyst plan (the registry contract), but
the same expressions compose into ONE plan when chained — see
operators/text.py training_data_pipeline for the fused
filter->dedup->sample proof.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from my_polars_ai_spark import get_spark
from my_polars_ai_spark.operators import all_ops

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark("example_llm_pipeline")
ops = all_ops()

n_docs = ops["quality_score"].fn(spark, sf_dir).count()

# 1. Quality gate: drop the bottom of the quality distribution.
quality = ops["quality_score"].fn(spark, sf_dir).filter(F.col("quality") >= 0.5)
n_quality = quality.count()

# 2. Privacy: redact emails/phones (synthetic payload, real regexes).
redacted = ops["pii_redact"].fn(spark, sf_dir)
n_emails = redacted.agg(F.sum("n_emails")).collect()[0][0]

# 3. Boilerplate: strip >50%-document-frequency tokens.
boiler = ops["remove_boilerplate_tokens"].fn(spark, sf_dir)
n_removed = boiler.agg(F.sum("n_removed")).collect()[0][0]

# 4. Near-dup clustering: MinHash+LSH pairs -> connected components.
clusters = ops["dedup_cluster_canonical"].fn(spark, sf_dir)
n_canonical = clusters.select("cluster_id").distinct().count()

# 5. Decontamination: training docs sharing 3-grams with the benchmark.
contaminated = ops["benchmark_contamination"].fn(spark, sf_dir)
n_contaminated = contaminated.count()

# 6. Retention policy: keep the most complete version per near-dup block.
kept = ops["dedup_keep_longest"].fn(spark, sf_dir)
n_kept = kept.count()

# 7. Source triage: which sources are diverse enough to keep.
triage = ops["source_quality_report"].fn(spark, sf_dir)
n_sources = triage.count()

# 8. Reproducible 80/10/10 split by content hash.
split = ops["train_val_test_split"].fn(spark, sf_dir)
n_train = split.filter(F.col("split") == "train").agg(F.sum("n_docs")).collect()[0][0]

# 9. Token accounting + packing economics for the surviving set.
tokens = ops["token_counts"].fn(spark, sf_dir).agg(F.sum("n_ws_tokens")).collect()[0][0]
waste = ops["padding_waste_stats"].fn(spark, sf_dir).agg(F.sum("padded_tokens")).collect()[0][0]

# 10. Survivor policy upgrade: per-CLUSTER keep-best (longest member of
# each connected component, not just per prefix-block).
best = ops["dedup_cluster_best_quality"].fn(spark, sf_dir)
n_best = best.count()

# 11. Transitive contamination: everything within 3 near-dup hops of
# the flagged seed set is suspect too.
blast = ops["neardup_blast_radius"].fn(spark, sf_dir)
n_blast = blast.count()

# 12. Monitoring: per-source drift (PSI) + lexical diversity + sliding
# chunks for the retrieval index.
psi_hot = (
    ops["psi_source_drift"].fn(spark, sf_dir).filter(F.col("psi") > 0.25).count()
)
entropy_low = (
    ops["token_entropy_per_doc"].fn(spark, sf_dir).filter(F.col("entropy") < 1.0).count()
)
n_chunks = ops["chunk_sliding_windows"].fn(spark, sf_dir).count()

# 13. Reproducible training order: seeded global shuffle positions.
order = ops["global_shuffle_row_number"].fn(spark, sf_dir)
n_pos = order.select("global_pos").distinct().count()

print(f"corpus docs:            {n_docs}")
print(f"pass quality >= 0.5:    {n_quality}")
print(f"emails redacted:        {n_emails}")
print(f"boilerplate tokens cut: {n_removed}")
print(f"canonical clusters:     {n_canonical}")
print(f"contaminated docs:      {n_contaminated}")
print(f"kept (longest version): {n_kept}")
print(f"sources triaged:        {n_sources}")
print(f"train docs (of 80%):    {n_train}")
print(f"whitespace tokens:      {tokens}")
print(f"padded tokens @512:     {waste}")
print(f"cluster-best survivors: {n_best}")
print(f"3-hop blast radius:     {n_blast}")
print(f"drifted sources (PSI):  {psi_hot}")
print(f"low-entropy docs:       {entropy_low}")
print(f"sliding chunks:         {n_chunks}")
print(f"shuffled positions:     {n_pos}")

assert 0 < n_quality <= n_docs
assert n_emails == n_docs  # the synthetic payload plants exactly one each
assert 0 < n_canonical <= n_docs
assert 0 < n_kept <= n_docs
assert n_sources > 0 and 0 < n_train <= n_docs
assert n_contaminated >= 0 and tokens > 0 and waste >= 0
assert n_best == n_canonical  # exactly one survivor per cluster
assert n_blast >= 10  # the seed set itself is always reached
assert n_chunks > 0 and psi_hot >= 0 and entropy_low >= 0
assert n_pos == n_docs  # the shuffle is a total order: one position per doc

# 14. Round-6 curation wave: snapshot-incremental dedup (new batch vs
# existing corpus only), selection under a token budget, DSIR
# importance weights toward the target slice, and the per-filter
# attrition funnel.
incr = ops["dedup_incremental_minhash"].fn(spark, sf_dir)
n_incr_dropped = incr.count()
budget = ops["token_budget_selection"].fn(spark, sf_dir)
n_budget = budget.count()
budget_tokens = budget.agg(F.sum("n_tokens")).collect()[0][0]
dsir = ops["dsir_importance_weights"].fn(spark, sf_dir)
n_dsir = dsir.count()
cascade = ops["filter_cascade_report"].fn(spark, sf_dir)
cascade_rows = {r.filter_name: r for r in cascade.collect()}

print(f"incremental dup drops:  {n_incr_dropped}")
print(f"budget-selected docs:   {n_budget} ({budget_tokens} tokens)")
print(f"DSIR-scored docs:       {n_dsir}")
print(f"cascade stages:         {len(cascade_rows)}")

assert n_incr_dropped >= 0
assert 0 < n_budget < n_docs          # a real budget keeps a strict subset
assert n_dsir == n_docs               # every non-empty doc gets a weight
assert len(cascade_rows) == 4
# funnel identities: evaluated = killed + survived at every stage, and
# each stage's survivors are the next stage's evaluated set
assert all(
    r.n_evaluated == r.n_killed + r.n_survived for r in cascade_rows.values()
)
stages = sorted(cascade_rows.values(), key=lambda r: r.stage)
assert all(
    stages[i].n_survived == stages[i + 1].n_evaluated
    for i in range(len(stages) - 1)
)

# 15. Round-7 curation wave: exact-substring EXCISION (the Lee-et-al.
# output corpus, not just the span report), SemDeDup semantic
# keep-list over embeddings, CCNet head/middle/tail perplexity split,
# and the hashed linear quality classifier.
excised = ops["repeated_span_excision"].fn(spark, sf_dir)
cut_tokens = excised.agg(F.sum(F.col("n_tokens") - F.col("kept_tokens"))).collect()[0][0]
sem = ops["semdedup_keep_list"].fn(spark, sf_dir)
n_sem_dropped = sem.filter(F.col("kept") == 0).count()
ccnet = ops["ccnet_perplexity_split"].fn(spark, sf_dir)
tail_docs = ccnet.filter(F.col("bucket") == 3).count()
clf = ops["hashed_linear_quality_score"].fn(spark, sf_dir)
n_clf_keep = clf.filter(F.col("quality_label") == 1).count()

print(f"excised dup tokens:     {cut_tokens}")
print(f"SemDeDup drops:         {n_sem_dropped}")
print(f"perplexity-tail docs:   {tail_docs}")
print(f"classifier keeps:       {n_clf_keep}")

assert excised.count() == n_docs      # every doc survives with text
assert cut_tokens > 0                 # this corpus has repeated spans
assert n_sem_dropped >= 0
# terciles partition each language: tail is roughly a third
assert 0 < tail_docs < n_docs
assert 0 < n_clf_keep <= n_docs

# 16. Round-8 curation wave: the Gopher rule decision table, the
# corpus-card funnel that composes every gate, the data-constrained
# epoch planner, per-doc n-gram novelty, one GD step of the trainable
# quality classifier, and the MinHash estimator calibration audit.
gates = ops["gopher_quality_flags"].fn(spark, sf_dir)
n_rule_keep = gates.filter(F.col("keep") == 1).count()
funnel = {r.stage: r for r in ops["curation_funnel_report"].fn(spark, sf_dir).collect()}
plan = ops["epoch_allocation_plan"].fn(spark, sf_dir)
n_capped_sources = plan.filter(F.col("capped") == 1).count()
novelty = ops["ngram_novelty_score"].fn(spark, sf_dir)
low_novelty = novelty.filter(F.col("novelty_frac") < 0.5).count()
step = {r.bucket: r for r in ops["quality_classifier_gd_step"].fn(spark, sf_dir).collect()}
calib = ops["minhash_jaccard_calibration"].fn(spark, sf_dir)

print(f"rule-gate keeps:        {n_rule_keep}")
print(f"funnel final docs:      {funnel['decontaminated'].n_docs}"
      f" ({funnel['decontaminated'].pct_docs:.1%} of raw)")
print(f"epoch-capped sources:   {n_capped_sources}")
print(f"low-novelty docs:       {low_novelty}")

assert 0 < n_rule_keep < n_docs                       # the gate discriminates
assert funnel["raw"].n_docs == n_docs
assert funnel["quality_rules"].n_docs == n_rule_keep  # funnel == gate, stage 1
# monotone funnel, and decontamination drops at least the src0 slice
assert funnel["decontaminated"].n_docs < funnel["repetition"].n_docs
assert all(r.w1_micro == r.w0_micro - r.delta_micro for r in step.values())
assert len(step) == 32                                # full weight vector ships
assert calib.count() > 0                              # audit sample is non-empty

# 17. Round-10 curation wave: the TRAINED classifier as a corpus
# filter and its streaming deployment, DoReMi-shape domain
# reweighting, the vocabulary-concentration health scalar, the
# source-level mirror matrix, and contrastive triplets mined from the
# dedup candidates themselves.
trained = ops["quality_classifier_trained_scores"].fn(spark, sf_dir)
n_trained_keep = trained.filter(F.col("keep") == 1).count()
weights = {r.source: r for r in
           ops["domain_excess_loss_weights"].fn(spark, sf_dir).collect()}
gini = ops["token_gini_concentration"].fn(spark, sf_dir).collect()[0]
mirrors = ops["source_gram_jaccard_matrix"].fn(spark, sf_dir)
triplets = ops["contrastive_triplet_mining"].fn(spark, sf_dir)

print(f"trained-filter keeps:   {n_trained_keep}")
print(f"domain weights:         "
      f"{ {s: r.weight for s, r in sorted(weights.items())} }")
print(f"token gini:             {gini.gini} over {gini.n_vocab} vocab")
print(f"source mirror pairs:    {mirrors.count()}")
print(f"contrastive triplets:   {triplets.count()}")

assert 0 < n_trained_keep <= n_docs
# excess-loss weights: the best domain gets 0; weights sum to ~1 when
# any signal exists (half-up rounding per source)
if len(weights) > 1 and any(r.excess_micro > 0 for r in weights.values()):
    assert min(r.excess_micro for r in weights.values()) == 0
    assert abs(sum(r.weight for r in weights.values()) - 1.0) < 1e-4
assert 0.0 <= gini.gini <= 1.0
# every triplet's positive is a verified dup, its negative is not
assert triplets.filter(F.col("neg_jaccard") >= 0.95).count() == 0
