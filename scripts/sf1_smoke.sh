#!/bin/sh
# Recurring sf1 smoke set (VERDICT r4 next #3): the heavy queries most
# likely to regress at scale, runnable in ~2-3 min instead of the
# 50-minute full sf1 oracle sweep.  Emits one bench JSON line.
cd "$(dirname "$0")/.." || exit 1
SPARK_GRAFT_SF_DIR=scratch/sf1 \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_QUERIES=training_corpus_pipeline,ancestor_chain_walk,dedup_minhash_lsh,ann_ivfpq_materialized_topk,decontaminate_eval_overlap,dedup_connected_components,q1_pricing_summary,nested_ht_per_event,hybrid_search_rrf,hybrid_search_rrf_indexed,colbert_maxsim_routed_topk,semdedup_incremental_store,graph_label_propagation,scd2_customer_history \
exec python bench.py
