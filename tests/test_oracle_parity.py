"""Run every registered query against its DuckDB oracle at sf0.01 —
the same scale and comparison the driver's correctness gate uses."""

from __future__ import annotations

import pytest

from dbitool_spark.plans import registry
from tests.conftest import SF_ORACLE
from tests.oracle import compare, duck_connection

# Queries whose semantics legitimately may produce an empty result.
# Everything else must return rows — an all-empty "pass" is vacuous
# (it proves the plan compiles, not that it is correct).
MAY_BE_EMPTY: set[str] = set()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


_CASES = [
    (name, fn, registry.oracle_sql().get(name))
    for name, fn in registry.queries().items()
]

# Entries retired from the registry by the r8 merge policy keep their
# oracle-parity coverage HERE (the policy's contract: only the
# registry row is reclaimed, never the correctness check). Their
# composites exercise the same codepaths in the driver window; this
# list pins the constituents' standalone semantics too.
from dbitool_spark.plans import events_ops as _ev
from dbitool_spark.plans import format_io as _fmt

_RETIRED_CASES = [
    ("retired_quarantine_corrupt_csv", _fmt.quarantine_corrupt_csv,
     _fmt.QUARANTINE_CORRUPT_CSV_SQL),
    ("retired_quarantine_corrupt_ndjson", _fmt.quarantine_corrupt_ndjson,
     _fmt.QUARANTINE_CORRUPT_NDJSON_SQL),
    ("retired_events_asof_latest_order", _ev.events_asof_latest_order,
     _ev.EVENTS_ASOF_SQL),
    ("retired_events_asof_recent_order", _ev.events_asof_recent_order,
     _ev.EVENTS_ASOF_TOLERANCE_SQL),
    ("retired_csv_roundtrip_customer", _fmt.csv_roundtrip_customer,
     _fmt.CSV_ROUNDTRIP_CUSTOMER_SQL),
    ("retired_csv_roundtrip_documents", _fmt.csv_roundtrip_documents,
     _fmt.CSV_ROUNDTRIP_DOCUMENTS_SQL),
    ("retired_ndjson_roundtrip_orders", _fmt.ndjson_roundtrip_orders,
     _fmt.NDJSON_ROUNDTRIP_ORDERS_SQL),
    ("retired_json_roundtrip_region", _fmt.json_roundtrip_region,
     _fmt.JSON_ROUNDTRIP_REGION_SQL),
    ("retired_fixedwidth_roundtrip_nation", _fmt.fixedwidth_roundtrip_nation,
     _fmt.FIXEDWIDTH_ROUNDTRIP_NATION_SQL),
    ("retired_xlsx_roundtrip_nation", _fmt.xlsx_roundtrip_nation,
     _fmt.XLSX_ROUNDTRIP_NATION_SQL),
    ("retired_sqlite_roundtrip_part", _fmt.sqlite_roundtrip_part,
     _fmt.SQLITE_ROUNDTRIP_PART_SQL),
    ("retired_xml_roundtrip_supplier", _fmt.xml_roundtrip_supplier,
     _fmt.XML_ROUNDTRIP_SUPPLIER_SQL),
    ("retired_bson_roundtrip_region", _fmt.bson_roundtrip_region,
     _fmt.BSON_ROUNDTRIP_REGION_SQL),
]

from dbitool_spark.plans import llm_ops as _llm
from dbitool_spark.plans import pipeline_ops as _pipe

_RETIRED_CASES += [
    ("retired_ann_lsh_recall", _llm.ann_lsh_recall, _llm.CONST_RECALL_SQL),
    ("retired_ann_ivf_recall", _llm.ann_ivf_recall, _llm.CONST_RECALL_SQL),
    ("retired_token_count_bpe_documents", _llm.token_count_bpe_documents,
     _llm.TOKEN_COUNT_BPE_SQL),
    ("retired_ngram_repetition_documents", _llm.ngram_repetition_documents,
     _llm.NGRAM_REPETITION_SQL),
]

from dbitool_spark.plans import scalar_ops as _scalar

_RETIRED_CASES += [
    ("retired_hll_accuracy_events", _scalar.hll_accuracy_events,
     _scalar.HLL_ACCURACY_SQL),
    ("retired_quantile_sketch_lineitem", _scalar.quantile_sketch_lineitem,
     _scalar.QUANTILE_SKETCH_SQL),
]

# r8 fifth wave
_RETIRED_CASES += [
    ("retired_ngram_jaccard_documents", _llm.ngram_jaccard_documents,
     _llm.NGRAM_JACCARD_SQL),
    ("retired_ngram_jaccard_skewguard_documents",
     _llm.ngram_jaccard_skewguard_documents,
     _llm.NGRAM_JACCARD_SKEWGUARD_SQL),
    ("retired_email_roundtrip_documents", _fmt.email_roundtrip_documents,
     _fmt.EMAIL_ROUNDTRIP_DOCUMENTS_SQL),
    ("retired_chart_roundtrip_events", _fmt.chart_roundtrip_events,
     _fmt.CHART_ROUNDTRIP_EVENTS_SQL),
]

# r10 rotation: the staged composite text_profile_documents is now
# REGISTERED (it runs above via registry.queries()); its three
# constituents retired from the registry but keep their standalone
# oracle-parity rows here per the retirement contract.
_RETIRED_CASES += [
    ("retired_text_stats_documents", _llm.text_stats_documents,
     _llm.TEXT_STATS_DOCUMENTS_SQL),
    ("retired_langid_documents", _llm.langid_documents,
     _llm.LANGID_DOCUMENTS_SQL),
    ("retired_quality_scores_documents", _llm.quality_scores_documents,
     _llm.QUALITY_SCORES_DOCUMENTS_SQL),
]

# r11 rotation: the staged composite format_chain_nation_xmlbson and
# the two staged net-new ops (source_overlap_matrix,
# quality_prune_documents) are now REGISTERED (they run above via
# registry.queries()); the composite's two constituents retired from
# the registry but keep their standalone oracle-parity rows here per
# the retirement contract.
_RETIRED_CASES += [
    ("retired_format_chain_nation", _fmt.format_chain_nation,
     _fmt.FORMAT_CHAIN_NATION_SQL),
    ("retired_xmlbson_roundtrip_supplier", _fmt.xmlbson_roundtrip_supplier,
     _fmt.XMLBSON_ROUNDTRIP_SUPPLIER_SQL),
]

# r12 rotation: the four staged entries (streaming_hourly_composite,
# strip_markup_documents, dedup_representatives_documents,
# bloom_decontaminate_documents) are now REGISTERED (they run above
# via registry.queries()); the composite's three hourly constituents
# and the superseded near_dup_clusters_documents retired from the
# registry but keep their standalone oracle-parity rows here per the
# retirement contract.
from dbitool_spark.plans import state_ops as _state

_RETIRED_CASES += [
    ("retired_streaming_hourly_append_events",
     _state.streaming_hourly_append_events,
     _state.STREAMING_HOURLY_APPEND_SQL),
    ("retired_streaming_hourly_stats_events",
     _state.streaming_hourly_stats_events,
     _state.STREAMING_HOURLY_STATS_SQL),
    ("retired_events_hourly_stats", _ev.events_hourly_stats,
     _ev.EVENTS_HOURLY_STATS_SQL),
    ("retired_near_dup_clusters_documents",
     _llm.near_dup_clusters_documents,
     _llm.NEAR_DUP_CLUSTERS_SQL),
]

# r13 retirees (registered composites/superseders drive their
# codepaths in the driver window; these pin standalone semantics).
# The rows-only pair ann_topk_lsh/ann_topk_ivf also retired r13 —
# they have no oracle BY NATURE, so their standalone coverage stays
# where it always was: recall/top-k assertions in
# tests/test_llm_ops.py, plus the registered oracle-backed
# ann_topk_planted_hits driving the same kernels.
_RETIRED_CASES += [
    ("retired_ann_recall_planted", _llm.ann_recall_planted,
     _llm.ANN_RECALL_PLANTED_SQL),
    ("retired_ann_topk_bruteforce", _llm.ann_topk_bruteforce,
     _llm.ANN_TOPK_BRUTEFORCE_SQL),
    ("retired_ndb_upsert_replay", _state.ndb_upsert_replay,
     _state.NDB_UPSERT_REPLAY_SQL),
    ("retired_events_json_props", _ev.events_json_props,
     _ev.EVENTS_JSON_PROPS_SQL),
    ("retired_events_daily_type_pivot", _ev.events_daily_type_pivot,
     _ev.EVENTS_DAILY_TYPE_PIVOT_SQL),
]

# r14 retirees (the r14 rotation's registered composites/superseders
# drive their codepaths in the driver window; these rows pin the
# constituents' standalone semantics per the retirement contract).
_RETIRED_CASES += [
    # the three session-semantics realizations, merged into the
    # registered sessions_composite_events
    ("retired_user_sessions", _ev.user_sessions, _ev.USER_SESSIONS_SQL),
    ("retired_user_sessions_window", _ev.user_sessions_window,
     _ev.USER_SESSIONS_SQL),
    ("retired_streaming_user_sessions_events",
     _state.streaming_user_sessions_events,
     _ev.USER_SESSIONS_SQL),
    # the two format chains, merged into format_chain_docs_orders
    ("retired_format_chain_documents", _fmt.format_chain_documents,
     _fmt.FORMAT_CHAIN_DOCUMENTS_SQL),
    ("retired_format_chain_orders", _fmt.format_chain_orders,
     _fmt.FORMAT_CHAIN_ORDERS_SQL),
    # the two skew answers, merged into skew_composite_events
    ("retired_skewed_user_rollup_events", _ev.skewed_user_rollup_events,
     _ev.SKEWED_USER_ROLLUP_SQL),
    ("retired_skewed_segment_join_events", _ev.skewed_segment_join_events,
     _ev.SKEWED_SEGMENT_JOIN_SQL),
    # the two repetition projections, merged into
    # repetition_profile_documents
    ("retired_token_repetition_metrics_documents",
     _llm.token_repetition_metrics_documents,
     _llm.TOKEN_REPETITION_METRICS_SQL),
    ("retired_repetition_stats_documents", _llm.repetition_stats_documents,
     _llm.REPETITION_STATS_SQL),
    # the two per-source audits, merged into source_profile_documents
    ("retired_domain_stats_documents", _llm.domain_stats_documents,
     _llm.DOMAIN_STATS_SQL),
    ("retired_top_terms_per_source", _llm.top_terms_per_source,
     _llm.TOP_TERMS_PER_SOURCE_SQL),
    # superseded by dedup_representatives_documents (same
    # minhash_near_dup_pairs call plus CC + representative selection)
    ("retired_minhash_near_dup_documents", _llm.minhash_near_dup_documents,
     _llm.MINHASH_NEAR_DUP_SQL),
    # the two embedding audits, merged into the pulled-forward
    # embedding_audit_composite
    ("retired_kmeans_embeddings", _llm.kmeans_embeddings,
     _llm.KMEANS_EMBEDDINGS_SQL),
    ("retired_semantic_outliers_documents", _llm.semantic_outliers_documents,
     _llm.SEMANTIC_OUTLIERS_SQL),
    # r16 retirees — the three reserve merges executed (registry
    # ledger): the two semantic-dedup constituents, the two id-hash
    # partitioning constituents, and the BPE pair-statistics half
    # superseded by the full tokenizer composite
    ("retired_embedding_near_dup", _llm.embedding_near_dup,
     _llm.EMBEDDING_NEAR_DUP_SQL),
    ("retired_semdedup_embeddings", _llm.semdedup_embeddings,
     _llm.SEMDEDUP_EMBEDDINGS_SQL),
    ("retired_deterministic_split_documents",
     _pipe.deterministic_split_documents,
     _pipe.DETERMINISTIC_SPLIT_SQL),
    ("retired_sample_stratified_documents",
     _pipe.sample_stratified_documents,
     _pipe.SAMPLE_STRATIFIED_SQL),
    ("retired_bpe_pair_counts_documents", _llm.bpe_pair_counts_documents,
     _llm.BPE_PAIR_COUNTS_SQL),
]

# STAGED r15 NET-NEW candidates (the r14 plan leaves r15 with 4 slots
# of slack — registry ledger): model-based quality filtering, ndb
# time travel, and the continuous-aggregate rollup.
_RETIRED_CASES += [
    # linear-classifier inference (CCNet/LLaMA-style model-based
    # quality filter): deterministic rank->weight vocab, broadcast
    # lookup, exact rational logit; differential-tested against a
    # pure-Python reference in test_llm_ops
    ("staged_classifier_score_documents",
     _llm.classifier_score_documents,
     _llm.CLASSIFIER_SCORE_SQL),
    # ndb TIME TRAVEL: keep_versions retention + replay(as_of=gen);
    # each retained snapshot hash-matches the last-write-wins
    # resolution over its batch prefix
    ("staged_ndb_time_travel_replay",
     _state.ndb_time_travel_replay,
     _state.NDB_TIME_TRAVEL_SQL),
    # continuous aggregate maintained in ndb via foreachBatch
    # read-modify-write merge (the incremental-materialized-view /
    # hypertable-rollup shape); final state hash-matches the batch
    # GROUP BY regardless of micro-batch boundaries
    ("staged_streaming_rollup_ndb_events",
     _state.streaming_rollup_ndb_events,
     _state.STREAMING_ROLLUP_NDB_SQL),
    # int8-quantized ANN (l2 scale): integer-exact dot-product top-k
    # — bit-exact across engines by IEEE determinism (norms pinned
    # bit-for-bit in test_llm_ops), recall@5 ~0.98 vs float cosine
    ("staged_quantized_ann_topk_embeddings",
     _llm.quantized_ann_topk_embeddings,
     _llm.QUANTIZED_ANN_TOPK_SQL),
    # r15/r16 candidate (net-new r13): CCNet-style unigram-LM
    # cross-entropy quality scoring — even doc_ids train the
    # reference LM, odd doc_ids score held-out; per-token surprisal
    # quantized to integer milli-bits so the per-doc sum is exact in
    # both engines and the tail flag is an integer cross-multiply
    ("staged_perplexity_score_documents",
     _llm.perplexity_score_documents,
     _llm.PERPLEXITY_SCORE_SQL),
    # r15/r16 candidate (net-new r13): DSIR importance-resampling
    # weights (Xie et al. 2023) — one conditional-count pass builds
    # BOTH distributions, per-token log-ratio of one exact rational
    # quantized to integer milli-bits, keep flag = sum > 0
    ("staged_dsir_weights_documents",
     _llm.dsir_weights_documents,
     _llm.DSIR_WEIGHTS_SQL),
    # r15 merge candidate (ledger capacity note): embedding_near_dup
    # + semdedup_embeddings sharing ONE checkpointed pair table —
    # measured 3.30s vs the constituents' combined 4.82s at sf0.1
    ("staged_semantic_dedup_composite",
     _llm.semantic_dedup_composite,
     _llm.SEMANTIC_DEDUP_COMPOSITE_SQL),
    # r15 merge candidate #3 (ledger capacity note): the two
    # multiplicative-id-hash partitioning entries in one row
    ("staged_split_sample_composite",
     _pipe.split_sample_composite,
     _pipe.SPLIT_SAMPLE_COMPOSITE_SQL),
    # r15 candidate: the capstone per-doc keep/drop verdict — quorum
    # of the four quality-signal families (rule prune, repetition,
    # classifier, perplexity tail); supersedes quality_prune when it
    # registers (drives the same percent-rank window plus three more
    # signal codepaths)
    ("staged_quality_ensemble_documents",
     _llm.quality_ensemble_documents,
     _llm.QUALITY_ENSEMBLE_SQL),
    # r15/r16 candidate (net-new r13): the full BPE merge-LEARNING
    # loop — K unrolled count/argmax/apply rounds over the
    # vocab-sized word-frequency table; the two-pass-replace merge
    # semantics are property-pinned in test_llm_ops (exact textbook
    # greedy for a != b; locally-maximal documented variant for
    # self-pairs). Natural later composite with bpe_pair_counts.
    ("staged_bpe_learn_merges_documents",
     _llm.bpe_learn_merges_documents,
     _llm.BPE_LEARN_MERGES_SQL),
    # r15/r16 candidate (net-new r14): the APPLY half of tokenizer
    # training — re-derive the K learned merges, encode every corpus
    # token via the vocab-sized distinct-word table, emit the per-doc
    # symbol-count audit; completes the pair-counts -> learn -> encode
    # story (natural later composite of the three)
    ("staged_bpe_encode_documents",
     _llm.bpe_encode_documents,
     _llm.BPE_ENCODE_DOCUMENTS_SQL),
    # r15/r16 candidate (net-new r14): interpolated bigram-LM
    # cross-entropy — the n-gram upgrade of perplexity_score toward
    # CCNet's KenLM shape; the model now carries token ORDER
    ("staged_bigram_lm_score_documents",
     _llm.bigram_lm_score_documents,
     _llm.BIGRAM_LM_SCORE_SQL),
    # r17 merge candidate (staged r15, the registry ledger's
    # 'lm_scores' row): perplexity_score + bigram_lm from ONE corpus
    # pass — both constituents' slots reclaim r17 when it registers
    ("staged_lm_scores_composite",
     _llm.lm_scores_composite,
     _llm.LM_SCORES_COMPOSITE_SQL),
    # r16 merge candidate (net-new r14): the full tokenizer story in
    # one kind-tagged row — supersedes bpe_pair_counts (registered
    # r14, due r16) while registering learn + encode in its slot
    ("staged_bpe_pipeline_documents",
     _llm.bpe_pipeline_documents,
     _llm.BPE_PIPELINE_DOCUMENTS_SQL),
    # r16 candidate (staged ahead): decode -> nearest-neighbor resize
    # -> channel means over the synthesized image corpus; every synth
    # pixel is closed-form so the oracle states the resized means
    # arithmetically (numpy-reference differential in test_llm_ops)
    ("staged_media_resize_documents",
     _llm.media_resize_documents,
     _llm.MEDIA_RESIZE_DOCUMENTS_SQL),
    # r16 merge candidate: ONE synth pass -> container decode + pixel
    # resize, joined on media_id (supersedes media_decode_roundtrip +
    # media_resize_documents when it registers; pixel-decoder
    # src_w/src_h cross-check container width/height in one hash)
    ("staged_media_pipeline_documents",
     _llm.media_pipeline_documents,
     _llm.MEDIA_PIPELINE_DOCUMENTS_SQL),
    # r17 superseder candidate (staged r16, r15 verdict item 5): the
    # range-pruned ndb WRITE path plus the bucket+range-PRUNED
    # NdbTable.lookup() READ path in one kind-tagged row — supersedes
    # ndb_range_pruned_replay when it registers; the function asserts
    # pruning engaged via last_lookup_stats
    ("staged_ndb_replay_lookup_composite",
     _state.ndb_replay_lookup_composite,
     _state.NDB_REPLAY_LOOKUP_SQL),
    # r17 net-new candidate (staged r16, one of the 2 structural
    # slots): winnowing fingerprints (Schleimer et al. 2003 / MOSS) —
    # per-doc density profile + shared-rare-fingerprint pairs over
    # the perturbed corpus; selection by lexicographic order so both
    # engines pick the identical set (kernel docstring)
    ("staged_winnow_near_dup_documents",
     _llm.winnow_near_dup_documents,
     _llm.WINNOW_NEAR_DUP_SQL),
    # r17 net-new candidate (staged r16, the other structural slot):
    # q-gram prefix-filtered edit-distance self-join (Gravano et al.
    # 2001 / Ed-Join) on document titles + planted 1-deletion copies;
    # the oracle is brute force, so the hash proves filter recall 1.0
    # AND cross-engine levenshtein value agreement
    ("staged_edit_distance_join_documents",
     _llm.edit_distance_join_documents,
     _llm.EDIT_DISTANCE_JOIN_DOCUMENTS_SQL),
    # r18 net-new candidate (staged r16): GLOBAL single-stream
    # sequence packing via the distributed scan
    # (ops/scale.with_running_total; contrast the registered
    # per-bucket pack_sequences_documents) — the
    # oracle states the naive single-partition global window, so the
    # hash proves the two-phase prefix-sum decomposition computes
    # exactly the single-window semantics
    ("staged_global_pack_documents",
     _llm.global_pack_documents,
     _llm.GLOBAL_PACK_DOCUMENTS_SQL),
    # r18 superseder candidate (staged r16): split_sample_composite's
    # two legs verbatim PLUS the near-dup-aware kind='safe' leg —
    # clusters (recomputed independently by the oracle's recursive
    # closure) assigned to train/val/test atomically, so near-dups
    # can never straddle an evaluation boundary
    ("staged_leakage_safe_split_composite",
     _pipe.leakage_safe_split_composite,
     _pipe.LEAKAGE_SAFE_SPLIT_SQL),
]
_CASES = _CASES + _RETIRED_CASES


@pytest.mark.parametrize(
    "name,fn,sql", [c for c in _CASES if c[2] is not None], ids=[c[0] for c in _CASES if c[2] is not None]
)
def test_query_matches_oracle(spark, duck, name, fn, sql):
    df = fn(spark, SF_ORACLE)
    problems = compare(df, duck, sql)
    assert not problems, f"{name}: " + "; ".join(problems)
    if name not in MAY_BE_EMPTY:
        assert df.count() > 0, f"{name}: vacuous — query returned 0 rows at sf0.01"


@pytest.mark.parametrize(
    "name,fn", [(c[0], c[1]) for c in _CASES if c[2] is None], ids=[c[0] for c in _CASES if c[2] is None]
)
def test_rows_only_queries_run(spark, name, fn):
    """Queries without an oracle still must execute, produce a stable
    schema, and (unless whitelisted) be non-empty."""
    df = fn(spark, SF_ORACLE)
    n = df.count()
    assert len(df.columns) > 0, name
    if name not in MAY_BE_EMPTY:
        assert n > 0, f"{name}: vacuous — 0 rows at sf0.01"
