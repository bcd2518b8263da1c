"""Declared query inventory (the driver's correctness + bench surface).

Every operator the engine claims (SURVEY.md §2 parity set + the
beyond-reference relational surface + LLM-pipeline operators) is
declared here as a named query: a (spark, sf_dir) -> DataFrame callable
plus, where ANSI-SQL-expressible, a DuckDB oracle string producing the
same columns. The driver hash-compares the two at sf0.01.
"""

from chapterhousedb_spark.workload.registry import ORACLES, QUERIES, load, query

# importing the modules populates the registry
from chapterhousedb_spark.workload import relational as _relational  # noqa: E402,F401
from chapterhousedb_spark.workload import llm as _llm  # noqa: E402,F401
from chapterhousedb_spark.workload import temporal as _temporal  # noqa: E402,F401
from chapterhousedb_spark.workload import lifecycle as _lifecycle  # noqa: E402,F401

# The driver's correctness artifact covers the FIRST 50 declared queries
# (dict order), so ordering is risk-based, not module-import order:
# the entries most likely to regress (event-time handling, streaming,
# the engine lifecycle, composed pipelines) come first, and the
# rows-only-by-design entries (whose driver check is weakest) plus
# family-redundant entries (their operator family has other covered
# rows) come last, where truncation costs least. On top of the static
# ordering, a deterministic per-round ROTATION (below) swaps a few
# stable tail rows into the window each round so every oracle row
# re-earns driver-green every handful of rounds without judge
# intervention (ADVICE/VERDICT r5 #4).
_DRIVER_FIRST = [
    "events_json",
    "engine_materialize_roundtrip",
    # round-5 additions and the round-4 tail rows the judge had to
    # verify by hand — new/changed oracle surface belongs INSIDE the
    # driver's 50-row window (ADVICE r4), paid for by demoting
    # long-stable family-redundant rows below
    "streaming_events_hourly_files",
    # (streaming_asof_enrich sat here rounds 5-12; demoted round 13 to
    # pay for audio_near_dup — see the round-13 batch comment below)
    "streaming_interval_join",
    # round-6 seventh batch: LEFT OUTER stream-stream interval join
    # (the funnel "did NOT convert" shape) — paid for by demoting
    # streaming_events_hourly, which streaming_events_hourly_files
    # SUBSUMES (same windowed agg drained through the stronger
    # parquet-sink path with the watermark cutoff under the same gate)
    # streaming_interval_join_outer demoted round 9 to pay for
    # pipeline_retrieval (see _DRIVER_LAST)
    "streaming_dedup",
    "streaming_enrich",
    # round-6 additions: the last streaming operator under the gate,
    # the correlated-aggregate decorrelation shape, and the forced
    # sort-merge-join strategy pin (paid for by permanently demoting
    # join_semi / join_range_bands / pivot_mktsegment below)
    "streaming_sessionize",
    # tpch_q17_small_qty demoted round 9 to pay for embedding_clusters
    # (see _DRIVER_LAST)
    # round-6 second batch: four more TPC-H plan shapes (outer-join
    # histogram, IN-subquery semi + top-k, the double EXISTS/NOT EXISTS
    # decorrelation, scalar-broadcast + anti), the incremental-rollup
    # pattern (partial/merge vs direct-aggregation oracle), and three
    # LLM-pipeline ops (vocabulary, tf-idf terms, deterministic
    # training order) — paid for by demoting nine long-stable
    # family-redundant rows below
    "tpch_q18_large_orders",
    # (tpch_q13_cust_distribution sat here rounds 6-8; demoted round 9
    # to pay for markup_removal — see the round-9 batch comment below)
    # (events_rollup_daily sat here rounds 6-8; demoted round 9 to pay
    # for dedup_span_rewrite — see the round-9 batch comment below)
    # (tfidf_top_terms / training_order sat here rounds 6-8; demoted
    # round 9 to pay for embedding_dedup / bigram_coverage — see the
    # round-9 batch comment below)
    # round-6 third batch: distribution window functions and the
    # exact-moment statistical aggregates (var/stddev/corr via decimal
    # moments) — paid for by demoting window_topk_per_group (windows
    # now keep dist_funcs + every gated ORDER BY window) and
    # sample_split (sampling keeps stratified + the md5 family under
    # training_order)
    # round-6 fourth batch: corpus version diff (digest full-outer
    # join), per-group deterministic cap, equi-width histogram — paid
    # for by demoting pack_sequences (pack_materialize's oracle
    # subsumes it: token identity AND order), sample_stratified
    # (sampling keeps grouped/fraction/split family rows + the md5
    # machinery under training_order), and scalar_subquery (the
    # uncorrelated-scalar decorrelation is now gated through
    # tpch_q22's threshold subquery; correlated through tpch_q17)
    # (corpus_diff sat here rounds 6-12; demoted round 13 to pay for
    # media_near_dup — see the round-13 batch comment below)
    "histogram_totalprice",
    # round-6 fifth batch: the composed curation pipeline (filter ->
    # per-source cap -> split -> training order under one oracle) —
    # paid for by demoting compaction_roundtrip (the engine-lifecycle
    # family keeps engine_materialize_roundtrip gated; compaction
    # stays unit-tested in test_engine.py: sized rewrite + disjoint
    # clustered ranges) — and the mergeable-quantile rollup, paid for
    # by demoting agg_grouping_sets (aggs keep pricing_summary +
    # stats_funcs + both rollups gated; the GROUPING SETS Expand plan
    # is test-asserted in test_plans.py)
    # pipeline_curation demoted round 9 to pay for knn_graph
    # (see _DRIVER_LAST)
    # quantile_rollup demoted round 9 to pay for embedding_bq
    # (see _DRIVER_LAST)
    # round-6 sixth batch: the Q20-like double decorrelation
    # (correlated scalar agg INSIDE an IN subquery) — paid for by
    # demoting multimodal_meta, whose oracle is byte-length arithmetic
    # only; the REAL multimodal surface (decode, frame sampling, real
    # PPM/WAV codecs through mapInPandas) is gated by
    # tests/test_multimodal.py and its plan is asserted in
    # test_plans.py
    "tpch_q20_dominant_supplier",
    # round-6 eighth batch: the global-scalar HAVING (Q11) and argmax
    # (Q15) shapes — paid for by demoting events_sessionize and
    # asof_join_events, whose semantics stay gated through their
    # STREAMING twins under the SAME oracles: streaming_sessionize
    # hash-matches the identical batch gaps-and-islands SQL, and
    # streaming_asof_enrich drains against the same DuckDB ASOF JOIN
    # oracle (the three-way batch = streaming = DuckDB agreement)
    # (tpch_q11_important_parts sat here rounds 6-11; demoted round 12
    # to pay for url_etld_cap — see the round-12 batch comment below)
    # tpch_q15_top_supplier demoted round 12 to pay for source_overlap
    # (see the round-12 batch comment below): the TPC-H family keeps
    # q7/q18/q19/q20 gated in-window plus the rotation-cycled set, its
    # exact-decimal argmax + global-scalar HAVING shape stays re-hashed
    # every pytest run via test_oracle_parity, and it re-earns
    # driver-green via rotation like every demoted row.
    # ...and the Q7 dual-role-dimension shape, paid for by demoting
    # tpch_q3_shipping: its 3-way join + per-order agg + top-k shape
    # stays covered by tpch_q18 (3-way + semi + TakeOrdered) and the
    # q3 plan properties remain test-asserted (test_plans.py)
    "tpch_q7_nation_volume",
    # round-7 batch: the seven remaining distinct TPC-H plan shapes,
    # gated at birth (risk-first) — pure-pushdown scalar agg (Q6),
    # conditional-ratio agg (Q8), wide-group top-k (Q10),
    # conditional-count pivot (Q12), global dim-conditioned ratio
    # (Q14), NOT IN null-aware anti join + count-distinct (Q16), and
    # the OR-of-ANDs disjunctive pushdown (Q19). Paid for by demoting
    # seven long-stable rows whose families keep gated coverage:
    # events_sliding (streaming keeps all 9 streaming_* gates +
    # events_rollup_daily), corpus_report (text keeps vocab/tfidf +
    # the rotating text rows), window_dist_funcs / agg_stats_funcs
    # (windows/aggs keep topk-per-group, q11/q15, grouping sets via
    # rotation), sample_grouped (sampling keeps training_order),
    # duplicate_spans + contamination_check (dedup keeps
    # pipeline_pretrain/pipeline_curation end-to-end + survivors via
    # rotation). All seven join the rotation pool and re-earn
    # driver-green cyclically.
    # ...plus the token-budget mixture (weights in TOKENS, the
    # bucket-decomposed prefix-sum whose oracle replays the naive
    # running-sum form), paid for by demoting vocab_topk: the
    # explode -> map-side-combined groupBy -> top-k text family stays
    # gated through tfidf_top_terms (which subsumes the vocabulary
    # construction as its df stage) and vocab's TakeOrdered plan is
    # test-asserted
    # (token_budget_mix sat here rounds 7-9; demoted round 10 to pay
    # for embedding_mrl — see the round-10 batch comment below)
    # tpch_q6_forecast_revenue demoted round 9 to pay for
    # pipeline_fineweb (see _DRIVER_LAST)
    # (tpch_q8_market_share sat here rounds 7-9; demoted round 10 to
    # pay for pq_residual_fixed — see the round-10 batch comment)
    # tpch_q10_returned_items demoted round 9 to pay for c4_clean
    # (see _DRIVER_LAST)
    # tpch_q12_priority_shipping demoted round 9 to pay for
    # temperature_mix (see _DRIVER_LAST)
    # tpch_q14_promo_effect demoted round 9 to pay for embedding_sq8
    # (see _DRIVER_LAST)
    # tpch_q16_supplier_cnt demoted round 9 to pay for ngram_repetition
    # (see _DRIVER_LAST)
    "tpch_q19_disjunctive_revenue",
    "pack_materialize",
    "pii_redaction",
    "join_skew_salted",
    # (pipeline_pretrain sat here rounds 2-9; demoted round 10 to pay
    # for pipeline_cluster_balance — see the round-10 batch comment)
    # round-8 batch: the five round-7 tail additions that never earned
    # a driver-green CORRECTNESS row (VERDICT r7 #1 — the ADVICE-r4
    # "new oracle surface belongs INSIDE the window" discipline,
    # restored): candidate-pair verification features, L2 embedding
    # normalization, token-rarity features, and the two md5 hash-gate
    # twins that close the MinHash/SimHash rows-only verification gap.
    # Paid for by demoting five long-stable family-redundant rows to
    # the tail head (each green every round since birth, each family
    # keeps gated coverage): tpch_q5/q9/q21/q22 (the TPC-H family
    # keeps twelve other gated plan shapes this round — q2/q4/q6/q7/
    # q8/q10..q20 — and all four re-earn via rotation) and
    # incremental_merge (the merge family keeps corpus_diff gated +
    # the strategy-equality and plan tests in test_merge.py).
    # (rarity_stats sat here rounds 8-9; demoted round 10 to pay for
    # gopher_quality — see the round-10 batch comment below)
    # (pair_features sat here rounds 8-9; demoted round 10 to pay for
    # pq_fixed_codebook — see the round-10 batch comment below)
    # (embedding_normalize sat here rounds 8-9; demoted round 10 to pay
    # for ivf_fixed_centroids — see the round-10 batch comment below)
    # (minhash_md5_signatures sat here rounds 8-9; demoted round 10 to
    # pay for dedup_clusters_star — see the round-10 batch comment)
    "simhash_md5_fingerprints",
    # round-8 new surface, gated at birth: the composed two-stage
    # rerank pipeline (md5-portable LSH candidates -> exact token-set
    # rerank -> threshold, every stage oracle-replayed) and the
    # streaming ingest composition under the oracle gate (chained
    # two-batch admission drained through ingest_stream; DuckDB
    # replays the whole gate->merge->commit chain). Paid for by
    # demoting tpch_q4 (semi-join semantics stay gated through
    # tpch_q18's LeftSemi + TakeOrdered; q4's SMJ-semi plan stays
    # test-asserted in test_plans.py) and events_distinct_rollup
    # (the rollup family keeps events_rollup_daily + quantile_rollup
    # gated; distinct-agg semantics stay covered by agg_distinct via
    # rotation and the sketch tests in test_rollup.py).
    "pipeline_two_stage_dedup",
    "streaming_ingest_corpus",
    # round-9 new surface, gated at birth: SemDeDup-style semantic
    # dedup survivors (the full SRP-blocked pair + greedy
    # smaller-id-wins anti-join composition under one oracle) and the
    # bigram LM fluency features (corpus-self collocation coverage,
    # integer-exact like rarity_stats). Paid for by demoting
    # training_order (its md5 permutation machinery is replayed INSIDE
    # pipeline_curation's gated composed oracle as its final stage, so
    # the family keeps end-to-end coverage) and tfidf_top_terms (its
    # explode -> df-count -> join-back economics are now gated through
    # bigram_coverage + rarity_stats; its own oracle stays re-hashed on
    # every pytest run and rotation-eligible like any tail row).
    # (embedding_dedup sat here rounds 9-10; demoted round 11 to pay
    # for url_domain_cap — see the round-11 batch comment below)
    # (bigram_coverage sat here rounds 9-10; demoted round 11 to pay
    # for unigram_segment_fixed — see the round-11 batch comment)
    # ...plus the substring-level dedup REWRITE (the removal half of
    # Lee et al. substring dedup — duplicate_spans reports, this drops
    # and rebuilds under one end-to-end oracle incl. the exact text
    # reconstruction). Paid for by demoting events_rollup_daily: the
    # rollup family keeps quantile_rollup gated + the
    # partials==direct-aggregation invariant re-hashed on every pytest
    # run (test_oracle_parity + test_rollup.py), and the windowed-agg
    # path stays gated through streaming_events_hourly_files (same
    # grain under the stronger parquet-sink drain).
    # dedup_span_rewrite demoted round 12 to pay for line_dedup_docs
    # (see the round-12 batch comment below): the dedup family keeps
    # SIX other gated rows in-window (simhash_md5_fingerprints,
    # pipeline_two_stage_dedup, dedup_clusters_star, dedup_survivors,
    # url_dedup_docs, line_dedup_docs), the span machinery stays
    # re-hashed every pytest run via the duplicate_spans oracle row
    # (test_oracle_parity) plus the rewrite reconstruction unit tests,
    # and it re-earns driver-green via rotation like every demoted
    # row.
    # ...plus HTML/markup stripping over planted scaffolds (the
    # pii_redaction discipline — the synthetic corpus has no tags, so
    # both engines plant the same div/p/script/comment + entity
    # wrapper and the gate checks the strip chain character-exactly).
    # Paid for by demoting tpch_q13_cust_distribution: the TPC-H
    # family keeps FOURTEEN other gated plan shapes this round, q13's
    # LeftOuter-with-ON-predicate plan property stays test-asserted in
    # test_plans.py, and it re-earns driver-green via rotation.
    # (markup_removal sat here rounds 9-10; demoted round 11 to pay
    # for url_dedup_docs — see the round-11 batch comment below)
    # ...plus int8 scalar quantization (the compressed-vector family's
    # oracle anchor: bounds -> affine int8 codes -> dequantized-cosine
    # fold, every stage replayed closed-form in DuckDB; the trained
    # quantizers PQ/IVF-PQ stay rows-only beside it like
    # similarity_ivf). Paid for by demoting tpch_q14_promo_effect: the
    # TPC-H family keeps fourteen other gated plan shapes this round,
    # its conditional-ratio shape stays gated through tpch_q8 and
    # tpch_q12's conditional counts, and it re-earns driver-green via
    # rotation like every demoted row.
    # (embedding_sq8 sat here rounds 9-10; demoted round 11 to pay for
    # kn_bigram_scores — see the round-11 batch comment below)
    # ...plus the Gopher repetition-coverage filters (top-n-gram char
    # fraction + duplicated-n-gram char mass, every integer mass and
    # the final division replayed by DuckDB). Paid for by demoting
    # tpch_q16_supplier_cnt: its distinctive property (the null-aware
    # anti join `LeftAnti, BuildRight, true`) is plan-asserted in
    # test_plans.py, anti-join correctness stays gated through
    # tpch_q21/tpch_q22, and it re-earns driver-green via rotation.
    # (ngram_repetition sat here rounds 9-12; demoted round 13 to pay
    # for bpe_segment_fixed — see the round-13 batch comment below)
    # ...plus the C4 line-level cleanup, whose rebuilt text is
    # hash-checked character-exactly (every line predicate + the
    # sentence-count page rule under one oracle). Paid for by demoting
    # tpch_q10_returned_items: its distinctive plan property (the
    # TakeOrderedAndProject over the wide group) is asserted in
    # test_plans.py, the join+top-k family stays gated through
    # tpch_q3/tpch_q18, and it re-earns driver-green via rotation.
    # (c4_clean sat here rounds 9-10; demoted round 11 to pay for
    # lang_ngram_fixed — see the round-11 batch comment below)
    # ...plus alpha-temperature source resampling, whose md5 threshold
    # DERIVES from corpus counts — the oracle replays the whole
    # arithmetic chain (ascending-source sqrt fold, quota/rate, the
    # floor(rate*2^32) threshold) bit-exactly. Paid for by demoting
    # tpch_q12_priority_shipping: conditional CASE aggregation stays
    # gated through tpch_q8's conditional market-share ratio and
    # tpch_q4's exists-counts, the join family through tpch_q3/q18,
    # and it re-earns driver-green via rotation.
    # (temperature_mix sat here rounds 9-10; demoted round 11 to pay
    # for streaming_ingest_quality — see the round-11 batch comment)
    # ...plus the composed FineWeb curation pipeline (token floor ->
    # repetition gate -> exact dedup -> temperature mix, one oracle
    # replaying every stage — the round's composition proof, like
    # pipeline_curation for round 6). Paid for by demoting
    # tpch_q6_forecast_revenue: its distinctive property (ALL
    # predicates pushed to the scan) is plan-asserted in test_plans.py
    # test_tpch_q6_full_predicate_pushdown, scalar-agg pushdown stays
    # gated through tpch_q14-era shapes via rotation re-entry, and it
    # re-earns driver-green like every demoted row.
    "pipeline_fineweb",
    # ...plus 1-bit binary quantization (sign-bit packing -> xor ->
    # popcount -> rational angle proxy, all integer-exact and replayed
    # by DuckDB — the BQ oracle anchor beside embedding_sq8). Paid for
    # by demoting quantile_rollup: its mergeable-quantile partials are
    # pinned BIT-identical to the direct aggregation in
    # tests/test_rollup.py, the rollup family keeps
    # events_distinct_rollup in-window (and events_rollup_daily
    # rotation-eligible), and it re-earns driver-green via rotation.
    # (embedding_bq sat here rounds 9-11; demoted round 12 to pay for
    # quality_score_fixed — see the round-12 batch comment below)
    # ...plus the SRP-blocked kNN self-join (similarity graph /
    # hard-negative mining: pinned-sign bucketing -> exact pair cosine
    # -> direction union -> deterministic rank window, all replayed by
    # DuckDB). Paid for by demoting pipeline_curation: the composed-
    # pipeline family keeps THREE other gated compositions in-window
    # (pipeline_pretrain, pipeline_two_stage_dedup, pipeline_fineweb),
    # every curation stage operator also has its own gated row, and it
    # re-earns driver-green via rotation.
    # (knn_graph sat here rounds 9-11; demoted round 12 to pay for
    # pipeline_ccnet — see the round-12 batch comment below)
    # ...plus semantic clustering (the SemDeDup label step: the gated
    # SRP edge set closed transitively, oracle = recursive CTE like
    # dedup_clusters). Paid for by demoting tpch_q17_small_qty: the
    # correlated-scalar-aggregate family keeps tpch_q2 (multi-join
    # MIN), tpch_q20 (double decorrelation, plan-asserted exchange
    # reuse) and tpch_q22 (threshold broadcast) gated in-window, and
    # it re-earns driver-green via rotation.
    # (embedding_clusters sat here rounds 9-13; demoted round 14 to
    # pay for read_files_csv — see the round-14 batch comment below)
    # ...plus the composed retrieval funnel (BQ hamming prefilter ->
    # SQ8 dequantized rerank -> exact cosine top-10, every stage score
    # a gated column — the quantization family's capstone, all three
    # arithmetic chains replayed by DuckDB). Paid for by demoting
    # streaming_interval_join_outer: the interval-join family keeps
    # the INNER form gated in-window (same stream machinery, the outer
    # adds only the null-padding branch, which stays pinned in
    # tests/test_streaming.py), and it re-earns driver-green via
    # rotation.
    "pipeline_retrieval",
    # round-10 new surface, gated at birth (VERDICT r9 #1): the
    # pinned-codebook PQ twin (the production encode -> LUT -> ADC
    # chain replayed bit-exactly by DuckDB against a literal codebook —
    # closes the trained-quantizer scoring-arithmetic gap) and the
    # pinned-centroid IVF twin (the production ivf_assign normalize +
    # distance + argmin JVM expression under the same treatment). Paid
    # for by demoting pair_features (its exact token-set rerank
    # features are replayed VERBATIM inside pipeline_two_stage_dedup's
    # gated composed oracle as its stage 2, so the family keeps
    # end-to-end coverage) and embedding_normalize (the L2-normalize
    # fold is replayed inside the gated embedding_dedup / knn_graph /
    # embedding_clusters oracles and now ivf_fixed_centroids' oracle;
    # both re-earn driver-green via rotation like every demoted row).
    # (pq_fixed_codebook sat here rounds 9-14; demoted round 15 to pay
    # for pq_refine_fixed, which STRICTLY SUBSUMES its ADC arithmetic
    # — see the round-15 batch comment below)
    "ivf_fixed_centroids",
    # ...plus the remaining Gopher quality heuristics (symbol-to-word
    # ratio, bullet/ellipsis line fractions, alpha-word fraction,
    # stop-word presence — Rae et al. §A1.1, VERDICT r9 #5) over seven
    # scaffold classes that fire every threshold both ways. Paid for
    # by demoting rarity_stats: its postings -> df-count -> join-back
    # economics stay gated through bigram_coverage (in-window), its
    # integer-exact feature arithmetic through the same row, and it
    # re-earns driver-green via rotation like every demoted row.
    "gopher_quality",
    # ...plus the large-star/small-star solver under the SAME
    # recursive-CTE oracle as dedup_clusters — the alternating
    # algorithm's fixpoint faces the hash gate on real near-dup
    # structure, not only its unit tests. Paid for by demoting
    # minhash_md5_signatures: the md5-portable minhash family stays
    # gated END-TO-END through pipeline_two_stage_dedup (same
    # signatures as its stage 1) and streaming_ingest_corpus (same
    # band family through the chained streaming admission), and it
    # re-earns driver-green via rotation like every demoted row.
    # (dedup_clusters_star sat here rounds 10-13; demoted round 14 to
    # pay for read_files_jsonl — see the round-14 batch comment below)
    # ...plus the RESIDUAL IVF-PQ chain (residual_frame -> residual
    # codes -> per-cell LUT fold) under pinned state — the one
    # quantizer arithmetic the two twins above don't reach. Paid for
    # by demoting tpch_q8_market_share: the TPC-H family keeps SIX
    # other gated plan shapes in-window (q7/q11/q15/q18/q19/q20), its
    # conditional-ratio aggregation stays re-hashed against DuckDB on
    # every pytest run (test_oracle_parity) with its no-forced-
    # broadcast plan property asserted in test_plans.py, and it
    # re-earns driver-green via rotation like every demoted row.
    # pq_residual_fixed demoted round 12 to pay for dsir_weights (see
    # the round-12 batch comment below): the quantization family keeps
    # FOUR gated rows in-window (pq_fixed_codebook, ivf_fixed_centroids,
    # embedding_mrl, pipeline_retrieval), the residual-LUT chain stays
    # re-hashed every pytest run via test_oracle_parity, and it
    # re-earns driver-green via rotation like every demoted row.
    # ...plus Matryoshka prefix-dimension retrieval (coarse 16-dim
    # cosine -> top-64 -> exact full-dim rerank, both stage scores
    # gated). Paid for by demoting token_budget_mix: the mixture
    # family keeps temperature_mix gated in-window plus the full mix
    # stage replayed inside pipeline_fineweb's composed oracle, its
    # bucket-decomposed-prefix-sum == naive-running-sum invariant
    # stays re-hashed on every pytest run (test_oracle_parity), and
    # it re-earns driver-green via rotation like every demoted row.
    # (embedding_mrl sat here rounds 10-12; demoted round 13 to pay
    # for streaming_ingest_media — see the round-13 batch comment
    # below)
    # ...plus cluster-balanced corpus subsampling (pinned-centroid
    # cell assignment composed with the per-group md5 cap under ONE
    # oracle — the embedding-space diversity primitive). Paid for by
    # demoting pipeline_pretrain: the composed-pipeline family keeps
    # THREE other gated compositions in-window (pipeline_two_stage_
    # dedup, pipeline_fineweb, pipeline_retrieval), every pretrain
    # stage operator also has its own gated row, it has been
    # driver-green since round 2, and it re-earns driver-green via
    # rotation like every demoted row.
    # pipeline_cluster_balance demoted round 12 to pay for
    # semdedup_fixed (see the round-12 batch comment below): BOTH its
    # stages stay gated in-window through siblings — the pinned-
    # centroid ivf_assign chain (normalize/distance/argmin) is replayed
    # verbatim inside semdedup_fixed's oracle, and the md5 per-group
    # cap machinery inside url_domain_cap/url_etld_cap — it stays
    # re-hashed every pytest run via test_oracle_parity, and it
    # re-earns driver-green via rotation like every demoted row.
    # round-11 new surface, gated at birth (VERDICT r10 #6): the
    # key_skew heavy-hitter diagnostic's top-k + share + running-share
    # arithmetic replayed by DuckDB over the events join key. Listed
    # EXPLICITLY (not left to declaration-order spillover, which is
    # how a new row can silently push a _SWAP_POOL member out of the
    # static window); dedup_survivors is pinned here for the same
    # reason — it is a pool member and must sit in-window. Paid for by
    # tpch_q2_min_cost_supplier drifting to the tail head via the
    # spillover: the correlated-scalar-aggregate family keeps tpch_q20
    # (double decorrelation, plan-asserted exchange reuse) gated
    # in-window, q2's multiset-tie semantics stay re-hashed against
    # DuckDB on every pytest run (test_oracle_parity), and it re-earns
    # driver-green via rotation like every demoted row.
    "key_skew_events",
    "dedup_survivors",
    # ...plus URL canonicalization + URL-level dedup (VERDICT r10 #5 —
    # scheme/host folding, default ports, fragments, tracker params,
    # trailing slashes, all over a planted six-way variant scaffold
    # whose canonical strings the oracle rebuilds character-exactly).
    # Paid for by demoting markup_removal: the planted-scaffold text
    # family keeps c4_clean + pii_redaction + gopher_quality gated
    # in-window, its strip chain stays re-hashed against DuckDB on
    # every pytest run (test_oracle_parity), and it re-earns
    # driver-green via rotation like every demoted row.
    # (url_dedup_docs sat here rounds 11-12; demoted round 13 to pay
    # for video_near_dup — see the round-13 batch comment below)
    # ...plus unigram-LM Viterbi segmentation under a pinned model
    # (VERDICT r10 #4 — the tokenizer-family counterpart of
    # pq_fixed_codebook: the production lattice DP faces a full
    # path-enumeration recursive-CTE oracle bit-exactly; EM training
    # itself stays pinned by distributed==sequential equality tests
    # like BPE). Paid for by demoting bigram_coverage: long
    # driver-green (r9-r10), its explode -> df-count -> join-back
    # economics stay gated through ngram_repetition's in-window row,
    # its integer-exact feature arithmetic stays re-hashed against
    # DuckDB on every pytest run (test_oracle_parity), and it re-earns
    # driver-green via rotation like every demoted row.
    "unigram_segment_fixed",
    # ...plus char-n-gram language-id scoring under pinned one-vs-rest
    # weights (VERDICT r10 #7 — md5-bucketed trigram features, the
    # 4-lane gram-order linear fold, and the argmax chain all face
    # DuckDB bit-exactly; training accuracy floors vs the charset
    # baseline stay pinned in tests/test_classifier.py). Paid for by
    # demoting c4_clean: long driver-green (r9-r10), the line-level
    # text family keeps gopher_quality + pii_redaction +
    # temperature_mix gated in-window, its rebuilt-text hash stays
    # re-checked against DuckDB on every pytest run
    # (test_oracle_parity), and it re-earns driver-green via rotation.
    # (lang_ngram_fixed sat here rounds 11-12; demoted round 13 to pay
    # for wordpiece_segment_fixed — see the round-13 batch comment
    # below)
    # ...plus the FULL FineWeb admission composition under the gate
    # (VERDICT r10 #8 — quality -> dedup -> merge -> commit through
    # the streaming engine, both quality predicates + the chained
    # version semantics replayed by DuckDB; the planted scaffold makes
    # the gopher/C4 AND load-bearing). Paid for by demoting
    # temperature_mix: long driver-green (r9-r10), its entire
    # corpus-derived threshold arithmetic is replayed VERBATIM inside
    # pipeline_fineweb's in-window composed oracle as its final stage,
    # its own oracle stays re-hashed on every pytest run
    # (test_oracle_parity), and it re-earns driver-green via rotation.
    "streaming_ingest_quality",
    # ...plus per-domain caps (url_host normalization composed with
    # the md5 per-group cap under one oracle — the crawl stage after
    # URL dedup, closing VERDICT r10 Missing #3 end to end). Paid for
    # by demoting embedding_dedup: long driver-green (r9-r10), its SRP
    # pair blocking stays gated through knn_graph (same pinned-sign
    # bucketing) and its transitive closure through embedding_clusters
    # (both in-window), its own oracle stays re-hashed on every pytest
    # run (test_oracle_parity), and it re-earns driver-green via
    # rotation like every demoted row.
    # (url_domain_cap sat here rounds 11-13; demoted round 14 to pay
    # for chunk_overlap_docs — see the round-14 batch comment below)
    # ...plus interpolated Kneser-Ney bigram LM fluency — the
    # CCNet-style LM-quality stage with KenLM's smoothing, closed-form
    # from corpus counts so the ENTIRE trained model (discount /
    # continuation / backoff arithmetic + the per-doc ordered
    # probability fold) faces the hash gate; the log2 perplexity
    # column stays python-reference-pinned (not bit-portable). Paid
    # for by demoting embedding_sq8: long driver-green (r9-r10), the
    # quantization family keeps FIVE other gated rows in-window
    # (pq_fixed_codebook, ivf_fixed_centroids, pq_residual_fixed,
    # embedding_bq, embedding_mrl) plus pipeline_retrieval whose
    # composed oracle replays the SAME sq8 dequantized-rerank stage
    # scores in-window, and it re-earns driver-green via rotation.
    "kn_bigram_scores",
    # round-12 new surface, gated at birth (VERDICT r11 #3): per-
    # registered-domain caps — eTLD+1 extraction under the pinned
    # public-suffix snapshot composed with the md5 per-group cap, the
    # crawl stage that fixes full-host grouping's subdomain-farm
    # under-capping. DuckDB replays the longest-suffix match against
    # the same literal snapshot. Paid for by demoting
    # tpch_q11_important_parts: long driver-green (r6-r11), the TPC-H
    # family keeps q7/q15/q18/q19/q20 + the rotation-cycled set gated
    # in-window, its global-scalar-HAVING shape stays re-hashed
    # against DuckDB on every pytest run (test_oracle_parity), and it
    # re-earns driver-green via rotation like every demoted row.
    "url_etld_cap",
    # ...plus quality scoring under pinned logreg weights (VERDICT r11
    # #7 — the last trained-model family without a gated scoring row):
    # the production text_stats features + logreg_eta fold face DuckDB
    # bit-exactly, and the keep/drop decision gates through eta > 0 ==
    # sigmoid > 0.5 (exp stays out of the gated set);
    # quality_classifier itself stays rows-only. Paid for by demoting
    # embedding_bq: long driver-green (r9-r11), the quantization
    # family keeps FOUR other gated rows in-window (pq_fixed_codebook,
    # ivf_fixed_centroids, pq_residual_fixed, embedding_mrl) plus
    # pipeline_retrieval whose composed oracle replays the SAME BQ
    # hamming-prefilter stage scores in-window, and it re-earns
    # driver-green via rotation like every demoted row.
    "quality_score_fixed",
    # ...plus the CCNet curation composition (VERDICT r11 #4): pinned
    # language gate -> Kneser-Ney fluency trained on the GATED subset
    # -> corpus-derived tercile split via the fixed-point bin-histogram
    # rule (no global sort, no float quantile interpolation) ->
    # per-bucket md5-threshold sampling, every stage replayed by
    # DuckDB under one oracle. Paid for by demoting knn_graph: long
    # driver-green (r9-r11), the similarity family keeps
    # embedding_clusters + dedup_survivors gated in-window (same SRP
    # blocking and transitive machinery), its no-cartesian plan stays
    # asserted in test_plans.py, and it re-earns driver-green via
    # rotation like every demoted row.
    "pipeline_ccnet",
    # ...plus corpus-global line-level dedup (the RefinedWeb/C4
    # boilerplate-stripping stage the dedup family lacked: document-
    # level dedup can't see a cookie banner repeated across a million
    # otherwise-distinct pages). The scaffold plants nav-header /
    # unique-body / blank / within-doc-repeat / footer lines so the
    # count threshold, the corpus-first keeper rule and the ordered
    # reassembly are all load-bearing; DuckDB replays every stage
    # character-exactly. Paid for by demoting dedup_span_rewrite (see
    # its comment above).
    "line_dedup_docs",
    # ...plus DSIR importance-resampling selection (Xie et al. 2023 —
    # the data-selection stage CCNet/DSIR-style curation pipelines run
    # between language-ID and dedup): both hashed-bigram bucket models
    # trained CLOSED-FORM from exact counts (the kn_bigram_scores
    # pattern: no iteration, so the whole train->score->select chain
    # is SQL-replayable), each doc's ordered ratio-product fold and
    # the integer-arithmetic top-quartile rule gated bit-exactly.
    # Paid for by demoting pq_residual_fixed (see its comment above).
    "dsir_weights",
    # ...plus cluster-blocked SemDeDup (Abbas et al. 2023 — the paper-
    # faithful k-means-cell blocking beside the SRP-blocked
    # embedding_dedup): pinned-centroid cells, within-cell exact
    # cosine pairs, keep-farthest-from-centroid dominance, with a
    # planted scaled-twin scaffold guaranteeing non-vacuous pairs at
    # every sf. Paid for by demoting pipeline_cluster_balance (see its
    # comment above).
    # (semdedup_fixed sat here rounds 11-14; demoted round 15 to pay
    # for srp_multitable_ann — see the round-15 batch comment below)
    # ...plus the cross-source vocabulary overlap matrix (the pre-mix
    # corpus-composition diagnostic: near-identical crawls posing as
    # two sources inflate dedup load and silently double their mix
    # weight). The operator's set-based pair derivation and the
    # oracle's DISTINCT-posts self-join are different formulations of
    # the same relation, so their equality is itself under the gate.
    # Paid for by demoting tpch_q15_top_supplier (see its comment
    # above).
    "source_overlap",
    # round-13 new surface, gated at birth (VERDICT r12 #1): image
    # perceptual near-dup — aHash/dHash fingerprints through the REAL
    # PNG/BMP codec round-trip (executor-built scaffold images from an
    # md5 pixel formula; 2x-upscaled re-encoded twins) paired via the
    # Manku pigeonhole blocking shared with text SimHash. The oracle
    # brute-forces all pairwise hammings from the same literal
    # formula, so codec fidelity, the integer hash arithmetic AND the
    # blocking's guaranteed-recall property are all under one gate.
    # Paid for by demoting corpus_diff: long driver-green (r6-r12),
    # the corpus-diagnostics family keeps source_overlap +
    # table_profile (pool) in-window, its digest full-outer-join
    # machinery stays re-hashed against DuckDB every pytest run
    # (test_oracle_parity), and it re-earns driver-green via rotation
    # like every demoted row.
    "media_near_dup",
    # ...plus BPE merge application under a pinned merge list (VERDICT
    # r12 #2 — the LAST trained-model family without a hash-gated
    # twin): the production pandas rank-greedy path faces a DuckDB
    # in-order replace() replay bit-exactly over the corpus vocabulary
    # plus a planted scaffold that fires every merge at any sf (path
    # equivalence pinned by tests/test_text.py). Gating it at birth
    # also caught a DuckDB WITH RECURSIVE quirk (bare UNION across CTE
    # branches does not dedupe) latent in the unigram gate. Paid for
    # by demoting ngram_repetition: long driver-green (r9-r12), the
    # quality-heuristics family keeps gopher_quality + pipeline_fineweb
    # (composed gopher+c4 stages) in-window, its 9-gram-table plan
    # stays re-hashed against DuckDB every pytest run
    # (test_oracle_parity), and it re-earns driver-green via rotation
    # like every demoted row.
    "bpe_segment_fixed",
    # ...plus the multimodal admission gate composed into the
    # streaming ingest path (VERDICT r12 #6): the same foreachBatch ->
    # admit_batch -> merge_upsert -> marker-flip machinery as
    # streaming_ingest_corpus with the near-dup gate swapped for the
    # bipartite perceptual image gate (media_near_dup_pairs_cross) —
    # planted real PNG/BMP images (md5 pixel formula, 2x-upscale twin
    # pairs straddling the version split) drain as ordered micro-
    # batches and DuckDB replays the ENTIRE chained admission from the
    # formula (84 stage-1 + 83 chained stage-2 rejections at sf0.01 —
    # non-vacuous by construction). Paid for by demoting embedding_mrl:
    # long driver-green (r10-r12), the quantization family keeps
    # pq_fixed_codebook + ivf_fixed_centroids in-window plus
    # pipeline_retrieval's composed sq8/BQ stage replays, its prefix-
    # dot arithmetic stays re-hashed against DuckDB every pytest run
    # (test_oracle_parity), and it re-earns driver-green via rotation
    # like every demoted row.
    "streaming_ingest_media",
    # ...plus audio perceptual near-dup (the AUDIO half of the
    # multimodal-dedup ask; media_near_dup covers images): the
    # audio_phash energy-envelope fingerprint over REAL WAV containers
    # (PCM16 base clips, a G.711 mu-law re-encoded twin with
    # bit-identical linear samples by codeword-value construction, and
    # a 2x sample-repetition upsample twin) paired via the shared
    # Manku blocking, brute-force-replayed by DuckDB from the literal
    # sample formula including the mu-law expansion arithmetic. Paid
    # for by demoting streaming_asof_enrich: long driver-green
    # (r5-r12), the streaming family keeps SEVEN gated rows in-window
    # (events_hourly_files, interval_join, dedup, enrich,
    # ingest_corpus, ingest_quality, ingest_media, plus sessionize in
    # the rotation pool), its ASOF semantics stay hash-gated through
    # the same DuckDB ASOF oracle on the batch twin asof_join_events
    # (re-hashed every pytest run via test_oracle_parity), and it
    # re-earns driver-green via rotation like every demoted row.
    "audio_near_dup",
    # ...plus video near-dup by frame-fingerprint containment
    # (completing the image/audio/VIDEO perceptual-dedup triple):
    # per-frame aHash through the real multi-frame GIF decode, distinct
    # frame-hash inverted index, containment rule — catching both the
    # re-encoded copy AND the frame-sampled copy (containment 1.0 where
    # Jaccard dilutes to 0.5); DuckDB replays every frame signature
    # from the literal pixel formula and the containment arithmetic.
    # Paid for by demoting url_dedup_docs: long driver-green (r11-r12),
    # the URL family keeps url_domain_cap + url_etld_cap in-window
    # (host normalization + the md5 cap composed), its canonicalize
    # chain stays re-hashed against DuckDB every pytest run
    # (test_oracle_parity) and unit-tested rule-by-rule in
    # tests/test_urls.py, and it re-earns driver-green via rotation
    # like every demoted row.
    "video_near_dup",
    # ...plus WordPiece greedy longest-match-first segmentation under
    # a pinned vocab — hash gates now cover the APPLY side of all
    # THREE tokenizer families (BPE rank-greedy, unigram Viterbi,
    # WordPiece greedy), with the BERT whole-word [UNK] rule made
    # load-bearing by omitting 'q' from the pinned vocab. Paid for by
    # demoting lang_ngram_fixed: long driver-green (r11-r12), the
    # trained-classifier family keeps quality_score_fixed in-window
    # AND pipeline_ccnet's composed in-window oracle replays the SAME
    # lang_ngram_score gate arithmetic end-to-end, its pinned-weights
    # replay stays re-hashed against DuckDB every pytest run
    # (test_oracle_parity), and it re-earns driver-green via rotation
    # like every demoted row.
    "wordpiece_segment_fixed",
    # round-14 new surface, gated at birth (VERDICT r13 #5 — the
    # reference's own unchecked roadmap formats, README.md:63-66): CSV
    # through the read_files front door — a real header'd CSV
    # round-trip with a synthesized comma-bearing column so writer
    # quoting and reader unquoting are both load-bearing, plus schema
    # inference; the oracle derives the same rows from parquet. Paid
    # for by demoting embedding_clusters: long driver-green (r9-r13),
    # the k-means/quantizer family keeps ivf_fixed_centroids in-window
    # (the same Lloyd assignment arithmetic under pinned centroids)
    # plus pipeline_cluster_balance and embedding_mrl in the rotation
    # pool, its assignment chain stays re-hashed against DuckDB every
    # pytest run (test_oracle_parity), and it re-earns driver-green
    # via rotation like every demoted row.
    "read_files_csv",
    # ...plus JSONL through the same front door (the other roadmap
    # format): newline-delimited JSON round-trip over documents whose
    # texts carry newlines/quotes, so the JSON escaping path is
    # load-bearing. Paid for by demoting dedup_clusters_star:
    # driver-green r10-r13, the cluster-labels family keeps
    # dedup_survivors in-window (pool-pinned) and dedup_clusters in
    # the rotation pool, star-contraction == plain-CC equality stays
    # randomized-tested in tests/test_cluster.py and re-hashed every
    # pytest run (test_oracle_parity), and it re-earns driver-green
    # via rotation like every demoted row.
    "read_files_jsonl",
    # ...plus fixed-size token-window chunking with overlap (the
    # RAG/embedding prep step — one shuffle-free posexplode pass whose
    # chunk-count formula, start positions, short final chunk and
    # single-space rejoin DuckDB replays verbatim; chunk=32/stride=24
    # guarantees overlapping multi-chunk docs at every sf). Paid for
    # by demoting url_domain_cap: driver-green r11-r13, the URL family
    # keeps url_etld_cap in-window — the strictly stronger composition
    # (same canonicalize + md5 cap arithmetic over eTLD+1 instead of
    # raw host) — its own oracle stays re-hashed every pytest run
    # (test_oracle_parity), and it re-earns driver-green via rotation
    # like every demoted row.
    "chunk_overlap_docs",
    # round-15 additions (VERDICT r14 #5's recall program, gated at
    # birth): multi-table SRP-LSH — two independent pinned sign
    # matrices (seeds 7/101), per-table probe sets, candidate union in
    # one corpus pass, exact rerank, all replayed by the oracle. Paid
    # for by demoting semdedup_fixed: driver-green r11-r14, the
    # SRP/embedding family keeps the new row's two pinned matrices
    # in-window plus similarity_ann in the rotation pool (promoted
    # stalest-first this very round), its composed dedup chain stays
    # re-hashed every pytest run (test_oracle_parity), and it re-earns
    # driver-green via rotation like every demoted row.
    "srp_multitable_ann",
    # ...plus pq_topk's refine branch under the pinned codebook — ADC
    # top-40 cut, broadcast join back, exact-cosine rerank to top 10,
    # both cut points and the cosine fold replayed by the oracle. Paid
    # for by demoting pq_fixed_codebook: driver-green r9-r14, and the
    # new row runs the IDENTICAL codebook through the IDENTICAL
    # encode -> LUT -> ADC chain before the cut, so the subsumed
    # arithmetic cannot drift without breaking the stronger gate; its
    # own full-corpus ADC oracle stays re-hashed every pytest run
    # (test_oracle_parity), and it re-earns driver-green via rotation
    # like every demoted row.
    "pq_refine_fixed",
    # Round-12 structural fix: the window used to SPILL past
    # _DRIVER_FIRST into module-registration order for its last few
    # seats, so adding a row silently shifted which middle rows held
    # seats (line_dedup_docs' insertion pushed pool-member
    # table_profile out and test_rotation caught it). The six
    # previously spilled seats are now EXPLICIT members, so the window
    # is exactly this list's first 50 names and insertions can never
    # reshuffle it.
    "scan_filter_project",
    "read_files_front_door",
    "agg_pricing_summary",
    "set_ops",
    "scalar_funcs",
    "table_profile",
]
_DRIVER_LAST = [
    # round-15 demotions, one per new gated row (see the round-15
    # batch comments in _DRIVER_FIRST for each pairing):
    "semdedup_fixed",
    "pq_fixed_codebook",
    # round-14 demotions, one per new gated row (see the round-14
    # batch comments in _DRIVER_FIRST for each pairing):
    "embedding_clusters",
    "dedup_clusters_star",
    "url_domain_cap",
    # round-13 demotions, one per new gated row (see the round-13
    # batch comments in _DRIVER_FIRST for each pairing):
    "corpus_diff",
    "ngram_repetition",
    "embedding_mrl",
    "streaming_asof_enrich",
    "url_dedup_docs",
    "lang_ngram_fixed",
    # round-12 demotions, one per new gated row (see the round-12
    # batch comments in _DRIVER_FIRST for each pairing):
    "tpch_q11_important_parts",
    "embedding_bq",
    "knn_graph",
    "dedup_span_rewrite",
    "pq_residual_fixed",
    "pipeline_cluster_balance",
    "tpch_q15_top_supplier",
    # round-11 demotions, one per new gated row (see the round-11
    # batch comments in _DRIVER_FIRST for each pairing):
    # markup_removal -> url_dedup_docs, bigram_coverage ->
    # unigram_segment_fixed, c4_clean -> lang_ngram_fixed,
    # temperature_mix -> streaming_ingest_quality, embedding_dedup ->
    # url_domain_cap, embedding_sq8 -> kn_bigram_scores. All long
    # driver-green (r9-r10), family-redundant, rotation-eligible:
    "markup_removal",
    "bigram_coverage",
    "c4_clean",
    "temperature_mix",
    "embedding_dedup",
    "embedding_sq8",
    # round-10 demotions paying for pq_fixed_codebook /
    # ivf_fixed_centroids / gopher_quality / dedup_clusters_star /
    # pq_residual_fixed / embedding_mrl / pipeline_cluster_balance
    # (see above); all long driver-green, family-redundant,
    # rotation-eligible:
    "pair_features",
    "embedding_normalize",
    "rarity_stats",
    "minhash_md5_signatures",
    "tpch_q8_market_share",
    "token_budget_mix",
    "pipeline_pretrain",
    # round-9 demotion paying for embedding_sq8 (see above); long
    # driver-green (r7-r8), family-redundant, rotation-eligible:
    "tpch_q14_promo_effect",
    # round-9 demotion paying for ngram_repetition (see above); its
    # null-aware anti-join plan shape stays test-asserted:
    "tpch_q16_supplier_cnt",
    # round-9 demotion paying for c4_clean (see above); its
    # TakeOrdered-wide-group plan shape stays test-asserted:
    "tpch_q10_returned_items",
    # round-9 demotion paying for temperature_mix (see above);
    # conditional CASE aggregation stays gated via tpch_q8/tpch_q4:
    "tpch_q12_priority_shipping",
    # round-9 demotion paying for pipeline_fineweb (see above); its
    # all-predicates-pushed scan is plan-asserted:
    "tpch_q6_forecast_revenue",
    # round-9 demotion paying for embedding_bq (see above); partials
    # bit-identity stays test-pinned in tests/test_rollup.py:
    "quantile_rollup",
    # round-9 demotion paying for knn_graph (see above); three other
    # composed pipelines stay gated in-window:
    "pipeline_curation",
    # round-9 demotion paying for embedding_clusters (see above);
    # correlated-scalar family keeps q2/q20/q22 in-window:
    "tpch_q17_small_qty",
    # round-9 demotion paying for pipeline_retrieval (see above); the
    # inner interval join stays gated, outer null-padding test-pinned:
    "streaming_interval_join_outer",
    # round-9 demotions paying for dedup_span_rewrite / markup_removal
    # (see above); long driver-green, family-redundant,
    # rotation-eligible:
    "events_rollup_daily",
    "tpch_q13_cust_distribution",
    # round-9 demotions paying for the two rows gated above — both
    # long driver-green (training_order r6-r8, tfidf_top_terms r6-r8),
    # both family-redundant (see the round-9 batch comment), both
    # promotion-eligible via the rotation:
    "training_order",
    "tfidf_top_terms",
    # round-8 demotions paying for the five round-7 oracle rows gated
    # above — all long driver-green (every round since birth through
    # r07), all family-redundant (see the round-8 batch comment in
    # _DRIVER_FIRST), all promotion-eligible tail rows that re-earn
    # driver-green via the rotation:
    "incremental_merge",
    "tpch_q5_region_revenue",
    "tpch_q9_nation_profit",
    "tpch_q21_lone_blame",
    "tpch_q22_idle_balances",
    "tpch_q4_order_priority",
    "events_distinct_rollup",
    # round-6 minor-family additions at the HEAD of the tail: the
    # static 50-slot budget is spent on the round's higher-risk surface
    # (TPC-H decorrelation shapes, rollups, composed pipelines,
    # streaming gates), and as pool head these three are promoted INTO
    # the driver window by this round's rotation anyway (so they still
    # arrive driver-gated, displacing three long-stable pool rows for
    # one round). Every declared oracle row — tail included — is also
    # hash-checked against DuckDB at sf0.001 by
    # tests/test_oracle_parity.py on every pytest run.
    # round-7 demotions paying for the seven new TPC-H gates above —
    # all long driver-green, all family-redundant (see the round-7
    # batch comment in _DRIVER_FIRST), all promotion-pool members that
    # re-earn driver-green via the rotation:
    "events_sliding",
    "vocab_topk",
    "corpus_report",
    "window_dist_funcs",
    "agg_stats_funcs",
    "sample_grouped",
    "duplicate_spans",
    "contamination_check",
    "set_ops_all",
    "null_semantics",
    "agg_collect_sorted",
    # family-redundant oracle entries, all long-stable (driver-green
    # since r2-r4) and each covered by gated rows of the same operator
    # family above: sampling keeps split+stratified; aggs keep
    # pricing_summary/distinct/rollup_cube/grouping_sets; windows keep
    # topk/lag_delta/range_frame; scalar exprs keep scalar_funcs;
    # subqueries keep cte+scalar; text keeps text_stats; dedup
    # clustering keeps dedup_survivors (whose recursive-CTE oracle
    # subsumes the component computation); scans keep
    # read_files_front_door+scan_filter_project; set ops keep set_ops.
    # NOT permanently driver-gated — each re-earns driver-green via the
    # rotation below, and scripts/check_fixes.py re-verifies by hand
    # whenever operator code changes.
    "sample_fraction",
    "agg_having",
    # demoted round 5 to make room for streaming_dedup /
    # incremental_merge / tpch_q3 / tpch_q5: joins keep
    # broadcast+fact_fact+skew_salted+q3+q5 gated;
    # aggs keep pricing_summary+rollup_cube+grouping_sets+percentile;
    # scalar exprs keep scalar_funcs; similarity keeps
    # topk+embedding_near_dup
    "join_anti",
    "agg_distinct",
    "date_funcs",
    "similarity_ann",
    # demoted for streaming_enrich: subquery family keeps
    # scalar_subquery gated; the CTE+IN-subquery shape is long-stable
    # (driver-green r1-r4) and its semi-join plan is test-asserted
    "cte_subquery",
    # demoted for events_sliding: exact dedup is long-stable (r1-r4)
    # and the dedup family keeps dedup_survivors, ngram_jaccard_pairs,
    # duplicate_spans, contamination_check and pipeline_pretrain gated
    "dedup_exact",
    # demoted for corpus_report, which SUBSUMES its oracle (the report
    # aggregates the same per-row ratio/quality SQL per source)
    "text_stats",
    # demoted round 6 for streaming_sessionize / tpch_q17 / tpch_q4:
    # semi-join semantics stay gated through tpch_q4 (SMJ left-semi),
    # the range-join plan is test-asserted (test_plans.py), and the agg
    # family keeps pricing_summary/rollup_cube/grouping_sets/percentile
    "join_semi",
    "join_range_bands",
    "pivot_mktsegment",
    # demoted round 6 (second batch) for tpch_q13/q18/q21/q22, the two
    # rollups, and vocab/tfidf/training_order: sorts stay exercised by
    # every gated ORDER BY/top-k query (q3/q13/q18/q21, vocab_topk) and
    # the nulls-first plan is test-asserted; the join family keeps
    # q3/q5/q4/q13/q18/q21/q22 + skew_salted gated; aggs keep
    # pricing_summary/grouping_sets; dedup keeps duplicate_spans/
    # contamination/survivors/pipeline_pretrain; similarity keeps
    # topk; windows keep topk_per_group; explode shapes are now gated
    # through vocab_topk/tfidf_top_terms. All nine remain in the
    # rotation's promotion pool and re-earn driver-green cyclically.
    "order_by_multi",
    "join_broadcast_dims",
    "join_fact_fact",
    "agg_rollup_cube",
    "ngram_jaccard_pairs",
    "embedding_near_dup",
    "percentile_agg",
    "lateral_explode",
    "window_range_frame",
    "window_topk_per_group",
    "sample_split",
    "compaction_roundtrip",
    "agg_grouping_sets",
    "multimodal_meta",
    "events_hourly",
    "streaming_events_hourly",
    "events_sessionize",
    "asof_join_events",
    "tpch_q3_shipping",
    "pack_sequences",
    "sample_stratified",
    "scalar_subquery",
    "window_running_sum",
    "window_ntile",
    "string_funcs",
    "exists_subquery",
    "distinct_pairs",
    "text_fingerprint",
    "text_repetition",
    "text_chunks",
    "lang_id",
    "named_table_scan",
    "dedup_clusters",
    "join_outer",
    "window_lag_delta",
    # rows-only by design: hash-function/iteration-dependent results
    "quality_classifier",
    "bpe_tokenize",
    # rows-only by design (round 11): unigram-LM EM training is
    # iterative state like BPE merges; pinned by the distributed==
    # sequential equality tests + the pinned-model hash gate
    # (unigram_segment_fixed) instead
    "unigram_tokenize",
    # rows-only by design (round 10): BFD bin packing is a sequential
    # loop per shard; pinned by the reference-equality tests instead
    "pack_best_fit",
    "agg_pricing_summary_double",
    "dedup_minhash",
    "dedup_simhash",
    "similarity_ivf",
]

# --------------------------------------------------------------- rotation
# Stable in-window rows eligible for TEMPORARY demotion. Every entry is
# long driver-green and family-redundant (its operator family keeps
# other gated rows while it sits out a round): aggs keep
# pricing_summary/grouping_sets, joins keep broadcast/skew/q3/q5/q4,
# windows keep topk, sampling keeps stratified, packs keep
# pack_materialize, dedup keeps duplicate_spans/contamination/survivors.
_SWAP_POOL = [
    # rebuilt round 11 (VERDICT r10 #1): the oracle-able tail grew to
    # ~90 rows while K stayed 6, stretching the full-tail re-gate
    # cycle to ~15 rounds against the documented ~8. K is now 11 and
    # the pool holds 13 in-window rows (>= K + 2 slack, so one member
    # drifting out of the window can never push the swap onto the
    # silent-no-op path). Every member is long driver-green and
    # family-redundant — its operator family keeps other gated rows
    # while it sits out a round:
    # aggs keep grouping-set/percentile coverage via rotation + the
    # decimal-exact helpers re-hashed every pytest run:
    "set_ops",
    "table_profile",
    "dedup_survivors",
    "agg_pricing_summary",
    # joins keep broadcast/fact-fact/q3/q7/q18/q19/q20 gated while the
    # salted-skew row sits out (salt plan test-asserted in
    # test_skew.py); text keeps corpus_report/c4/markup/gopher gated
    # while pii_redaction sits out (stream parity test-pinned):
    "join_skew_salted",
    "pii_redaction",
    # packs keep token-identity pinned by pack_materialize's oracle on
    # every pytest run; histogram binning the same way; agg family
    # keeps pricing_summary/quantile_rollup:
    "pack_materialize",
    "histogram_totalprice",
    # round-11 additions. TPC-H keeps q7/q11/q15/q18/q20 + the whole
    # rotation-cycled set gated while q19 sits out (its disjunctive
    # pushdown plan is asserted in test_plans.py), and vice versa for
    # q7 (dual-role nation joins; its no-forced-broadcast hint count
    # is plan-asserted):
    "tpch_q19_disjunctive_revenue",
    "tpch_q7_nation_volume",
    # dedup hash-twin family keeps pipeline_two_stage_dedup (the
    # minhash md5 stage end-to-end) + duplicate-span rows gated while
    # the simhash twin sits out:
    "simhash_md5_fingerprints",
    # streaming keeps events_hourly_files / asof_enrich /
    # interval_join / sessionize / ingest_corpus gated while one of
    # the two small stateful rows sits out:
    "streaming_dedup",
    "streaming_enrich",
    # round-12 additions (VERDICT r11 #2: pool sat at exactly the
    # pinned 9-round ceiling; K goes 11 -> 13 and the pool grows to 15
    # in-window members, >= K + 2 slack). TPC-H keeps q7/q11/q15/q19/
    # q20 + the rotation-cycled set gated while q18 sits out (its
    # LeftSemi + TakeOrderedAndProject plan is asserted in
    # test_plans.py); streaming keeps events_hourly_files/asof_enrich/
    # interval_join/dedup/enrich/ingest_corpus/ingest_quality gated
    # while the sessionize row sits out (its gaps-and-islands SQL is
    # additionally the batch twin's oracle, re-hashed every pytest
    # run via test_oracle_parity):
    "tpch_q18_large_orders",
    "streaming_sessionize",
    # round-13 additions (K goes 13 -> 15; the pool grows to 18
    # in-window members, >= K + 2 slack). All three long driver-green
    # and family-redundant: scalars keep scan_filter_project +
    # read_files_front_door + the per-pytest-run re-hash while
    # scalar_funcs sits out; the TPC-H family keeps q7/q18/q19 (pool
    # peers) + the rotation-cycled set while q20 sits out (its double
    # decorrelation plan is asserted in test_plans.py); quality
    # heuristics keep pipeline_fineweb's composed gopher+c4 replay +
    # the fixed-weights twins while gopher_quality sits out:
    "scalar_funcs",
    "tpch_q20_dominant_supplier",
    "gopher_quality",
]
_WINDOW = 50
# 15 swaps/round over a ~107-row oracle-able tail: the full tail
# re-earns driver-green every <= 8 rounds (ceil(tail/K)). K went
# 13 -> 15 in round 13 for the same reason it went 11 -> 13 in round
# 12 (VERDICT r11 #2: buy headroom BEFORE the new rows, not after the
# pin trips): the five round-13 demotions put the K=13 pool at
# exactly ceil(107/13)=9, the pinned ceiling, so round 14's first new
# gated row would have tripped the cadence pin. The pool below grew
# to 18 in-window members (>= K + 2 slack, so one member drifting out
# of the window can never push the swap onto the silent-no-op path).
# tests/test_rotation.py pins ceil(pool/K) <= 9 from the live
# ordering, so tail growth past ~135 rows fails loudly instead of
# silently slowing the cadence again.
_ROTATION_K = 15


def _current_round() -> int:
    """Driver round number, derived from the CORRECTNESS_r{N}.json
    artifacts the round driver leaves at the repo root (max N + 1;
    1 outside a driver checkout). Deterministic within a round: the
    current round's artifact is only written AFTER the correctness run
    that consumes this ordering.

    SPARK_GRAFT_ROUND, when set to a positive integer, overrides the
    artifact glob entirely (VERDICT r12 #7): any out-of-band
    CORRECTNESS_r{N}.json (a judge scratch file, a partial copy) would
    otherwise silently shift the rotation window. Invalid values are
    ignored rather than raised — a typo'd env var must not break every
    import of the workload package."""
    import glob
    import os
    import re

    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env is not None:
        try:
            n = int(env)
            if n >= 1:
                return n
        except ValueError:
            pass
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    ns = [
        int(m.group(1))
        for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        for m in [re.search(r"CORRECTNESS_r(\d+)\.json$", f)]
        if m
    ]
    return max(ns) + 1 if ns else 1


# diagnostics of the LAST _rotate application (tests/test_rotation.py
# asserts the swap actually fired; empty lists = no-op path taken)
_ROTATION_INFO: dict = {
    "demoted": [],
    "promoted": [],
    "promoted_last_green": {},
    "window_static": [],
    "pool_size": 0,
}


def _last_green_rounds() -> dict[str, int]:
    """Last driver-green round per query name — the max N over the
    repo-root CORRECTNESS_r{N}.json artifacts where all three match
    flags are true — considering only rounds strictly before
    _current_round(). The strict bound keeps the derivation consistent
    with the round source: under an SPARK_GRAFT_ROUND pin (VERDICT
    r12 #7) a stray later artifact can shift neither the round nor the
    staleness ranking. Rows never driver-green map to 0 (stalest)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    cur = _current_round()
    out: dict[str, int] = {}
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m or int(m.group(1)) >= cur:
            continue
        n = int(m.group(1))
        try:
            with open(f) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for q, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and n > out.get(q, 0)
            ):
                out[q] = n
    return out


def _rotate(order: list[str]) -> list[str]:
    """Swap _ROTATION_K stable tail rows into the driver's window
    (and _ROTATION_K _SWAP_POOL rows out). Promotion is stalest-first
    (VERDICT r14 #1): the K pool rows whose last driver-green round is
    oldest (never-green first) enter the window, so a staleness
    backlog drains at K rows/round instead of waiting on round-robin
    phase — once a row re-earns green its artifact timestamps it fresh
    and the next-stalest cohort promotes. A row that keeps FAILING
    keeps re-promoting (its last-green never advances) — deliberate:
    a wrong answer must stay in the driver's artifact until fixed,
    not rotate back into the tail's shadow; the cost is one pinned
    slot per failing row, and a cohort of >= K simultaneous failures
    (which would stall rotation entirely) is a red-alert round by
    itself. Demotion stays round-robin over _SWAP_POOL. Pure
    reordering: the set of declared queries and their definitions
    never change."""
    window, tail = order[:_WINDOW], order[_WINDOW:]
    _ROTATION_INFO["window_static"] = list(window)
    pool = [n for n in tail if n in ORACLES]
    _ROTATION_INFO["pool_size"] = len(pool)
    demotable = [n for n in _SWAP_POOL if n in window]
    if not pool or len(demotable) < _ROTATION_K:
        return order
    last_green = _last_green_rounds()
    ranked = sorted(
        range(len(pool)), key=lambda i: (last_green.get(pool[i], 0), i)
    )
    promoted = [pool[i] for i in ranked[:_ROTATION_K]]
    base = (_current_round() - 6) * _ROTATION_K  # rotation started round 6
    demoted = [demotable[(base + i) % len(demotable)] for i in range(_ROTATION_K)]
    _ROTATION_INFO["demoted"] = list(demoted)
    _ROTATION_INFO["promoted"] = list(promoted)
    _ROTATION_INFO["promoted_last_green"] = {
        n: last_green.get(n, 0) for n in promoted
    }
    new_window = [n for n in window if n not in demoted] + promoted
    new_tail = demoted + [n for n in tail if n not in promoted]
    return new_window + new_tail


def _reorder() -> None:
    order = [n for n in _DRIVER_FIRST if n in QUERIES]
    order += [n for n in QUERIES if n not in _DRIVER_FIRST and n not in _DRIVER_LAST]
    order += [n for n in _DRIVER_LAST if n in QUERIES]
    assert len(order) == len(QUERIES)
    order = _rotate(order)
    assert sorted(order) == sorted(QUERIES)
    for mapping in (QUERIES, ORACLES):
        snap = dict(mapping)
        mapping.clear()
        mapping.update({n: snap[n] for n in order if n in snap})


_reorder()

__all__ = ["ORACLES", "QUERIES", "load", "query"]
