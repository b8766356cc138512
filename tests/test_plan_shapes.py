"""Physical-plan regression guard: headline queries must not grow
shuffles.

Every `Exchange hashpartitioning` is a full repartition of its input —
the unit of cost that dominates at 100 TB. The caps below are the
audited counts from PLANS.md; a refactor that adds an exchange beyond
its cap is a scale regression even if correctness stays green, so it
fails here first. Counts are taken from the pre-execution physical plan
(AQE's runtime coalescing only merges partitions within an exchange; it
never adds one).
"""

from __future__ import annotations

import pytest

from traffic_data_pipeline_spark.plans.queries import QUERIES

# query -> (max hash exchanges, min broadcast exchanges)
CAPS = {
    "sensor_15min_agg": (2, 1),    # agg + window; config broadcast
    "nation_revenue": (1, 3),      # fact moves once; 3-hop dim chain broadcast
    "top_supplier": (2, 1),        # revenue agg + scalar-max broadcast
    "events_sessionize": (1, 0),   # one user shuffle into session_window
    "events_zscore_anomaly": (2, 1),  # stats agg + final rollup; stats broadcast
    "doc_shard_assign": (2, 0),    # spread repartition absent; agg (+AQE read)
    "doc_pack_sequences": (2, 0),  # pack-shard window + nothing else
    "doc_oov_rate": (3, 1),        # spread + token agg + doc agg; vocab broadcast
    "calendar_spine": (1, 0),      # spine generation + one window/agg at most
    "doc_bm25_search": (0, 1),     # tf/stats narrow; one-row stats broadcast
    "shipping_priority": (1, 1),   # orderkey agg only; segment dim broadcast
    "late_shipments": (2, 0),      # orderkey join + priority agg (AQE may bc)
    "lineitem_quantiles": (1, 0),  # one shared-state percentile agg
    "events_rolling_24h": (1, 0),  # one user_id window carries both aggs
    "doc_sample_quota": (1, 0),    # one source window
    "forecast_revenue": (1, 0),    # scan-filter-agg to one row
    "corpus_report": (1, 0),       # one pass, stack unpivot
    "doc_quality_tiers": (2, 1),   # threshold agg broadcast + tier agg
    "doc_batch_by_length": (1, 0), # one bucket exchange, two windows
    "large_volume_customers": (3, 1),  # qty agg + joins; big side broadcast
    "events_type_hour_cube": (1, 0),   # Expand + ONE grouping-set aggregate
    "doc_lm_score": (6, 1),        # model aggs + scoring join over cached
                                   # streams; vocab scalar always broadcast
    "dedup_minhash_lsh_capped": (4, 1),  # count agg + pair join + distinct
                                         # over the cached index; hot-key
                                         # anti-join always broadcast
    "dedup_lsh_band_overflow": (3, 1),   # band count + hot-member doc agg;
                                         # hot list always broadcast
    "dedup_substring_spans": (4, 0),     # span distinct + key freq agg +
                                         # per-doc agg + doc join-back
    "dedup_semantic": (4, 1),            # assign argmax + cluster self-join
                                         # + dup agg + the sqrt(N)-row
                                         # centroid TakeOrdered (V-row side
                                         # frames, never the corpus);
                                         # centroids broadcast
    "doc_tfidf_knn": (1, 2),             # postings move once; query postings
                                         # and query norms broadcast
    "doc_ngram_containment": (4, 0),     # spread repartition feeds the
                                         # regex shingle projection (one-
                                         # file corpus = one task otherwise
                                         # — round-10, same budget shape as
                                         # doc_cdc_chunks) +
                                         # df window (8-byte hash keys) +
                                         # doc-rank window + candidate
                                         # distinct; the freq table is NOT
                                         # broadcast — word-shingle universe
                                         # is corpus-sized
    "events_pagerank": (1, 0),           # final read over the cached round-3
                                         # rank vector; per-round cost is one
                                         # groupBy(dst) at materialize time
    "doc_cdc_chunks": (4, 0),            # spread repartition feeds the
                                         # rolling-hash projection (one-file
                                         # corpus = one task otherwise); fp
                                         # distinct + freq agg + doc agg +
                                         # join-back share the budget
    "doc_priority_sample": (0, 1),       # priorities are a projection,
                                         # top-(k+1) is TakeOrdered, tau is
                                         # a broadcast one-row scalar
    "doc_collocations": (1, 3),          # live plan reads the two cached
                                         # count tables; unigrams + totals
                                         # broadcast, top-k TakeOrdered
    "events_heavy_hitters": (2, 2),      # candidate distinct + recount agg;
                                         # candidate list and the N scalar
                                         # broadcast — no full-cardinality
                                         # count table is ever built
    "doc_decontaminate_bloom": (4, 1),   # spread + gram dedup + per-gram
                                         # probe agg + doc agg; the BITSET
                                         # words always broadcast — no gram
                                         # strings ever ship
    "doc_lexical_diversity": (2, 0),     # one (doc, token) count shuffle;
                                         # the doc re-agg rides the prefix
    "corpus_kl_drift": (3, 2),           # live plan over the cached count
                                         # stream: token marginal + co-keyed
                                         # join; totals broadcast
    "sensor_interpolate": (2, 0),        # ONE sensor exchange carries both
                                         # carry windows (fwd + reverse sort)
    "events_mad_anomaly": (2, 2),        # two percentile passes to per-type
                                         # rows; both broadcast back — the
                                         # fact never shuffles
    "events_concurrency": (2, 0),        # session window + per-hour sweep;
                                         # no global ORDER BY partition
    "dedup_cluster_density": (2, 3),     # live plan over the cached oriented
                                         # edge list; degree table + wedge
                                         # build side + closing semi-join
                                         # all broadcast
    "brand_small_qty_revenue": (2, 2),   # per-part agg co-keyed with the
                                         # fact join; part dim + (AQE) agg
                                         # side broadcast
    "idle_rich_customers": (1, 2),       # scalar balance row + anti-join
                                         # build side broadcast; customer
                                         # scan moves once
    "source_overlap_matrix": (1, 2),     # cached pair stream + two source
                                         # lookups broadcast; one matrix agg
    "basket_part_pairs": (3, 3),         # item dedup + pair agg + top-k over
                                         # survivors; supports + T broadcast
    "source_keywords_chi2": (5, 3),      # presence dedup + cached count
                                         # stream + token marginal join +
                                         # source rank window; totals
                                         # broadcast
    "label_centroid_similarity": (5, 4), # component-sum agg + centroid-matrix
                                         # aggs only; every join side
                                         # broadcast-tiny
    "sensor_cusum_shift": (2, 0),        # ONE sensor exchange carries the
                                         # cumsum, totals, and the argmax
                                         # rank; zero joins
    "events_label_prop": (1, 1),         # final read over the cached round-3
                                         # label vector; per-round cost is
                                         # one co-keyed vote agg with the
                                         # V-row vector broadcast
    "events_ab_ttest": (2, 1),           # one moment aggregate to TWO rows;
                                         # the fact never shuffles
    "orders_seasonality": (2, 1),        # one aggregate to <=12 rows + a
                                         # one-row broadcast scalar
    "csv_ingest_quarantine": (1, 0),     # splittable CSV scan + one per-type
                                         # aggregate; quarantine is a
                                         # projection, not a pass
    "part_min_cost_supplier": (2, 3),    # offers agg + per-part window; all
                                         # three dims broadcast — the
                                         # correlated MIN never joins
    "nation_brand_value_share": (2, 3),  # fact agg + tiny post-agg window;
                                         # supplier/nation/part broadcast
    "waiting_orders_suppliers": (3, 2),  # per-(order,supp) agg + ONE order
                                         # window for all three quantifiers
                                         # + status join; supplier broadcast
    "excess_supply_suppliers": (3, 2),   # part-filtered fact agg + per-part
                                         # window + supplier rollup; name-
                                         # filtered part list broadcast
    "dq_constraint_report": (2, 1),      # one analyzer agg per base table
                                         # (count-distinct expand) + the
                                         # broadcast anti FK probe
    "sensor_volume_trend": (2, 0),       # (sensor, day) agg + sensor moment
                                         # agg; regression math is
                                         # projection-only
    "doc_phrase_search": (3, 0),         # spread + two co-keyed posting
                                         # joins (AQE broadcasts them at
                                         # fixture scale); the corpus
                                         # explodes once, codegen after
    "session_surge_overlap": (4, 2),     # session window + hourly agg +
                                         # island window + final island agg;
                                         # threshold scalar and island bins
                                         # broadcast — the bin equi-join
                                         # never nested-loops, and the
                                         # first-overlap-bucket rule makes
                                         # matches unique with NO dedup
                                         # exchange
    "media_phash_dedup": (2, 1),         # live plan over the materialized
                                         # fingerprint frame: candidate
                                         # distinct (+ final agg) with one
                                         # side broadcast at fixture scale
    "dedup_minhash_calibration": (1, 2), # cached pair stream + cached sets
                                         # joined twice (broadcast at
                                         # fixture scale) + one bucket agg;
                                         # nothing re-shingles
    "corridor_weighted_median": (3, 0),  # node-fact + rollup exchanges,
                                         # then ONE corridor partition
                                         # carrying both windows and the
                                         # final min
    "price_equidepth_hist": (2, 1),      # boundary-pass spread + recount
                                         # agg; the 7-cut one-row frame
                                         # broadcast into the rescan
    "corpus_prep_pipeline": (12, 5),     # the whole funnel: keep-best
                                         # window + token-stats agg +
                                         # gram dedup/probe + four stage
                                         # counts; survivor joins ride
                                         # broadcast-small frames
    "embedding_ann_recall": (3, 3),      # brute truth pass (query side
                                         # broadcast) + code joins + per-
                                         # query agg; codes broadcast at
                                         # fixture scale
    "order_priority_check": (1, 1),      # semi-join with residual date
                                         # condition + priority agg;
                                         # quarter side broadcast
    "customer_order_histogram": (2, 1),  # per-customer count rides the
                                         # join key; histogram re-agg is
                                         # distinct-count-sized
    "promo_revenue_share": (0, 1),       # ONE pass: conditional + total
                                         # decimal sums to a single row;
                                         # part dim broadcast
    "discounted_special_revenue": (0, 1),  # broadcast part join + the
                                           # disjunctive band filter +
                                           # one aggregate row
    "nation_pair_trade": (1, 5),         # orders co-keyed; all five dims
                                         # broadcast, pair predicate on
                                         # the joined row
    "nation_market_share": (1, 7),       # seven-way star fully broadcast;
                                         # conditional + total sums ride
                                         # one pass
    "nation_year_part_profit": (1, 4),   # LIKE-filtered part broadcast
                                         # prunes first; one orders join
    "returned_item_customers": (1, 3),   # one revenue agg + TakeOrdered
                                         # top-20; dims broadcast
    "part_supplier_diversity": (2, 2),   # anti blacklist + part broadcast;
                                         # distinct-count expand on the
                                         # (brand, type) grouping
    "order_fulfillment_rate": (2, 1),    # for-all as a per-order MAX
                                         # aggregate + priority rollup;
                                         # never an anti-join per order
    "lang_token_fertility": (1, 1),      # token counters are projections;
                                         # one (lang) aggregate
    # --- round-5 promotions (plans/staged_ops.py; caps audited at staging
    # --- time in round 4, folded here per VERDICT r4 ask #1) ---
    "doc_hybrid_search_rrf": (2, 1),      # one narrow scoring pass, stats
                                          # broadcast, two TakeOrdered
                                          # top-20s, fusion join on 20-row
                                          # frames (0 hash exchanges under
                                          # AQE at the smoke fixture; cap
                                          # leaves room for the sort-merge
                                          # full-outer fallback)
    "split_cluster_assign": (2, 0),       # final read over the converged
                                          # label frame (+ isolated-doc
                                          # rejoin); the iterative rounds
                                          # are paid at materialize time
                                          # on the shared pair stream
    "dedup_sorted_neighborhood": (4, 0),  # spread + block-rank window +
                                          # (blk, rank) equi self-join;
                                          # verify is in-row array math
    "events_decayed_engagement": (1, 1),  # ONE per-user aggregate; the
                                          # reference instant always a
                                          # broadcast scalar
    "bpe_merge_step": (3, 0),            # token spread + word agg + pair agg;
                                         # the top-k window sorts the
                                         # alphabet-pair table only
    "doc_boilerplate_coverage": (4, 0),  # spread + gram-df agg + covered
                                         # distinct + doc agg; the freq
                                         # semi-join is CO-KEYED, not
                                         # broadcast-required (gram universe
                                         # is corpus-sized at scale)
    "embedding_pca_step": (2, 0),        # spread + ONE dim-row aggregate;
                                         # A x0 is a projection
    "embedding_semantic_decontaminate": (2, 1),  # spread + flagged-argmax
                                         # window; bench side always
                                         # broadcast
    "lineitem_zorder_layout": (1, 1),    # one 16-group agg; the maxima
                                         # scalar always broadcast
    "doc_dsir_importance": (3, 2),       # unspread bucket-count lineage +
                                         # ONE spread scoring lineage; the
                                         # 4096-row weight table and the
                                         # totals scalar ALWAYS broadcast
                                         # (fixed size at any corpus scale)
    "doc_winnowing_fingerprint": (3, 0), # spread + fp inverted-index agg +
                                         # pair agg; pairs explode IN-ROW
                                         # from capped doc lists — no
                                         # self-join exists
    "doc_ngram_novelty": (4, 0),         # spread (x2 pre-AQE: tot + first
                                         # lineages share the stage at
                                         # runtime) + gram-min agg + fd
                                         # regroup; per-doc frames ride
                                         # doc_id partitioning
    "lang_temperature_weights": (2, 1),  # ONE per-language aggregate; the
                                         # normalizer scalar always
                                         # broadcast
    "events_rollup_merge": (2, 1),       # partial agg (type, hour, epoch
                                         # bucket) + merge agg; watermark
                                         # scalar always broadcast
    "doc_paragraph_dedup": (4, 0),       # md5 first-occurrence window +
                                         # doc_id reassembly agg (measured
                                         # 2 + a broadcast base join that
                                         # AQE flips to shuffle at scale —
                                         # cap leaves room for the flip)
    "doc_c4_line_filter": (0, 0),        # pure in-row map — zero shuffles
    "doc_gopher_quality": (0, 0),        # pure in-row map — zero shuffles
    "shard_compaction_plan": (2, 0),     # running-sum window on source;
                                         # the manifest agg rides the same
                                         # partitioning (measured 1)
    "embedding_jl_projection": (0, 0),   # pure in-row fold — zero shuffles
    "events_heavy_hitters_cms": (3, 1),  # key-count agg + 256-cell sketch
                                         # agg + probe agg; the sketch is
                                         # ALWAYS broadcast (fixed size)
    "sensor_theilsen_trend": (2, 0),     # (sensor, day) agg + (sensor)
                                         # gather; pair slopes + median
                                         # explode IN-ROW — no self-join
    "embedding_pq_adc": (0, 0),          # round-11: ONE mapInArrow pass
                                         # against the driver-collected
                                         # codebook + TakeOrdered top-k —
                                         # zero exchanges (was 5 hash + 3
                                         # broadcast for the explode/join/
                                         # window pipeline)
    "embedding_margin_align": (4, 1),    # ONE pair stream (bench side
                                         # broadcast) + two rank windows
                                         # the k-NN window-sums ride +
                                         # final rank-1 filter
    "events_key_skew_report": (2, 0),    # (type, key) agg + shared
                                         # (type) window exchange; report
                                         # is #types rows
    "streaming_cms_topk": (3, 1),        # PROBE plan (the stream runs at
                                         # build time): key-count agg +
                                         # est agg + rank window; landed
                                         # sketch ALWAYS broadcast
                                         # (windows x 256 rows); measured
                                         # (2, 1) — cap leaves room for a
                                         # non-riding rank exchange
    "corpus_snapshot_diff": (3, 0),      # one co-keyed FULL OUTER join
                                         # (never broadcastable) + one
                                         # map-side-combined group count;
                                         # pre-bucketed snapshots make it
                                         # shuffle-free at scale
    "dedup_graph_kcore": (2, 0),         # final degree aggregate over the
                                         # converged checkpointed edge
                                         # frame; peel rounds are paid at
                                         # build time on the shared pair
                                         # stream (measured 1)
    "mixture_budget_allocate": (3, 1),   # ONE per-lang aggregate; the
                                         # rank/sum windows run on the
                                         # #langs-row frame only;
                                         # normalizer always broadcast
                                         # (measured 2)
    "doc_kanonymity_report": (2, 0),     # two nested map-side-combined
                                         # aggregates, no joins/windows
    "doc_perplexity_buckets": (8, 1),    # doc_lm_score's audited plan
                                         # (cap 6) + lang join + cut agg;
                                         # the cutpoint frame (#langs
                                         # rows) ALWAYS broadcast —
                                         # never a per-lang ntile window
                                         # (measured 7)
    "events_late_arrival_audit": (3, 1), # per-shard running max + the
                                         # #shards-row prefix (the ONLY
                                         # unpartitioned window, over the
                                         # tiny shard frame, broadcast
                                         # back) + hour agg — two-pass
                                         # distributed cummax, no global
                                         # data sort
    # --- round-6 promotions (moved here from tests/test_staged_ops_r6.py
    # at promotion time, per the documented path) ---
    "events_attribution": (3, 0),        # purchase x click user-range
                                         # join + per-purchase agg (AQE
                                         # broadcasts a side at fixture
                                         # scale; at corpus scale both
                                         # sides co-key on user)
    "events_markov_transitions": (5, 3), # ONE user window + (src,dst)
                                         # agg + the cached K-row
                                         # alphabet build; grid/total/K
                                         # frames always broadcast
    "events_ab_proportions": (1, 0),     # user-conversion agg folded to
                                         # one four-counter row
    "events_median_bootstrap_ci": (4, 1),  # spread repartition (one-file
                                         # corpus = one task otherwise,
                                         # round-10) + in-row B-spread into a
                                         # (type, replica) percentile agg
                                         # + type re-agg; CI frame joins
                                         # broadcast
    "events_spend_concentration": (2, 0),  # (type,user) spend agg + ONE
                                         # type exchange carrying both
                                         # rank windows and the fold
    "embedding_whitening_stats": (3, 3), # in-row triangle -> ONE 2080-row
                                         # gram agg + the 64-row mean agg;
                                         # mean/N frames always broadcast
    "embedding_dim_truncation_recall": (9, 2),  # two brute-force passes
                                         # (spread repartition + per-query
                                         # rank each) + recall join/agg;
                                         # query sides broadcast
    "doc_lm_kneser_ney": (3, 4),         # bigram/prefix/continuation
                                         # count aggs over the cached
                                         # stream; scalar + model frames
                                         # broadcast at fixture scale
    "events_time_zonemap_audit": (2, 1), # ONE (day) footer aggregate +
                                         # the #files probe scalar always
                                         # broadcast
    "embedding_silhouette_by_label": (1, 0),  # round-11: ONE mapInArrow
                                         # pass against the collected
                                         # centroid matrix + the per-label
                                         # mean aggregate (was 4 hash with
                                         # the N x d x |labels| explode/
                                         # broadcast-join/distance-agg)
    "embedding_ood_score": (3, 2),       # (pos) moment agg + per-vector
                                         # rescore agg + TakeOrdered
                                         # top-k; moment frame ALWAYS
                                         # broadcast (measured 2)
    "events_conversion_latency": (2, 1), # user-co-keyed join + per-
                                         # purchase max + ONE percentile
                                         # row (measured 1)
    "user_churn_hazard": (3, 1),         # per-user lifetime agg +
                                         # histogram agg + the <=31-row
                                         # reverse cumsum; horizon scalar
                                         # broadcast
    "streaming_session_funnel": (0, 0),  # live plan is the stateless
                                         # post-landing projection; the
                                         # session shuffle is paid inside
                                         # the micro-batch run
    "vocab_zipf_alpha": (1, 1),          # ONE token-count aggregate
                                         # (the vocab_build shape) folded
                                         # to a single row; vocab scalar
                                         # broadcast
    "corpus_heaps_law": (1, 1),          # live plan reads the cached
                                         # 10-point log-log frame; the
                                         # first-occurrence and count
                                         # builds are paid at materialize
                                         # time (vocab_build shapes)
    "lang_id_confusion": (6, 1),         # the predictor's per-doc agg +
                                         # label join + (true,pred) count
                                         # + |langs|-row total broadcast
                                         # (measured 5)
    "orders_backlog_aging": (1, 1),      # pushed status filter + ONE
                                         # four-row rollup; horizon
                                         # scalar broadcast
    "events_burst_flags": (1, 0),        # ONE user exchange carries the
                                         # sliding-count frame, the max
                                         # window, and the final fold
    "events_did_estimate": (2, 1),       # ONE (cohort, period) agg to 4
                                         # rows + the 4-row pivot
                                         # broadcast back
    "corpus_entropy_rate": (3, 4),       # unigram + bigram count aggs
                                         # (cached) + prefix re-agg;
                                         # scalars broadcast (measured 1
                                         # live over the caches)
    "corpus_doremi_step": (15, 2),       # doc_lm_score's audited plan
                                         # (cap 6) + source/corpus aggs +
                                         # the #sources-row update; corpus
                                         # scalar and normalizer always
                                         # broadcast
    "embedding_margin_align_ann": (8, 2),  # two plane-dot aggs + two
                                         # band-code aggs over the
                                         # cached sides + band-code
                                         # equi-join + cand distinct +
                                         # vector join-backs + the
                                         # shared rank/normalizer
                                         # windows; the <=96-row
                                         # live-planes grid ALWAYS
                                         # broadcast into both code
                                         # builds (measured (7, 6) —
                                         # AQE broadcasts the fixture
                                         # sides too)
    # --- round-7 promotions (moved here from tests/test_staged_ops_r7.py
    # at promotion time, per the documented path) ---
    "lang_fertility_drift": (3, 1),      # ONE (snap, lang) agg over the
                                         # in-row counts + #langs self-join
    "dedup_exact_substring_spans": (4, 1),  # gram df agg + dup semi-join
                                         # + ONE doc window carrying both
                                         # island stages
    "corpus_stratified_sample": (6, 3),  # strata agg + quota arithmetic
                                         # (broadcast back) + ONE
                                         # per-stratum rank window
    "dedup_cross_source_matrix": (3, 2), # rides the cached pair stream;
                                         # two source join-backs + ONE
                                         # (src, src) count; total scalar
                                         # broadcast
    "embedding_ivf_balance_report": (1, 1),  # live plan reads the cached
                                         # K-row counts (assignment argmax
                                         # + centroid broadcast paid at
                                         # cache build — round-10: the
                                         # Arrow dot node defeats
                                         # ReusedExchange, so the counts
                                         # frame materializes); total
                                         # scalar broadcast stays live
    "events_value_benford": (8, 1),      # (type, digit) count + type
                                         # totals + chi regroup; tot/chi
                                         # frames broadcast
    "events_retention_cohorts": (6, 2),  # (user, day) distinct + cohort
                                         # min + co-keyed return join;
                                         # the 4-row offset frame ALWAYS
                                         # broadcast
    "doc_repetition_profile": (6, 0),    # every aggregate/window keys by
                                         # doc_id — ONE spread exchange
                                         # fans into the gram counts,
                                         # run islands, and join-backs
    "events_markov_removal_effect": (2, 1),  # live plan is the K-row
                                         # result frame + the broadcast
                                         # base scalar; the 40 value
                                         # iterations run on the driver
                                         # over the collected (K+2)^2
                                         # matrix (round-10, the CC/
                                         # k-means fixpoint probe class)
    "dedup_threshold_sweep": (5, 3),     # pair stream x 5-row threshold
                                         # broadcast + (thr, doc) canon
                                         # agg + survivor regroup
    "corpus_lang_source_coverage": (7, 3),  # ONE (lang, source) count;
                                         # marginals re-aggregate the
                                         # tiny cell frame; scalars
                                         # broadcast
    "streaming_minhash_index": (1, 0),   # live plan reads the landed
                                         # pair parquet through ONE
                                         # distinct (the exactly-once
                                         # crash-replay dedup); the
                                         # per-batch index joins run
                                         # inside the micro-batches
    "corpus_length_filter_curve": (2, 2),  # ONE percentile agg to a
                                         # 10-row broadcast + ONE
                                         # (decile) count over the fan
    "embedding_centroid_drift": (8, 2),  # (snap,label,pos) decimal agg
                                         # + centroid-frame joins; the
                                         # tiny n/centroid frames
                                         # broadcast at fixture scale
    "doc_language_purity": (2, 0),       # ONE (doc, chunk) vote agg +
                                         # the doc-keyed majority
                                         # window/fold riding it
    "events_interarrival_burstiness": (2, 0),  # ONE type ordering window
                                         # + ONE 128-bit moment agg
    "doc_readability": (3, 1),          # TWO (lang, source) aggs over the
                                         # same in-row counts + a tiny
                                         # group-frame broadcast join
    "doc_nb_langid": (11, 5),            # train/eval pipeline: the wide
                                         # exchanges are the (lang,gram) /
                                         # (doc,gram) counts plus the
                                         # round-10 spread repartition
                                         # (one-file corpus = one task for
                                         # both gram explodes otherwise);
                                         # model, vocab, and lang frames
                                         # all broadcast
    "embedding_ivfpq_query": (0, 0),     # round-11: ONE mapInArrow pass
                                         # (coarse-assign + probe-prune +
                                         # code + ADC against the driver-
                                         # collected codebook) +
                                         # TakeOrdered — zero exchanges
                                         # (was 4 hash + 3 broadcast over
                                         # three checkpointed frames)
    "corpus_token_psi_drift": (3, 1),    # live plan reads the
                                         # checkpointed token-count /
                                         # bucket frames; anchors +
                                         # per-lang totals broadcast
    "events_ewma_forecast": (3, 2),      # ONE (type, day) count; span
                                         # scalar + filled spine
                                         # broadcast; final |types| fold
    "part_price_elasticity": (2, 1),     # part broadcast into the scan
                                         # + ONE five-moment fold (round-
                                         # 11: over Arrow unit partials)
    "supplier_share_hhi": (2, 2),        # live plan reads the
                                         # checkpointed (type, supp)
                                         # cents frame; totals broadcast
    "events_lead_lag_correlation": (2, 1),  # ONE (type, day) count
                                         # (checkpointed); the lag grid +
                                         # spine self-join broadcast
    "embedding_mmr_topk": (1, 0),        # live plan reads the final
                                         # checkpointed selection; the
                                         # greedy rounds join
                                         # pool-constant frames
    "events_conformal_volume": (8, 4),   # ONE (type, day) count
                                         # (checkpointed, read by all
                                         # three splits); pred/qhat/ntr
                                         # frames broadcast into the
                                         # calendar-bounded folds
    "streaming_ewma_level": (0, 0),      # live plan reads the published
                                         # levels parquet; per-batch
                                         # folds run inside foreachBatch
    "bpe_train_merges": (0, 0),          # live plan reads the final
                                         # checkpointed merge rows; each
                                         # round's vocab-frame pair agg
                                         # is paid at build
    "events_weekday_decomposition": (6, 4),  # ONE (type, day) count
                                         # (checkpointed, three
                                         # consumers); mean/variance
                                         # frames broadcast
    "events_ewma_control_chart": (3, 3),  # ONE (type, day) count
                                         # (checkpointed); the prefix
                                         # triangle self-join and stats
                                         # broadcast over the spine
    "embedding_mmr_topk_ann": (1, 0),    # live plan reads the final
                                         # checkpointed selection; the
                                         # bucket-pruned relevance scan
                                         # is paid at build
    # --- round-8 promotions (moved here from tests/test_staged_ops_r8.py
    # at promotion time, per the documented path) ---
    "streaming_conformal_monitor": (0, 0),  # live plan reads the
                                         # published intervals parquet;
                                         # per-batch folds run inside
                                         # foreachBatch
    "streaming_ivf_index": (0, 0),       # live plan reads the published
                                         # balance report; per-batch
                                         # assignment joins run inside
                                         # the micro-batches
    "config_scd2_compaction_stats": (4, 1),  # ONE (day, kind) count over
                                         # the cached changelog + ONE
                                         # scalar dimension fold
                                         # broadcast back
    "orders_rfm_segmentation": (6, 2),   # ONE (custkey) fact fold; the
                                         # three SHARD ranks cache their
                                         # range exchanges — live: the
                                         # last shard window + offset
                                         # fold + segment regroup;
                                         # offsets/n broadcast
    "lineitem_basket_lift": (4, 3),      # ONE distinct (order, type)
                                         # projection (checkpointed);
                                         # the co-keyed pair self-join +
                                         # (a, b) count; tc/n broadcast
    "supplier_lead_time_percentiles": (3, 0),  # orders x fact co-keyed
                                         # join + ONE supplier rank
                                         # window + ONE supplier fold
    "events_user_tail_index": (4, 3),    # ONE (type, user) count + ONE
                                         # type-keyed rank window
                                         # (checkpointed top-k); k/cut/
                                         # logsum frames broadcast
    "corpus_snapshot_novelty_rate": (3, 1),  # rides the cached pair
                                         # stream; ONE distinct over the
                                         # new-dup ids (broadcast back)
                                         # + ONE (source) fold
    "doc_quality_rule_ablation": (1, 0),  # ONE scalar aggregate over the
                                         # in-row rule projection + the
                                         # 5-row unpivot
    "events_changepoint_daily": (6, 2),  # ONE (type, day) count
                                         # (checkpointed); prefix/argmax
                                         # windows on the broadcast-fed
                                         # calendar spine
    "embedding_ann_recall_curve": (6, 2),  # live plan reads the
                                         # checkpointed grid top-k; base
                                         # + n_base frames broadcast
                                         # (assignment/probe broadcasts
                                         # are paid at build)
    "embedding_pq_distortion_report": (0, 1),  # live plan reads the
                                         # checkpointed M-row fold; the
                                         # corpus x broadcast-codebook
                                         # assignment + argmin window
                                         # are paid at build; grand
                                         # total broadcast
    "part_cross_price_elasticity": (3, 0),  # ONE (type, day) fact fold
                                         # (checkpointed; part broadcast
                                         # paid at build); the day-keyed
                                         # pair self-join on the tiny
                                         # series + ONE pair-moment agg
    "streaming_pq_codes": (1, 0),        # live plan reads the landed
                                         # code parquet through ONE
                                         # distinct (the exactly-once
                                         # crash-replay dedup)
    "events_user_kanonymity": (2, 1),    # ONE (type, hour) distinct-user
                                         # cell fold (checkpointed) + the
                                         # 4-row bucket fold; cell total
                                         # broadcast
    "dedup_impact_by_lang": (3, 1),      # rides the cached pair stream;
                                         # ONE removed-id distinct
                                         # (broadcast back) + ONE (lang)
                                         # fold
    # --- round-9 promotions (moved here from tests/test_staged_ops_r9.py
    # at promotion time, per the documented path) ---
    "events_user_ldiversity": (2, 1),    # ONE (type, hour) distinct-band
                                         # cell fold (checkpointed) + the
                                         # 4-row bucket fold; cell total
                                         # broadcast
    "events_user_tcloseness": (2, 1),    # live plan reads the
                                         # checkpointed per-cell TVD
                                         # frame: the 4-row bucket fold
                                         # + cell-total broadcast (the
                                         # (type, hour, band) count, the
                                         # band-alphabet fan, and the
                                         # corpus-band/n broadcasts are
                                         # paid at build)
    "dedup_impact_by_lang_cc": (4, 0),   # CC labels come off the
                                         # checkpointed fixpoint orbit;
                                         # live: the doc_id-keyed label
                                         # join + ONE (lang) fold
    "dedup_impact_by_source": (3, 1),    # rides the cached pair stream;
                                         # ONE removed-id distinct
                                         # (broadcast back) + ONE
                                         # (source) fold
    "streaming_changepoint_monitor": (0, 0),  # live plan reads the
                                         # published report parquet;
                                         # per-batch folds run inside
                                         # foreachBatch
    "streaming_tailindex_monitor": (0, 0),  # live plan reads the
                                         # published report parquet;
                                         # per-batch folds run inside
                                         # foreachBatch
    "corpus_epoch_plan": (2, 1),         # ONE map-side-combined
                                         # per-source fold (in-row token
                                         # counts, no explode); the
                                         # 1-row normalizer broadcast
    # --- round-10 promotions (moved here from tests/test_staged_ops_r10.py
    # at promotion time, per the documented path) ---
    "events_user_deltapresence": (2, 1),  # live plan reads the
                                         # checkpointed (pu, pr) cell
                                         # frame: the 4-row bucket fold
                                         # + cell-total broadcast (the
                                         # Expand multi-distinct cell
                                         # fold is paid at build)
    "dedup_impact_by_lang_source": (3, 1),  # rides the cached pair
                                         # stream; ONE removed-id
                                         # distinct (broadcast back) +
                                         # ONE (lang, source) fold
    "streaming_rfm_monitor": (0, 0),     # live plan reads the published
                                         # cube parquet; per-batch folds
                                         # + the shared shard-rank cube
                                         # run inside foreachBatch
    "events_qi_generalization_ladder": (1, 0),  # live plan reads the
                                         # checkpointed (gran, type,
                                         # cell) k frame: the 3-row
                                         # rung fold (the in-row ladder
                                         # explode + Expand distinct
                                         # fold are paid at build)
    "streaming_deltapresence_monitor": (0, 0),  # live plan reads the
                                         # published cube parquet;
                                         # per-batch distincts + the
                                         # shared cell fold run inside
                                         # foreachBatch
}


def _count_live(df) -> tuple[int, int]:
    """(hash exchanges, broadcast exchanges) in the LIVE plan only.

    Counted by walking the physical-plan tree instead of parsing its
    string: an InMemoryTableScan prints the plan that BUILT the cache
    nested under it (as innerChildren — under AQE even with its own
    `== Final Plan ==` blocks, at indent depths that defeat text
    cutting), but in the tree those builds are not children — the cached
    scan is a leaf, so traversal naturally counts only exchanges that
    re-execute. AdaptiveSparkPlanExec is also leaf-shaped; its
    current (pre-execution) plan is exposed via executedPlan()."""
    def walk(node) -> tuple[int, int]:
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            return walk(node.executedPlan())
        exch = bcast = 0
        if name == "ShuffleExchangeExec" and \
                "hashpartitioning" in str(node.outputPartitioning()):
            exch = 1
        elif name == "BroadcastExchangeExec":
            bcast = 1
        ch = node.children()
        for i in range(ch.size()):
            e, b = walk(ch.apply(i))
            exch += e
            bcast += b
        return exch, bcast

    return walk(df._jdf.queryExecution().executedPlan())


@pytest.mark.parametrize("name", sorted(CAPS))
def test_exchange_budget(spark, sf_dir, name):
    max_exch, min_bcast = CAPS[name]
    exch, bcast = _count_live(QUERIES[name](spark, sf_dir))
    assert exch <= max_exch, (
        f"{name}: {exch} hash exchanges (cap {max_exch}) — a shuffle was "
        f"added; re-audit against PLANS.md before raising the cap")
    assert bcast >= min_bcast, (
        f"{name}: {bcast} broadcast exchanges (expected >= {min_bcast}) — "
        f"a dimension stopped broadcasting")


# ---------------------------------------------------------------------------
# round-11 (VERDICT r10 #5): Arrow-kernel duplication guard. A Python
# node (MapInArrow) inside a self-joined subtree defeats ReusedExchange's
# subtree dedup, silently recomputing the kernel's WHOLE upstream — this
# bit twice in round 10 (dedup_semantic, embedding_ivf_balance_report)
# and was caught only by manual plan audits. The caps below are the
# audited LIVE-plan MapInArrow node counts (cached-scan builds excluded,
# same leaf rule as _count_live): two distinct kernels are fine when
# audited as 2; an UNaudited jump means a kernel started re-executing.
# ---------------------------------------------------------------------------

MAPARROW_CAPS = {
    "embedding_pq_adc": 1,               # the ADC scan kernel
    "embedding_pq_distortion_report": 0,  # kernel paid at checkpoint build
    "embedding_ivfpq_query": 1,          # the fused IVFADC kernel
    "embedding_whitening_stats": 1,      # gram_units
    "embedding_silhouette_by_label": 1,  # label_centroid_ab_frame
    "embedding_ann_lsh": 1,              # pair exact-dot over cached coded
    "embedding_ann_recall": 1,           # brute-truth pair exact-dot
    "embedding_knn": 1,                  # brute pair exact-dot
    "embedding_knn_ivf": 2,              # ivf_assign dot + rerank pair dot
    "dedup_semantic": 1,                 # pair scorer (assign cached)
    "dedup_embedding_cosine": 0,         # pairs prewarmed/cached upstream
    "dedup_embedding_cc": 0,             # same
    "embedding_kmeans_step": 1,          # ivf_assign dot
    "embedding_ivf_balance_report": 0,   # K-row counts cached (r10 fix)
    "embedding_hard_negatives": 1,       # brute pair exact-dot
    "embedding_ann_recall_curve": 0,     # grid checkpointed at build
    "streaming_pq_codes": 0,             # codes kernel paid per batch
    "part_price_elasticity": 1,          # the OLS moment-partials kernel
    "pricing_summary": 1,                # the grouped dsum-partials kernel
}


def _count_map_arrow(df) -> int:
    def walk(node) -> int:
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            return walk(node.executedPlan())
        c = 1 if "MapInArrow" in name else 0
        ch = node.children()
        for i in range(ch.size()):
            c += walk(ch.apply(i))
        return c

    return walk(df._jdf.queryExecution().executedPlan())


@pytest.mark.parametrize("name", sorted(MAPARROW_CAPS))
def test_map_arrow_budget(spark, sf_dir, name):
    got = _count_map_arrow(QUERIES[name](spark, sf_dir))
    assert got <= MAPARROW_CAPS[name], (
        f"{name}: {got} MapInArrow nodes in the live plan (audited "
        f"{MAPARROW_CAPS[name]}) — an Arrow kernel is being recomputed "
        f"(ReusedExchange defeat) or a new kernel landed unaudited")
