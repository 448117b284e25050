package graft

import org.apache.spark.sql.SparkSession

/** Writes `explain("formatted")` output for the headline queries to
  * PLANS.md — the reviewable record that each operator's physical
  * plan is the one we WANT at scale (pushdown reaching scans,
  * broadcasts where a side is small, partial aggregation before
  * exchanges, no accidental nested-loop joins). PlanShapeSpec asserts
  * the load-bearing properties; this file is the human-readable
  * audit. Regenerate: `sbt "runMain graft.PlanDump"`.
  */
object PlanDump {

  /** (query, what the plan must show and why it scales) */
  val Headline: Seq[(String, String)] = Seq(
    "q1_pricing_summary" ->
      ("Scan-adjacent filter (`PushedFilters` on l_shipdate) and a two-phase " +
        "HashAggregate: partial before the single Exchange, final after — the " +
        "canonical map-combine shape. At 100 TB only (flag, status, partial sums) " +
        "cross the wire."),
    "q3_shipping_priority" ->
      ("SQL-text form. c_mktsegment filter pushed to the customer scan; " +
        "customer (small side) broadcast into orders⨝lineitem; TakeOrdered " +
        "replaces a global sort for the LIMIT 100."),
    "q_topk_per_group" ->
      ("Bounded-heap `partial_topk_rows` runs per map task, so the Exchange " +
        "carries ≤ k rows per group instead of the whole table; a row_number " +
        "window here would sort everything on 3 reducers (one per return flag)."),
    "q_unique_first" ->
      ("`partial_min_by` + final min_by: dedup-keep-first as a hash aggregate " +
        "with map-side partials — one shuffle of one row per key, no " +
        "whole-partition window sort."),
    "dedup_minhash_lsh" ->
      ("Signature pipeline (shingle hashes → minhash → band buckets) is " +
        "map-only native expressions over the cached signature table (the " +
        "InMemoryRelation); the self-join shuffles only (id, band, bucket); " +
        "verification joins ship compact hash arrays, never text."),
    "sim_topk_ivf" ->
      ("IVF search: nearest_cells is a per-row projection on both sides (no " +
        "centroid join, no vector-keyed aggregation), the equi-join on `cell` " +
        "touches ~nProbe/nCentroids of the corpus, and the per-query top-k is " +
        "a partial max(struct) aggregate."),
    "sim_topk_ivf_idx" ->
      ("Persisted IVF assignments: the corpus side is the cell-PARTITIONED " +
        "catalog table, so the probe reads probed-cell partitions instead of " +
        "re-scanning and re-assigning every vector per panel (pruning pinned " +
        "in IvfIndexSpec with a small panel); the scoring chain past the " +
        "scan is identical to sim_topk_ivf, and floats round-trip parquet, " +
        "so the results are bit-equal by shared oracle."),
    "sim_topk_ivf_append" ->
      ("Incremental IVF: centroids trained on the 4/5 base corpus and " +
        "FROZEN; the delta's rows were assigned with those centroids and " +
        "appended into their cell partitions (O(delta) maintenance — an " +
        "assignment row is a per-vector fact, so append is exact by " +
        "construction). The probe plan is sim_topk_ivf_idx's; what grows " +
        "under freezing is recall drift, measured by sim_recall_ivf_append."),
    "q_asof_clicks" ->
      ("As-of join via union+merge: one Exchange (hash by user), one per-key " +
        "sort, a running last_value — no Join node anywhere. The naive form is " +
        "a per-row subquery; the theta-join form explodes on hot users."),
    "events_range_join" ->
      ("Interval containment as an equi-join on (user, hour-bucket) + exact " +
        "BETWEEN filter on its output (broadcast at this SF, shuffle join at " +
        "scale); without bucketing Spark plans a BroadcastNestedLoopJoin that " +
        "is quadratic per user."),
    "q_stratified_sample" ->
      ("Pure scan+Filter plan: the multiplicative-hash predicate evaluates " +
        "row-local, so sampling 100 TB is an embarrassingly parallel scan with " +
        "zero shuffle."),
    "q_cube" ->
      ("Expand (4 grouping-set projections per input row) feeding a two-phase " +
        "HashAggregate: subtotal rows are combined map-side BEFORE the single " +
        "Exchange — the wire carries one partial row per (grouping set x key), " +
        "never 4x the input."),
    "q_window_range" ->
      ("One hash Exchange on user_id, one per-partition sort, one Window with a " +
        "RANGE frame — the running-frame scan is O(n) per partition via the " +
        "sliding frame bound, no self-join, no per-row rescans."),
    "q_mad_outliers" ->
      ("The per-group median/MAD tables are group-cardinality-sized, so both " +
        "rejoin the cents table as BroadcastHashJoins: the 100 TB fact side " +
        "streams through twice with zero fact-side shuffles; only the tiny " +
        "percentile aggregations exchange. Inside each median: the rank " +
        "window partitions by (group, value-bucket) — approx-percentile " +
        "cutpoints split every group into ~32 parallel sort cells, so a " +
        "5-group corpus sorts in ~160 tasks, not 5 (the cutpoint aggregate " +
        "is one tiny sketch; its accuracy affects bucket balance, never " +
        "rank correctness)."),
    "events_gapfill" ->
      ("The dense grid side is (types x days) rows built from one 1-row bounds " +
        "aggregate — broadcast into the left join against the sparse daily " +
        "aggregate; the events table is scanned once for the aggregate, once " +
        "for bounds (both map-combined)."),
    "text_top_terms" ->
      ("tf and df are both partial-aggregated before their exchanges; the " +
        "1-row corpus count and the token df table join back via broadcast; " +
        "the final top-3 window partitions by doc_id — per-doc state is the " +
        "token list, never the corpus."),
    "dedup_lines" ->
      ("Line explode is map-only; the first-occurrence min(struct(id,pos)) " +
        "per line hash partial-aggregates before its Exchange, winners join " +
        "back by the md5 key, and the per-doc regroup is the only full-text " +
        "shuffle — linear in corpus lines, no window, no SinglePartition."),
    "q_pack_sequences" ->
      ("Two-level prefix sum: the heavy window hash-partitions by id bucket " +
        "(parallel), the bucket-totals cumsum is the only SinglePartition " +
        "exchange and sees one row per bucket, and offsets broadcast back — " +
        "a single global window here would pull the corpus through one task."),
    "sim_topk_pq" ->
      ("PQ ADC search: codes + reconstructed norms are map-only projections " +
        "over the corpus scan; the per-query lookup tables broadcast (queries " +
        "x m*ksub longs); candidate scoring is the native pq_adc_score " +
        "table-lookup kernel inside the join; the shortlist is a partial " +
        "topk_pairs aggregate (≤ shortlist rows per query cross the wire) and " +
        "only shortlist survivors see full vectors in the exact re-rank."),
    "dedup_substring_spans" ->
      ("Anchor windows are a map-only explode (md5 of each 8-token slice); " +
        "the duplicated-anchor aggregate partial-combines before its " +
        "Exchange; positions come back through a LeftSemi join on the md5 " +
        "key (a million-fold-duplicated boilerplate anchor cannot multiply " +
        "rows); the gaps-and-islands merge windows by doc id — per-doc " +
        "state only, never corpus-wide."),
    "dedup_span_cut" ->
      ("The cut decision reuses the detector's shapes (semi-join gated " +
        "anchors, per-doc islands) plus a winners join keyed by the anchor " +
        "md5 (one row per position) and a LeftAnti of tokens against the " +
        "cut ranges; the only full-text shuffle is the per-doc rebuild — " +
        "the same volume as the input, like dedup_lines."),
    "text_ppl_buckets" ->
      ("The vocab histogram broadcasts into the token stream (never a " +
        "token-keyed shuffle — Zipf skew), the tercile scan windows over the " +
        "languages x distinct-scores HISTOGRAM (bounded rows, not the " +
        "corpus), and the cutoff table broadcasts back to the scored docs."),
    "q_winsorize" ->
      ("Per-group exact p1/p99 via the bucket-parallel rank: cutpoints from " +
        "one approx-percentile sketch broadcast into the scan, the corpus " +
        "shuffles ONCE keyed by (group, bucket) — ~32 parallel sort cells " +
        "per group instead of one whole-group task — cell offsets (groups x " +
        "buckets rows) broadcast back, and the two bracketing ranks per " +
        "quantile aggregate to a group-sized clamp table that broadcast-" +
        "rejoins the fact side. No single-task-per-group sort anywhere."),
    "q_asof_nearest" ->
      ("Nearest-direction as-of join runs the SAME union+merge shape as " +
        "backward/forward: one Exchange (hash by user), one per-key sort, " +
        "a running last_value for the backward candidate and a lead() for " +
        "the forward one, then a row-local argmin of the two microsecond " +
        "gaps — still no Join node, no theta-join explosion on hot keys."),
    "sim_hard_negatives" ->
      ("The exact baseline: label-filtered pairs via a broadcast cross of " +
        "the query side against the corpus, native cosine inside the join, " +
        "and a partial top-k aggregate so only k rows per query cross the " +
        "wire. Deliberately quadratic by contract — the IVF scale path " +
        "(sim_hard_negatives_ivf) probes nProbe cells so candidates are " +
        "~corpus x nProbe / cells; same plan family as sim_topk_ivf."),
    "q_epoch_pack" ->
      ("Epoch assembly = deterministic shuffle-shard composed with sequence " +
        "packing: the seeded portable hash assigns shards map-side, the " +
        "per-shard window sorts run in parallel across shards, and the " +
        "packer's two-level prefix sum keeps its only SinglePartition " +
        "exchange at one row per bucket (the bucket-totals frame), with " +
        "offsets broadcast back to the token stream."),
    "q_curation_v2" ->
      ("The flagship composition (Gopher gate -> ppl-bucket drop -> span-" +
        "coverage cap -> exact dedup): three full-corpus map-only scoring " +
        "passes joined on doc_id — Gopher signals are a per-row struct, the " +
        "ppl cutoffs broadcast back, span coverage reuses the semi-join-" +
        "gated anchor shape — then one exact-dedup hash aggregate. Cost is " +
        "genuinely three scans; every join is broadcast or doc_id-keyed."),
    "text_bigram_logprob" ->
      ("Bigram LM scoring under the Zipf discipline: the per-occurrence " +
        "bigram stream is built map-side from the bound token array (an " +
        "index transform — never a positional self-join), both count " +
        "tables are distinct-gram-sized and meet the stream as " +
        "BroadcastHashJoins (a token-keyed shuffle would land every " +
        "occurrence of a hot bigram on one reducer), and the per-doc sum " +
        "partial-aggregates before its exchange. PlanShapeSpec pins the " +
        "two broadcasts."),
    "text_gopher_repetition" ->
      ("All 15 Gopher §A1.2 repetition signals (dup line/para counts and " +
        "chars, top-{2,3,4}-gram char mass, dup-5-gram occurrences, the " +
        "composed pass flag) are ONE native repetition_signals projection " +
        "over the documents scan — no Exchange except the output ordering, " +
        "no Generate, no Window; linear in corpus bytes. Round-7 rebuild: " +
        "the HOF formulation re-evaluated the captured tokenize chain per " +
        "array element (Catalyst HOFs don't CSE captured expressions — " +
        "quadratic per doc, 62.9 s = 28% of the r6 bench); the one-pass " +
        "hashmap kernel is 0.9 s cache-cold (PROFILE.md), the same cure " +
        "ShingleBucketCounts applied to DSIR in round 5."),
    "q_curation_v3" ->
      ("The round-8 flagship (source health gate -> Gopher rules + " +
        "repetition -> trained-quality median keep -> LSH near-dup closure " +
        "feeding BOTH canonical dedup and the leakage-safe split -> " +
        "deterministic shuffle + sequence packing): every inter-stage join " +
        "is doc_id-keyed or a broadcast of a bounded side (kept-source " +
        "list, 256-bucket weight vector as a plan literal, score-histogram " +
        "cutoff row, pack offsets). The corpus-sized shuffles are exactly " +
        "the components' own: the md5 dup-count aggregate, the LSH band " +
        "self-join on (band, bucket), the closure's bounded edge set, and " +
        "the per-shard pack windows — no new Exchange was introduced by " +
        "the composition itself."),
    "text_bm25_topk" ->
      ("Inverted-index retrieval as joins: the corpus reduces once to " +
        "(doc, term) frequencies with map-side partials; the probe panel's " +
        "term table (with its restricted df counts) meets the tf table as a " +
        "BroadcastHashJoin, so docs sharing no probe term are dropped at " +
        "the scan side of the candidate gate; the only other corpus-keyed " +
        "exchange attaches per-doc lengths. Per-term scores floor to longs " +
        "BEFORE the per-doc sum (order-independent), the top-k window is " +
        "partitioned by query_id. Never queries x docs."),
    "text_bm25_topk_bigpanel" ->
      ("Big-panel probe of the persisted index: the panel's exploded " +
        "terms shuffle BY TOKEN onto the postings' bucket layout and " +
        "sort-merge against them — the postings and termstats scans are " +
        "already hash-distributed by the bucketed write, so the index " +
        "side of both joins plans with ZERO Exchange (PlanShapeSpec pins " +
        "it). The data moved per probe is ONE panel-sized shuffle; at a " +
        "decontamination panel of millions of probes this replaces the " +
        "broadcast gate, which would ship the panel to every task."),
    "text_bm25_topk_delta" ->
      ("Incremental maintenance probe: the index is base + appended " +
        "delta SEGMENT (postings written delta-sized, termstats df " +
        "re-summed across segments behind an explicit repartition " +
        "barrier, stats component-summed) — the probe plan is the " +
        "broadcast gate over the segment union, and the answer is " +
        "bit-identical to the full rebuild because tf/dl are per-doc " +
        "facts and df/stats are sums of disjoint longs. The append " +
        "itself never re-tokenizes the base: its guard is a map-only " +
        "Bloom digest probe of the delta ids plus an exact confirm " +
        "against n_docs-long id tables."),
    "q_temperature_mix" ->
      ("Sqrt-temperature sampling: one map-side-combined count aggregate " +
        "produces the source-sized rate card (floor(sqrt(n)) weights, " +
        "integer-division targets), which broadcasts back; the corpus's " +
        "only shuffle is the per-source seeded-hash-order window that " +
        "implements the EXACT take. Same window class as " +
        "tokenBudgetCuration — salt or pre-thin a pathological hot " +
        "source."),
    "text_dsir_weights" ->
      ("Per-doc bucket histograms are computed IN-ROW by the native " +
        "one-pass ShingleBucketCounts expression (hash every shingle " +
        "occurrence into a primitive long[buckets], emit non-zero cells " +
        "ascending) so the corpus never shuffles at all. Design lineage, " +
        "each step measured: round 3's groupBy(id, bucket) pre-aggregation " +
        "re-shuffled the per-occurrence stream (docs are row-local, so " +
        "map-side combine bought nothing, 42% wall time); round 4 " +
        "run-length-encoded in-row via sort_array + index HOFs (right " +
        "shape, wrong constant: O(L log L) sort + two struct lambdas + a " +
        "try_element_at per element); round 5's native fuse profiled " +
        "3.4x on cache-cold runs (PROFILE.md). The bucket ratio table " +
        "(<= buckets rows) broadcasts back into the cached cell stream."),
    "sim_topk_sq8" ->
      ("Scalar-quantized ANN: int8 codes + code-norms are a map-only " +
        "projection on both sides; the query panel (codes only, 4x " +
        "smaller than vectors) broadcasts into the streamed corpus " +
        "scan — the shortlist ranking is exact integer arithmetic " +
        "reduced by the bounded-heap partial top-k, and the exact " +
        "re-rank equi-joins full vectors for ONLY query x shortlist " +
        "rows. At corpus scale the candidate set is bounded first " +
        "with IVF cells; this plan is the within-cell scorer."),
    "q_zorder_layout" ->
      ("Z-order layout: after the one-row min/max stats pass the " +
        "Morton key is a single codegen'd shift/mask projection — " +
        "ZERO exchanges before the bucket-envelope aggregate (and the " +
        "write path adds exactly one range exchange). The per-bucket " +
        "min/max envelope IS the scan-pruning evidence: each bucket " +
        "covers a small rectangle of (custkey, orderdate), so parquet " +
        "footer stats prune on either dimension."),
    "text_source_drift" ->
      ("JS drift card: the occurrence stream reduces in ONE partial-" +
        "combined (source, term) count — its only corpus-keyed " +
        "shuffle; the corpus histogram re-aggregates the vocab-sized " +
        "result, top-K terms come from the bounded-heap topk_rows " +
        "aggregate (no global vocab sort), and the zero-fill grid is " +
        "sources x K rows built from broadcast joins. Per-term JS " +
        "contributions floor to integer micros before the long sum — " +
        "no cross-row float accumulation anywhere."),
    "text_drift_windowed" ->
      ("Streaming-legal drift monitor (batch mode of the one " +
        "definition): per-doc reference-term count VECTORS are " +
        "map-only; the single stateful operator is the windowed " +
        "array_sum_agg (K+1 longs of state per window — the shape " +
        "Structured Streaming accepts and a state store can hold at " +
        "any corpus rate); the JS finish is a projection over the " +
        "aggregated vector against plan-literal reference counts."),
    "sim_rrf_hybrid" ->
      ("Hybrid retrieval: the BM25 run (broadcast probe gate over " +
        "the tf table) and the dense run (broadcast panel over the " +
        "corpus scan) execute independently; fusion unions two " +
        "panel-sized top-k lists, one (query_id, id) aggregate sums " +
        "exact long 10^9 div (60+rank) contributions, and the final " +
        "per-query window ranks at most |runs|*k rows per query — " +
        "corpus cost lives entirely in the upstream runs."),
    "q_data_quality" ->
      ("Constraint suite: every check is a conditional sum fused " +
        "into ONE aggregate over ONE scan (QualitySpec pins a single " +
        "FileScan) — the per-check stacking explodes the single " +
        "aggregate row, never re-selects from it (a union of selects " +
        "over an unpersisted aggregate would rescan the corpus per " +
        "check). A 50-check suite at 100 TB is still one pass."),
    "q_corpus_audit" ->
      ("The per-source accept-gate flagship: the health card (one " +
        "fused per-doc map pass + md5 dup join) and the JS drift " +
        "card (one (source,term) count shuffle + bounded-heap top-K) " +
        "run as siblings and meet in a source-cardinality join; " +
        "rates and gates are integer micro arithmetic. No new " +
        "Exchange beyond the components' own."),
    "q_pack_ffd" ->
      ("Document-preserving FFD packing: one hash-partition Exchange " +
        "routes each doc to its shard; the greedy fold runs inside " +
        "MapGroups with no driver loop and no further shuffle — the " +
        "parallel unit is the shard, sized so a task's (id, n) buffer " +
        "is tens of MB even at billions of docs."),
    "text_bloom_decontam" ->
      ("The join-free decontamination probe: after the reference bit " +
        "array is built (one word-OR aggregate over the panel), the " +
        "corpus side is scan → native bloom_shingle_hits projection → " +
        "filter — ZERO Exchange, ZERO Join (PlanShapeSpec pins it). " +
        "At 100 TB the gate costs exactly one pass over the corpus's " +
        "own shingles."),
    "text_decontam_two_tier" ->
      ("Bloom prefilter + exact confirm: the corpus-sized side of the " +
        "confirm semi-join is the FLAGGED sliver (left_semi against " +
        "the map-only card), so the only shuffle that scales with " +
        "anything carries corpus·flag-rate rows; the answer is " +
        "bit-identical to the full exact join by the no-false-negative " +
        "guarantee."),
    "text_cms_heavy_hitters" ->
      ("Count-min sketch: the occurrence stream reduces into the " +
        "4x1024 counter grid with partial_count BEFORE its one " +
        "Exchange — wire cost is partitions x grid, independent of " +
        "vocabulary and corpus size. The exact top-K side (eval " +
        "harness) is the vocab-keyed aggregate the sketch replaces in " +
        "production."),
    "text_hll_distinct" ->
      ("HyperLogLog: bucket/rank are map-only projections; registers " +
        "are ONE max aggregate over 256 keys with map-side combine — " +
        "distinct counting whose shuffle carries at most m rows per " +
        "partition. The countDistinct beside it is the eval truth, " +
        "not the scale path."),
    "sim_centroid_outliers" ->
      ("Centroid-prototypicality outliers: after the train pass, " +
        "scoring is MAP-ONLY — native nearest-cell assignment, a " +
        "broadcast join against the centroid-count-sized table, one " +
        "native cosine per row — finished by TakeOrdered(20). The " +
        "corpus never shuffles on the serving path."),
    "sim_label_margin" ->
      ("Label-margin mislabel suspects: the centroid pass is ONE " +
        "(label, pos) shuffle of dim x L cells; scoring is MAP-ONLY " +
        "against L centroid literals riding the plan (own-label " +
        "cosine via a lazy coalesce-of-whens, best-other via " +
        "greatest), finished by TakeOrdered(k). Margins are integer " +
        "micro differences — no float boundary of their own."),
    "q_kanon_audit" ->
      ("k-anonymity audit: ONE map-side-combined aggregate on the " +
        "quasi-identifier key, then a class-count-sized histogram " +
        "re-aggregation — re-identification risk for a 100 TB corpus " +
        "priced at one shuffle of (QI, count) rows."),
    "dedup_index_gate" ->
      ("Incremental dedup gate: the batch shuffles ONCE on its own " +
        "text key (the in-batch first-occurrence window); the digest " +
        "probe is a map-only filter over plan-literal Bloom words; " +
        "the fps table appears ONLY as the flagged-md5 semi-join's " +
        "build side (two columns), and not at all when the digest " +
        "clears the batch — dedup against everything ever ingested " +
        "at a cost independent of how much was ever ingested."),
    "dedup_neardup_idx" ->
      ("Near-dup gate from the persisted LSH index: delta signatures " +
        "are one map-only native pass; the (band, bucket) Bloom " +
        "prefilter drops never-seen buckets before anything touches " +
        "the index; surviving buckets hash-join the postings and " +
        "candidates verify by exact Jaccard against the sets table — " +
        "the historical corpus is never re-signatured and never " +
        "read beyond the colliding buckets' rows."),
    "q_ingest_gate" ->
      ("The online ingest flagship: four admission gates in ONE " +
        "declarative plan — the exact-dup gate's digest probe, the " +
        "near-dup gate's bucket prefilter, the two-tier decontam's " +
        "map-only Bloom + flagged-sliver confirm, and the map-only " +
        "quality floor — meeting in arrival-sized joins. Every " +
        "corpus-scale artifact (fps, postings, sets, panel bits) " +
        "enters as a persisted index or plan literal; the arrivals " +
        "batch is the only thing that flows."),
    "q_zorder_prune" ->
      ("2-D pruning audit: after the one-row bounds pass, all three " +
        "layouts' (layout, file) rows come off ONE corpus scan via a " +
        "codegen'd 3-way explode — the envelope aggregate groups on " +
        "3 x 64 keys with map-side partials, so the single exchange " +
        "carries at most 192 rows per task regardless of corpus " +
        "size. The must_read column is a literal-bounds projection " +
        "over the aggregate — the audit costs one scan, the layout " +
        "decision it informs saves thousands."),
    "events_attribution" ->
      ("Attribution: ONE Exchange (the user-key shuffle) feeds a " +
        "single WindowExec computing both touch extrema as RANGE-" +
        "frame struct aggregates — the conversions x touches join a " +
        "bursty user would blow up never exists in this plan; the " +
        "conversion filter projects after the window. State per " +
        "frame bound is one struct, the incremental shape RANGE " +
        "windows keep."),
    "sim_topk_sign" ->
      ("Sign-bit ANN: packing is a map-only Project over the corpus " +
        "scan (the HOF fold runs once per ROW); the candidate scorer " +
        "is a BroadcastNestedLoopJoin over 16 bytes/vector whose " +
        "Hamming is two codegen'd xor/bit_count pairs — no HOF in " +
        "the quadratic path — and the exact re-rank equi-joins full " +
        "vectors for only query x shortlist rows."),
    "q_compaction_plan" ->
      ("Compaction planner: the corpus collapses FIRST to the " +
        "(partition, file) manifest — the one corpus-keyed, " +
        "map-side-combined shuffle; per-partition capacities " +
        "broadcast back onto manifest rows, and the FFD fold runs " +
        "per PARTITION over its file LIST (bounded, loud guard) — " +
        "the files themselves are never read. Output is " +
        "manifest-sized; no corpus-scale sort anywhere."),
    "q_tclose_audit" ->
      ("t-closeness: the corpus collapses to (QI, value) counts in " +
        "ONE map-side-combined shuffle; everything after is " +
        "classes x domain — the domain histogram, the singleton " +
        "total and the class-value counts all enter as " +
        "BroadcastHashJoin build sides, so no corpus-sized row " +
        "crosses an Exchange again. DECIMAL(38,0) products keep the " +
        "distance exact where a 100 TB corpus would overflow i64."),
    "text_unigram_tokens" ->
      ("Unigram tokenizer: training runs over the DISTINCT-word " +
        "table (word-key shuffle, then a piece-key shuffle of the " +
        "substring stream — both Zipf-small), top-K via " +
        "TakeOrderedAndProject; the apply side is a single map-only " +
        "Project over the corpus scan — the Viterbi is one codegen'd " +
        "expression per word, vocab in a driver-held map, " +
        "no join and no shuffle in the segmentation path."),
    "multimodal_decode_mp4" ->
      ("Video metadata tier: blob synthesis and the ISO-BMFF box " +
        "walk are consecutive map-only stages over the id scan " +
        "(MapPartitions -> Project), so decode runs where the bytes " +
        "are; the only Exchange is the output ordering's range " +
        "partitioning. Sample tables are never read — the plan's " +
        "cost is header bytes, not media bytes."),
    "text_c4_rules" ->
      ("C4 rule card: one map-only Project over the corpus scan — " +
        "line split, kept-line filter, sentence count and the two " +
        "substring tests all fuse into a single WholeStageCodegen " +
        "span; the only Exchange is the output ordering."),
    "q_bloom_skip_audit" ->
      ("Bloom file-skipping audit (the point-lookup leg of the " +
        "layout trio): the corpus flows through a 2-way layout " +
        "explode into the file-stats aggregate and a xk position " +
        "explode into the per-file distinct position sets — both " +
        "map-side-combined into file/position-bounded groups; " +
        "every probe-side join (positions, needs, grid) broadcasts. " +
        "Nothing corpus-sized joins anything corpus-sized."),
    "dedup_edit_join" ->
      ("Edit-similarity self-join (deletion-neighborhood default at " +
        "d<=1): each side is one map-only explode of the string's " +
        "<=len+1 deletion-variant hashes; the candidate join is a " +
        "plain hash equi-join on 64-bit keys whose per-key rows are " +
        "genuine lookalikes (whole-string entropy — saturated gram " +
        "vocabularies cannot densify it); levenshtein verifies " +
        "BEFORE any exchange and the one post-verify distinct " +
        "carries match-set-sized rows. No window, no freq table, no " +
        "cartesian — pinned in PlanShapeSpec."),
    "dedup_editidx_gate" ->
      ("Persisted edit-index gate (deletion strategy): the batch's " +
        "digest-flagged variant hashes BROADCAST into the postings " +
        "scan; the denormalized (s, len) columns let the length band " +
        "and exact levenshtein run in the same map stage — " +
        "candidates never shuffle, the index is touched only behind " +
        "the Bloom digest prefilter, and an all-novel batch reads no " +
        "postings at all (SCALE r13: gate 2.1x / append 1.0x at 20x " +
        "corpus)."),
    "multimodal_dhash_pairs" ->
      ("Pixel-hash image near-dup: hashing is one mapPartitions over " +
        "the blobs (map-only, 8 bytes out per image); pairing " +
        "explodes each 64-bit word into 4 16-bit bands and " +
        "equi-joins on (band, value) — the pigeonhole-complete " +
        "Hamming blocking — verified by codegen bit_count(xor) " +
        "before the match-set distinct. Never all-pairs."),
    "sim_ivf_cell_skew" ->
      ("IVF cell-imbalance card: one map-only nearest-cell " +
        "assignment (broadcast centroids), one cell-keyed " +
        "map-side-combined count, and the card math windows over " +
        "nCells rows only (allowlisted bounded global window)."),
    "dedup_imageidx_gate" ->
      ("Persisted image near-dup index gate: the batch's " +
        "digest-flagged band keys BROADCAST into the band-postings " +
        "scan; the denormalized hash lets bit_count(xor) verify in " +
        "the same map stage — candidates never shuffle, and the one " +
        "exchange carries match-set-sized rows into the final " +
        "distinct."),
    "q_ddsketch_quantiles" ->
      ("DDSketch: one bucket-keyed aggregate with partial_count " +
        "before the single corpus Exchange (the sketch IS the " +
        "map-side-combine result); quantile reads join the " +
        "few-hundred-row sketch to a broadcast panel, with the " +
        "cumulative walk windowing over sketch rows only " +
        "(allowlisted bounded global window)."),
    "text_kmv_overlap" ->
      ("KMV theta sketch: one (group, hash) distinct, then the " +
        "bounded-heap partial_topk_rows reduces every map task to " +
        "<= k rows per group before the shuffle — never a vocab " +
        "window sort; all pair set-algebra runs on k-sized sketch " +
        "rows behind broadcast pair panels; only the eval card's " +
        "exact columns touch corpus-width data."),
    "text_wordpiece_tokens" ->
      ("WordPiece encode: the greedy longest-match segmentation is " +
        "one map-only codegen'd expression pass (vocab rides in the " +
        "expression); training rounds each plan one pair-count and " +
        "one symbol-count aggregate over the DISTINCT word table, " +
        "both map-side combined."),
    "text_bm25_prf" ->
      ("Pseudo-relevance feedback: two bm25TopK passes share the " +
        "broadcast-probe-into-tf shape; between them the feedback " +
        "set (queries x kFb rows) broadcasts into the tf table and " +
        "the expansion vote windows over per-query feedback " +
        "vocabularies — panel-sized state end to end."),
    "multimodal_videohash_pairs" ->
      ("Video near-dup pairing: Y4M decode + windowed-DCT fingerprint " +
        "is ONE map-only mapPartitions pass (16 bytes out per clip, " +
        "per-task state capped at 33 longs per frame by the walker's " +
        "frame guard); pairing reuses the banded-Hamming equi-join — " +
        "the shuffle carries (id, band, value) words, verification is " +
        "the codegen bit_count(xor), never all-pairs and never the " +
        "frame bytes."),
    "multimodal_audiohash_pairs" ->
      ("Audio near-dup pairing: decode + framed-DCT fingerprint is ONE " +
        "map-only mapPartitions pass (8 bytes out per clip); pairing " +
        "reuses the banded-Hamming equi-join — the shuffle carries " +
        "(id, band, value) words, verification is the codegen " +
        "bit_count(xor), never all-pairs and never the audio bytes."),
    "dedup_edit_join_pruned" ->
      ("FastSS-pruned deletion join at d=2: the variant explode is " +
        "map-only and 2.8x smaller than the unpruned neighborhood " +
        "(C(12,<=2)+1 vs C(len,<=2)+1 keys per string); the one " +
        "exchange is the hash equi-join on 64-bit variant keys; exact " +
        "levenshtein verifies on the joined rows. Same pair set as " +
        "unpruned by the truncation lemma — the plan just ships fewer " +
        "postings."),
    "q_dp_budget" ->
      ("DP budget card: the ledger is a releases-sized catalog table " +
        "(driver-bounded by policy), each spend one tiny scan + one " +
        "1-row append; the released aggregates keep dpNoisyCounts/" +
        "dpNoisySum's one-key-shuffle shapes. Nothing here grows with " +
        "the corpus — by construction a BUDGET is small."))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val out = sys.env.getOrElse("SPARK_GRAFT_PLANS_OUT", "PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plans")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit of the headline operators\n\n")
    sb.append("`explain(\"formatted\")` for each headline query (sfDir=" + sfDir + "),\n")
    sb.append("with the property that makes the plan scale. Load-bearing shapes are\n")
    sb.append("regression-asserted in `PlanShapeSpec`; regenerate this file with\n")
    sb.append("`sbt \"runMain graft.PlanDump\"`.\n")
    Headline.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n$why\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).trim)
      sb.append("\n```\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes("UTF-8"))
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
