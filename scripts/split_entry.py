#!/usr/bin/env python3
"""One-shot refactor aid: split SparkEntry.scala's two giant map
literals into per-family modules under graft.entry.

Segments the `queries` and `oracleSql` map regions at entry-start
lines ("qNN_name" ->), peels leading comments onto the entry they
describe, and re-emits each family's (queries, oracleSql) pair into
one file so a mis-paired edit stays local to its family.

Asserts: every key assigned exactly once, every assigned key exists,
and the union of emitted keys equals the original key sets.
"""
import re, sys, collections

SRC = "src/main/scala/graft/SparkEntry.scala"
lines = open(SRC).read().split("\n")

ENTRY_RE = re.compile(r'^    "(q\d+[a-z0-9_]*)" ->')

def find_region(header_re, lines):
    start = next(i for i, l in enumerate(lines) if re.match(header_re, l))
    # region body starts after the Map( line; ends at the matching two-space ")"
    i = start + 1
    depth = None
    for j in range(start, len(lines)):
        if lines[j].rstrip().endswith("Map("):
            i = j + 1
            break
    for j in range(i, len(lines)):
        if lines[j] == "  )":
            return i, j
    raise AssertionError("no close")

def segment(body_lines):
    """-> list of (key, block_lines); leading comments attach forward."""
    starts = [i for i, l in enumerate(body_lines) if ENTRY_RE.match(l)]
    blocks = []
    for n, s in enumerate(starts):
        e = starts[n + 1] if n + 1 < len(starts) else len(body_lines)
        blk = body_lines[s:e]
        # peel trailing comment/blank lines onto the next entry
        tail = []
        while blk and (blk[-1].strip() == "" or blk[-1].strip().startswith("//")):
            tail.insert(0, blk.pop())
        key = ENTRY_RE.match(blk[0]).group(1)
        blocks.append([key, blk, tail])
    # re-attach: block n's tail prepends block n+1
    out = []
    carry = body_lines[: starts[0]]  # leading comments of the whole region
    for n, (key, blk, tail) in enumerate(blocks):
        out.append((key, [l for l in carry if l.strip()] + blk))
        carry = tail
    assert not any(l.strip() for l in carry if not l.strip().startswith("//")), carry
    return out

qi, qj = find_region(r"  def queries:", lines)
oi, oj = find_region(r"  def oracleSql:", lines)
qblocks = segment(lines[qi:qj])
oblocks = segment(lines[oi:oj])
qkeys = [k for k, _ in qblocks]
okeys = [k for k, _ in oblocks]
assert len(set(qkeys)) == len(qkeys) and len(set(okeys)) == len(okeys)
assert set(okeys) <= set(qkeys), set(okeys) - set(qkeys)

FAMILIES = {
 "EtlQueries": """q01_pricing_summary q02_filter_project q03_join_revenue_nation
   q04_orders_no_lineitem q05_semi_join_bigqty q06_fk_violations q07_dup_keys
   q08_dedup_keep_first q09_dim_surrogate q10_window_lag q11_changed_rows
   q12_merge_post_state q13_scd2_history q14_null_census q15_ship_before_order
   q16_negative_balance q17_emoji_scan q18_chronology q19_missing_required
   q42_pipeline_e2e q74_regional_revenue q76_small_order_revenue""",
 "AnalyticsQueries": """q32_hourly_events q33_sessionize q34_json_extract
   q40_approx_distinct q41_sliding_window q44_salted_agg q51_column_profile
   q54_quantile_sketch q59_asof_join q60_range_join q61_heavy_hitters
   q64_window_battery q65_rollup q66_pivot q67_set_ops q68_cube
   q73_zscore_outliers q77_prequential_anomaly q80_funnel q81_retention
   q82_gap_fill q83_topk_per_group q102_grouping_sets q105_unpivot""",
 "TextQueries": """q20_text_stats q21_stopword_ratio q22_language_id
   q23_quality_score q29_token_estimate q47_repetition q48_tfidf_topk
   q69_chunk_overlap q70_edit_distance q72_char_entropy q97_line_strip
   q98_line_clean q99_quality_classifier q103_bigram_lm_score q104_drift_report
   q109_nfc_normalize q111_control_clean q114_gopher_rules q118_vocab_coverage
   q119_bpe_merges q120_bpe_tokenize q125_dsir_weights""",
 "DedupQueries": """q24_exact_dedup q25_near_dup_jaccard q26_minhash_near_dup
   q27_simhash q28_fingerprint q37_cosine_near_dup q38_cosine_near_dup_lsh
   q50_line_dedup q53_dup_clusters q56_semantic_dedup q71_canonical_doc
   q84_semantic_dedup_exemplar q88_near_dup_lsh_portable q100_dup_spans
   q110_ccnet_dedup""",
 "SimilarityQueries": """q30_topk_cosine q31_topk_lsh q43_topk_ivf q75_kmeans
   q79_topk_ivfpq q85_topk_ivf_exemplar q86_topk_lsh_portable
   q87_lloyd_step_exemplar q89_pq_adc_exemplar q91_lloyd_iterate_exemplar
   q112_topk_int8 q115_topk_matryoshka q121_topk_ivf_int8""",
 "RetrievalQueries": """q122_maxsim_topk q123_bm25_topk q124_hybrid_rrf
   q126_hard_negatives q127_prf_expansion q128_retrieval_metrics
   q129_best_passage q130_rag_serving q135_filtered_ann q136_filtered_ivf
   q137_filtered_recall q138_mmr_rerank""",
 "MediaQueries": """q35_media_meta q36_image_features q39_frame_sample
   q106_image_features_imageio q107_audio_features_wav q108_video_frames_gif
   q131_image_near_dup q132_audio_near_dup q133_video_near_dup""",
 "CurationQueries": """q45_pii_scan q46_contamination q49_stable_split
   q52_corpus_mixture q55_contamination_bloom q57_budget_sample
   q58_sequence_pack q62_stratified_sample q63_curation_e2e
   q78_weighted_sample q90_source_cap q92_temperature_mix q93_pii_redact
   q94_contamination_report q95_shuffle_shards q96_release_e2e
   q101_curation_funnel""",
 "GraphSketchQueries": """q113_shard_distinct_sketch q116_heavy_keys_cms
   q117_corpus_overlap q134_pagerank""",
}
DOCS = {
 "EtlQueries": "The reference's ETL surface: TPC-H-style aggregation,\n  * joins, rule checks, SCD2 merge, and the end-to-end pipeline.",
 "AnalyticsQueries": "Window/time-series/OLAP analytics: sessionization,\n  * windows, rollup/cube/pivot, sketches, skew-aware aggregation.",
 "TextQueries": "Text statistics, quality scoring, language ID,\n  * tokenization (incl. BPE), normalization, Gopher rules, DSIR.",
 "DedupQueries": "Exact and near-duplicate detection: hash, Jaccard,\n  * MinHash+LSH, SimHash, cosine/semantic, spans and clusters.",
 "SimilarityQueries": "ANN over the embeddings table: brute-force\n  * baseline, RHP-LSH, IVF (trained + exemplar), PQ, int8, Matryoshka.",
 "RetrievalQueries": "Lexical + dense retrieval: BM25, hybrid RRF,\n  * PRF, eval metrics, passages, MaxSim, filtered ANN, MMR, RAG.",
 "MediaQueries": "Multimodal (image/audio/video) metadata, features,\n  * real-codec decode, and perceptual near-dup.",
 "CurationQueries": "Corpus curation: PII, contamination, splits,\n  * sampling, mixing, sharding, and the release pipeline.",
 "GraphSketchQueries": "Graph + mergeable-sketch operators: PageRank,\n  * HLL shard sketches, count-min heavy keys, overlap census.",
}

assign = {}
for fam, ks in FAMILIES.items():
    for k in ks.split():
        assert k not in assign, f"double-assigned {k}"
        assign[k] = fam
missing = set(qkeys) - set(assign)
extra = set(assign) - set(qkeys)
assert not missing, f"unassigned: {sorted(missing)}"
assert not extra, f"assigned but absent: {sorted(extra)}"

IMPORTS = """import graft.entry.EntryTables._
import graft.ext.{Dedup, Multimodal, Retrieval, Similarity, TextOps}
import graft.model.{ColumnSpec, FkRef, TableConfig}
import graft.ops.{Merge, Normalize, TemporalJoin}
import graft.rules.Rules
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._"""

def ensure_comma(block):
    b = [l for l in block]
    while b and not b[-1].strip():
        b.pop()
    if not b[-1].rstrip().endswith(","):
        b[-1] = b[-1].rstrip() + ","
    return b

qf = collections.defaultdict(list)
of = collections.defaultdict(list)
for k, blk in qblocks:
    qf[assign[k]].append(ensure_comma(blk))
for k, blk in oblocks:
    of[assign[k]].append(ensure_comma(blk))

for fam in FAMILIES:
    out = [f"package graft.entry", ""]
    out.append("/** " + DOCS[fam])
    out.append("  *")
    out.append("  * One slice of [[graft.SparkEntry]]'s catalog: `queries` and the")
    out.append("  * matching DuckDB `oracleSql` live side by side so an edit to a")
    out.append("  * query and its oracle is always a same-file change.")
    out.append("  */")
    out.append(IMPORTS)
    out.append("")
    out.append(f"private[graft] object {fam} " + "{")
    out.append("")
    out.append("  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(")
    for blk in qf[fam]:
        out.append("")
        out.extend(blk)
    out.append("  )")
    out.append("")
    out.append("  val oracleSql: Map[String, String] = Map(")
    for blk in of[fam]:
        out.append("")
        out.extend(blk)
    out.append("  )")
    out.append("}")
    path = f"src/main/scala/graft/entry/{fam}.scala"
    open(path, "w").write("\n".join(out) + "\n")
    nloc = len(out)
    print(f"{path}: {len(qf[fam])} queries, {len(of[fam])} oracles, {nloc} lines")

print("total keys:", len(qkeys), "oracle keys:", len(okeys))
