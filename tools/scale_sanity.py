"""Scale-sanity harness: measure the bucketed dedup/ANN paths on a
K-times upsampled corpus and report wall-times per scale.

Usage: python tools/scale_sanity.py [K ...]   (default: 1 3 10)

Builds, per K, a deterministic K-times corpus from sf0.1:
- documents: K copies; copy k rewrites every token with a _k suffix,
  so each copy's shingle space is DISJOINT from the others — the
  near-dup cluster structure of the base corpus is preserved within a
  copy and never bridges copies. That is the honest upsampling for a
  sweep-scaling measurement: candidate-pair work grows linearly in K,
  as it would with genuinely new data (appending/prepending a copy
  tag would instead make every doc a cross-copy near-dup of its K-1
  clones and measure the quadratic cluster blow-up, not the sweep).
- embeddings: K copies with vec_id offsets (cell populations scale
  K-fold; the probe set stays fixed).

Prints one JSON line per (query, K) with wall seconds — the min of 2
rounds INTERLEAVED over the whole (query x K) grid, so one of this
VM's multi-second CPU-steal windows cannot poison both samples of the
same cell (back-to-back repeats would) — and a final summary with the
growth exponent alpha where t ~ K^alpha (alpha <= ~1.15 means the
path scales linearly, i.e. no hidden quadratic term).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dot_spark import get_spark
from dot_spark.operators.graph import copurchase_edges, pagerank, triangle_count
from dot_spark.operators.similarity import decontaminate_embeddings, ivf_topk
from dot_spark.operators.text import tfidf_top_terms
from dot_spark.operators.textdedup import (
    connected_components,
    contamination_flags,
    dedup_corpus,
    exact_dedup,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    normalize_text,
)
from dot_spark.sources.registry import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def upsampled_docs(spark, k: int):
    base = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    n = base.count()
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            # suffix every token so copy i's shingles are disjoint
            F.regexp_replace("text", r"(\S+)", rf"$1_{i}").alias("text"),
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def upsampled_embeddings(spark, k: int):
    base = load_table(spark, "embeddings", SF_DIR)
    n = base.count()
    copies = [
        base.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"), "embedding", "label"
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def upsampled_lineitem(spark, k: int):
    """K disjoint copies of (orderkey, partkey, suppkey): all key
    spaces are offset per copy, so the co-purchase graph is K
    disjoint subgraphs — edges and nodes grow linearly, components
    never bridge copies, and the PageRank iteration count stays
    constant. Same honesty argument as the suffixed-token document
    upsampling above. The suppkey ride-along feeds the layout (p20)
    and skyline (a33) cells: per-copy offsets keep their distinct
    (dim, dim) cell spaces disjoint, so cells grow linearly too."""
    base = load_table(spark, "lineitem", SF_DIR).select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    mx = base.agg(
        F.max("l_orderkey"), F.max("l_partkey"), F.max("l_suppkey")
    ).first()
    o_off, p_off, s_off = mx[0] + 1, mx[1] + 1, mx[2] + 1
    copies = [
        base.select(
            (F.col("l_orderkey") + F.lit(i * o_off)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(i * p_off)).alias("l_partkey"),
            (F.col("l_suppkey") + F.lit(i * s_off)).alias("l_suppkey"),
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def upsampled_events(spark, k: int):
    """K disjoint copies of the events table (user/event id offsets):
    per-user windows and per-key MV groups grow linearly and never
    bridge copies."""
    base = load_table(spark, "events", SF_DIR).select(
        "user_id", "event_id", "ts", "value"
    )
    mx = base.agg(F.max("user_id"), F.max("event_id")).first()
    u_off, e_off = mx[0] + 1, mx[1] + 1
    copies = [
        base.select(
            (F.col("user_id") + F.lit(i * u_off)).alias("user_id"),
            (F.col("event_id") + F.lit(i * e_off)).alias("event_id"),
            "ts",
            "value",
        )
        for i in range(k)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def run(obj) -> float:
    """Time one grid cell. Cells are lazy DataFrames, except eager
    driver-loop operators (connected components) which enter as
    thunks so their whole computation lands inside the timer."""
    t0 = time.time()
    df = obj() if callable(obj) else obj
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 3, 10]
    spark = get_spark("dot_spark_scale_sanity")
    spark.range(10_000_000).selectExpr("sum(id)").collect()  # warmup

    # build the whole (query, K) grid lazily up front, then time it
    # in interleaved rounds: grid order q1k1 q2k1 ... q3k10, twice
    grid: dict[tuple[str, int], object] = {}
    # (cell, K) -> {"rounds": n} handed back by connected_components
    # for the closure-bearing cells (dd18/pl17); reported in the
    # summary so round-count growth across K is a first-class receipt
    cc_rounds: dict[tuple[str, int], dict] = {}
    for k in ks:
        docs = upsampled_docs(spark, k)
        emb = upsampled_embeddings(spark, k)
        probes = (
            load_table(spark, "embeddings", SF_DIR)
            .filter(F.col("vec_id") < 50)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
                "label",
            )
        )
        # dd1: the exact-dedup hash-groupBy — the cheapest family
        # member, in the grid so the dedup family's scaling curve
        # (dd1/dd2/dd4b/dd5b/pl9, the r11 verdict's stretch receipt)
        # is complete end-to-end
        grid[("dd1_exact_dedup", k)] = exact_dedup(docs)
        grid[("dd2_minhash_lsh", k)] = lsh_candidate_pairs(
            lsh_bands(minhash_signatures(docs))
        )
        # dd8: the full dedup path — pair mining + component
        # clustering. Upsampling preserves per-copy cluster structure
        # (copies never bridge), so iteration count stays constant
        # and per-iteration cost should scale linearly.
        grid[("dd8_cc_clusters", k)] = lambda docs=docs: connected_components(
            lsh_candidate_pairs(lsh_bands(minhash_signatures(docs)))
        )
        grid[("dd4b_jaccard_capped", k)] = ngram_jaccard_pairs(
            docs, threshold=0.7, shingle_maxdf=40
        )
        grid[("ss2_ivf_topk", k)] = ivf_topk(probes, emb, "label", k=5)
        # dd6: the bench/eval side stays FIXED (base corpus sample)
        # while the training side scales K-fold — the 100 TB shape
        # (broadcast bench index, train side unshuffled)
        bench_docs = load_table(spark, "documents", SF_DIR).filter(
            F.col("doc_id") % 37 == 0
        )
        grid[("dd6_decontamination", k)] = contamination_flags(docs, bench_docs)
        # dd7: eval embeddings fixed, training embeddings scale K-fold
        ev = (
            load_table(spark, "embeddings", SF_DIR)
            .filter(F.col("vec_id") % 83 == 0)
            .select(
                "label",
                F.col("vec_id").alias("eval_id"),
                F.col("embedding").alias("eval_vec"),
            )
        )
        grid[("dd7_embedding_decontam", k)] = decontaminate_embeddings(emb, ev)
        # pl4 compute core (the write protocol is constant-cost): the
        # arriving batch scales K-fold, the seen-hash set is the base
        # corpus — within-batch min-id dedup + anti-join membership
        seen = (
            load_table(spark, "documents", SF_DIR)
            .select(F.md5(normalize_text("text")).alias("text_hash"))
            .distinct()
        )
        grid[("pl4_ingest_dedup_core", k)] = (
            docs.select(F.md5(normalize_text("text")).alias("text_hash"), "doc_id")
            .groupBy("text_hash")
            .agg(F.min("doc_id").alias("doc_id"))
            .join(seen, "text_hash", "left_anti")
        )
        grid[("t9_tfidf_topterms", k)] = tfidf_top_terms(docs)

        # pl5: the END-TO-END corpus dedup pass (dd1 -> dd2 -> dd8 ->
        # canonical survivors) as ONE cell — the composed pipeline's
        # curve, not just its stages'. Clustering executes eagerly, so
        # it enters as a thunk like dd8; the composition is the SAME
        # shared dedup_corpus the pl5 query runs, so the measured cell
        # can never drift from the shipped pipeline.
        grid[("pl5_corpus_dedup", k)] = lambda docs=docs: dedup_corpus(
            docs
        ).select("doc_id")

        # g1/g2: the graph family — co-purchase construction (basket
        # self-join) + 5 PageRank iterations / the wedge join. Both
        # checkpoint eagerly, so they enter as thunks like dd8.
        li_k = upsampled_lineitem(spark, k)
        grid[("g1_pagerank", k)] = lambda li=li_k: pagerank(
            copurchase_edges(li), iterations=5
        )
        # g2/g5 cells run the SHIPPED shape (cap_degree(200) included,
        # matching the registry queries) so the grid can never drift
        # from what users execute.
        from dot_spark.operators.graph import cap_degree

        grid[("g2_triangle_count", k)] = lambda li=li_k: triangle_count(
            copurchase_edges(li), max_degree=200
        )
        # hub-stress cell: inject ONE pathological basket (a "crawl
        # order" holding 3000 parts — sum(deg²) poison uncapped) on
        # top of the K-scaled lineitem. The cap drops the hub edges,
        # so this cell's alpha must track g2_triangle_count's; a
        # regression here means the cap stopped protecting the wedge
        # join.
        hub = spark.range(3000).select(
            F.lit(-1).cast("long").alias("l_orderkey"),
            (F.col("id") + 1).alias("l_partkey"),
            F.lit(1).cast("long").alias("l_suppkey"),
        )
        li_hub = li_k.unionByName(hub)
        grid[("g2_hub_capped", k)] = lambda li=li_hub: triangle_count(
            copurchase_edges(li, max_basket=1024), max_degree=200
        )

        # t17 encode core: fixed merge table (training is a separate
        # driver-loop cost, already bounded by the vocab table) — the
        # encode pass itself must scale linearly in the corpus
        from dot_spark.operators.bpe import bpe_encode_counts

        grid[("t17_bpe_encode_core", k)] = bpe_encode_counts(
            docs, [("e", "t"), ("a", "n"), ("an", "d"), ("t", "h")]
        )

        # r8 additions (r7 verdict task 5): the newest iterative /
        # composed families, pinned like the rest.
        from dot_spark.operators.relational import snapshot_diff
        from dot_spark.operators.similarity import mmr_topk, semdedup, sq_topk
        from dot_spark.operators.textdedup import novelty_scores

        # ss7: probe set FIXED, corpus scales K-fold — the relevance
        # scan is the linear term; the greedy MMR rounds run on the
        # fixed Q*pool candidate table (localCheckpointed, eager ->
        # thunk), so rounds x pool cost must stay K-constant.
        grid[("ss7_mmr_topk", k)] = lambda e=emb, p=probes: mmr_topk(
            p, e, k=5, pool=20
        )
        # ss8: SQ training collects 2*dims scalars (eager -> thunk);
        # the int8 approximate scan is the linear term, the exact
        # re-rank touches only Q*pool full vectors.
        grid[("ss8_sq_topk", k)] = lambda e=emb, p=probes: sq_topk(
            p, e, k=10, pool=30
        )
        # pl9: the composed SemDeDup cell (dd5b bucket pairs -> dd8
        # components -> centroid scoring), not just its stages —
        # upsampled cells keep per-copy cluster structure so the
        # component iteration count stays constant.
        # production knob (the gated pl9 query's max_bucket="auto",
        # the r12 derived cap — 8 x the 0.1%-from-the-top cell size;
        # on these un-degenerate upsampled cells it never fires since
        # the derived cap grows K-fold with s_k):
        # upsampled cells grow K-fold, so UNCAPPED within-cell pair
        # volume grows ~K² by construction — measured alpha 0.99 at
        # K=10 uncapped (r11 NOTES); the cap is exactly what bounds
        # that at 100 TB (finer cells being the recall-preserving
        # control). Both variants pinned.
        grid[("pl9_semdedup", k)] = lambda e=emb: semdedup(e, max_bucket="auto")
        grid[("pl9_semdedup_uncapped", k)] = lambda e=emb: semdedup(e)
        # dd5b hot-cell stress (r10 verdict task 2): re-label HALF the
        # K-scaled vectors into ONE mode-collapsed cell on top of the
        # normal cells. Uncapped, that single bucket pays (n/2)² in
        # one task and the cell's time would blow up quadratically in
        # K; with max_bucket="auto" (the dd5b query's production
        # knob: derived cap = 8 x the second-largest cell, far below
        # the (n/2)-member hot cell at every K) the hot cell
        # contributes no pairs,
        # so this cell's alpha must track the plain dd5b cell's (the
        # cap costs one partial-agg size pass + a broadcast
        # anti-join). A regression here means the cap stopped
        # protecting the pair join.
        from dot_spark.operators.textdedup import bucketed_neardup_pairs

        emb_hot = emb.withColumn(
            "label",
            F.when(F.col("vec_id") % 2 == 0, F.lit(-1)).otherwise(F.col("label")),
        )
        grid[("dd5b_bucketed_neardup", k)] = lambda e=emb: bucketed_neardup_pairs(
            e, "label", threshold=0.45, max_bucket="auto"
        )
        grid[("dd5b_hot_cell_capped", k)] = lambda e=emb_hot: bucketed_neardup_pairs(
            e, "label", threshold=0.45, max_bucket="auto"
        )
        # j18: snapshot diff old-vs-new where both sides scale K-fold
        # (new = old with ~1/13 updated, ~1/17 deleted) — the
        # full-outer null-safe key join must stay one linear exchange
        # per side.
        new_docs = docs.filter(F.col("doc_id") % 17 != 0).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" upd"))
            ).otherwise(F.col("text")),
        )
        grid[("j18_snapshot_diff", k)] = snapshot_diff(
            docs, new_docs, keys=["doc_id"]
        )
        # t18: novelty scoring — shingle explode + first-occurrence
        # window; linear in the corpus when the shingle key space
        # grows with it (the suffixed-token upsampling guarantees it).
        grid[("t18_novelty", k)] = novelty_scores(docs)

        # r8 session additions: the round's new heavy families.
        from dot_spark.operators.graph import link_prediction
        from dot_spark.operators.multimodal import (
            image_phash,
            synthesize_real_media,
        )
        from dot_spark.operators.similarity import pq_topk
        from dot_spark.operators.textdedup import duplicated_spans

        # dd14: window-fingerprint explode + inverted index + span
        # merge. Suffixed tokens keep the window space disjoint per
        # copy, so dup-fp group sizes stay constant and the whole
        # path must scale with the explode (linear).
        grid[("dd14_substring_spans", k)] = duplicated_spans(docs)
        # dd19: the exact suffix-array twin (r13) — window text rides
        # ONE leading-byte-bucketed sort exchange instead of dd14's
        # fingerprint hash shuffle; suffixed-token upsampling keeps
        # equal-suffix runs per-copy, so the sort + run agg must
        # scale with the explode (linear), at a window-fold byte
        # premium over dd14 (the documented exactness price).
        from dot_spark.operators.textdedup import suffix_array_spans

        grid[("dd19_suffix_array_spans", k)] = suffix_array_spans(docs)
        # dd16: content-defined chunking — boundary hashing is the
        # linear term (O(tokens x window) codegen); chunk-hash groups
        # stay per-copy under the suffixed upsampling.
        from dot_spark.operators.textdedup import cdc_chunks

        grid[("dd16_cdc_chunks", k)] = cdc_chunks(docs)
        # mm6: the decode+hash ingest pass — per-image Python cost,
        # images scale K-fold (offset ids change the synthesized
        # dims/seed mix but not the per-image work).
        grid[("mm6_image_phash", k)] = image_phash(
            synthesize_real_media(docs.filter(F.col("doc_id") % 3 == 0))
        )
        # g4: support-pruned co-purchase graph (disjoint per copy) ->
        # wedge join; support pruning caps bucket sizes so wedge
        # volume grows with edges, not quadratically. Checkpoints
        # eagerly -> thunk.
        def _g4_cell(li):
            items = li.select("l_orderkey", "l_partkey").distinct()
            a = items.select(
                F.col("l_orderkey").alias("kk"), F.col("l_partkey").alias("src")
            )
            b = items.select(
                F.col("l_orderkey").alias("kk"), F.col("l_partkey").alias("dst")
            )
            pw = (
                a.join(b, "kk")
                .filter(F.col("src") < F.col("dst"))
                .groupBy("src", "dst")
                .agg(F.count(F.lit(1)).alias("wgt"))
                .filter(F.col("wgt") >= 2)
                .select("src", "dst")
            )
            edges = pw.union(
                pw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            return link_prediction(cap_degree(edges, max_degree=40), top_k=100)

        grid[("g4_link_prediction", k)] = lambda li=li_k: _g4_cell(li)
        # g5: sync LPA — disjoint per-copy subgraphs keep community
        # structure and round count constant; per-round work (label
        # table + degree-bounded counts) must scale with edges.
        # Checkpoints eagerly -> thunk. Shipped shape (cap included).
        from dot_spark.operators.graph import label_propagation

        grid[("g5_label_propagation", k)] = lambda li=li_k: label_propagation(
            cap_degree(copurchase_edges(li), max_degree=200), rounds=4
        )
        # ss9: PQ training collects a FIXED 1024-row sample (eager ->
        # thunk); the encode + asymmetric scan is the linear term.
        grid[("ss9_pq_topk", k)] = lambda e=emb, p=probes: pq_topk(
            p, e, m=16, n_codes=64, k=10, pool=30
        )

        # r8 session-4 additions: storage layout + skyline.
        from dot_spark.operators.layout import (
            chunked_layout,
            quantize,
            zorder_key,
        )
        from dot_spark.operators.relational import skyline

        # p20: the clustering rewrite's distributed rank — Morton key
        # over quantized (partkey, suppkey), 256-bucket prefix rank.
        # The row table must be touched once and the within-bucket
        # windows must stay bucket-parallel (a funnel to one task is
        # THE failure mode this cell exists to catch). The extent
        # collect is eager -> thunk.
        def _p20_cell(li):
            mx = li.agg(F.max("l_partkey"), F.max("l_suppkey")).first()
            z = (
                li.withColumn(
                    "za", quantize(F.col("l_partkey"), F.lit(mx[0]))
                )
                .withColumn("zb", quantize(F.col("l_suppkey"), F.lit(mx[1])))
                .withColumn(
                    "zval",
                    zorder_key(F.col("za"), F.col("zb")).cast("long"),
                )
            )
            return chunked_layout(
                z,
                "zval",
                ["l_orderkey", "l_partkey"],
                bucket=F.shiftright(F.col("zval"), 8),
            )

        grid[("p20_zorder_layout", k)] = lambda li=li_k: _p20_cell(li)
        # a33: skyline — distinct (min,max) cells grow linearly (the
        # per-copy key offsets keep cell spaces disjoint); the
        # per-row table is touched once, the frontier resolution runs
        # on cell/level-sized tables only.
        grid[("a33_skyline", k)] = skyline(
            li_k, "l_partkey", "l_suppkey", "l_orderkey"
        )

        # r9 additions (r8 verdict task 7): the streaming/composed
        # newcomers, pinned at the same bound as the rest.
        from pyspark.sql import Window

        from dot_spark.operators.layout import chunk_minmax
        from dot_spark.pipelines import mv_merge, mv_partials

        ev_k = upsampled_events(spark, k)
        # w15: per-user running-peak drawdown — one keyed exchange,
        # cummax window + rollup reuse the same partitioning. Users
        # grow K-fold (disjoint), so this must be flat-per-row.
        wpk = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        dd = (
            ev_k.filter(F.col("value") > 0)
            .withColumn("peak", F.max("value").over(wpk))
            .withColumn(
                "drawdown",
                F.round((F.col("peak") - F.col("value")) / F.col("peak"), 6),
            )
        )
        grid[("w15_drawdown", k)] = dd.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("drawdown"), 6).alias("max_drawdown"),
            F.round(F.avg("drawdown"), 6).alias("avg_drawdown"),
        )
        # pl14 per-batch core: the arriving delta scales K-fold while
        # the standing MV stays base-sized — the claim to pin is that
        # batch cost is delta-sized partial-agg + MV-row-sized merge,
        # never a base re-aggregation.
        base_mv = mv_partials(
            load_table(spark, "events", SF_DIR),
            keys=["user_id"],
            value_col="value",
            ts_col="ts",
        )
        grid[("pl14_mv_batch", k)] = mv_merge(
            base_mv,
            mv_partials(ev_k, keys=["user_id"], value_col="value", ts_col="ts"),
            keys=["user_id"],
        )
        # pl15 maintenance core: full-rewrite rank vs incremental
        # (delta-only) rank, both through the 256-bucket prefix +
        # chunk stats — the row table is touched once per layout and
        # the within-bucket windows must stay bucket-parallel.
        def _pl15_cell(li):
            mx = li.agg(F.max("l_partkey"), F.max("l_suppkey")).first()
            z = (
                li.withColumn("a16", quantize(F.col("l_partkey"), F.lit(mx[0])))
                .withColumn("b16", quantize(F.col("l_suppkey"), F.lit(mx[1])))
                .withColumn(
                    "zval",
                    zorder_key(F.col("a16"), F.col("b16")).cast("long"),
                )
            )
            zbucket = F.shiftright(F.col("zval"), 8)
            tb = ["l_orderkey", "l_partkey"]
            full = chunk_minmax(
                chunked_layout(z, "zval", tb, bucket=zbucket),
                ["a16", "b16"],
                "full_rewrite",
            )
            delta = z.filter(F.col("l_orderkey") % 5 == 0)
            inc = chunk_minmax(
                chunked_layout(delta, "zval", tb, bucket=zbucket),
                ["a16", "b16"],
                "incremental",
            )
            return full.unionByName(inc)

        grid[("pl15_zorder_maintain", k)] = lambda li=li_k: _pl15_cell(li)

        # r9 late additions: the two new heavy text/retrieval shapes.
        # Suffixed-token upsampling keeps each copy's term space
        # disjoint: per-copy df and bigram counts are constant, so
        # both cells must scale with the explode (linear).
        # t23 core: pair explode + pair-window count + scoring join
        # (normalize_text comes from the module-level import — an
        # inner import here would shadow it as a main() local and
        # break the earlier pl4 cell)
        def _t23_cell(docs):
            from pyspark.sql import Window as W

            toks2 = F.split(normalize_text(F.col("text")), " ")
            tk2 = docs.select("doc_id", toks2.alias("toks"))
            terms2 = tk2.select(F.explode("toks").alias("term"))
            uc2 = terms2.groupBy("term").agg(F.count(F.lit(1)).alias("c1"))
            v2 = uc2.agg(F.count(F.lit(1))).first()[0]
            pairs2 = tk2.filter(F.size("toks") >= 2).select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 1),"
                        " i -> struct(concat(toks[i - 1], ' ', toks[i]) AS pair,"
                        "             toks[i - 1] AS w1))"
                    )
                ).alias("s"),
            ).select("doc_id", F.col("s.pair").alias("pair"), F.col("s.w1").alias("w1"))
            c12 = F.count(F.lit(1)).over(W.partitionBy("pair"))
            return (
                pairs2.withColumn("c12", c12)
                .join(F.broadcast(uc2), pairs2["w1"] == uc2["term"])
                .groupBy("doc_id")
                .agg(
                    F.count(F.lit(1)).alias("n_pairs"),
                    F.sum(
                        F.log((F.col("c12") + 0.5) / (F.col("c1") + 0.5 * F.lit(float(v2))))
                    ).alias("logp"),
                )
            )

        grid[("t23_bigram_lm", k)] = lambda d=docs: _t23_cell(d)

        # ss10 lexical-channel core (the vector channel is the ss1
        # brute scan already pinned by ss2/ss7 cells): inverted-index
        # BM25 join with window-df — the query side stays FIXED
        # (copy-0 probes only; offset copies would grow it with K),
        # the corpus scales K-fold
        def _ss10_cell(docs, n_base):
            from pyspark.sql import Window as W

            toks3 = F.split(normalize_text(F.col("text")), " ")
            tk3 = docs.select("doc_id", toks3.alias("toks"))
            terms3 = tk3.select(
                "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
            )
            tf3 = terms3.groupBy("doc_id", "dl", "term").agg(
                F.count(F.lit(1)).alias("tf")
            )
            n_docs, avgdl = tk3.agg(
                F.count_distinct("doc_id"), F.avg(F.size("toks"))
            ).first()
            tfd3 = tf3.withColumn(
                "df", F.count(F.lit(1)).over(W.partitionBy("term"))
            )
            qt3 = (
                terms3.filter(
                    (F.col("doc_id") % 100 == 0) & (F.col("doc_id") < n_base)
                )
                .select(F.col("doc_id").alias("query_id"), "term")
                .distinct()
            )
            per_term = F.round(
                F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
                * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.lit(float(avgdl)))),
                6,
            )
            return (
                qt3.join(tfd3, ["term"])
                .filter(F.col("doc_id") != F.col("query_id"))
                .filter(F.col("df") * 2 <= F.lit(int(n_docs)))
                .groupBy("query_id", "doc_id")
                .agg(F.round(F.sum(per_term), 4).alias("lex"))
            )

        n_base_docs = load_table(spark, "documents", SF_DIR).count()
        grid[("ss10_bm25_channel", k)] = (
            lambda d=docs, nb=n_base_docs: _ss10_cell(d, nb)
        )

        # r10 additions (r9 verdict tasks 6+8): skew + vocab receipts.
        #
        # j6_unsalted_hot_join — the receipt behind the "AQE handles
        # the skew" claims (textdedup.py self-join, graph.py basket
        # join): one hot key carrying 10% of the K-scaled fact goes
        # through the UNSALTED shuffle join with skew thresholds
        # scaled to fixture size (production partitions clear the
        # 256 MB default naturally; tests/test_scale.py pins that the
        # split actually engages, plan-marked skew=true). alpha ~ 1
        # means the split keeps the hot partition from becoming the
        # straggler as the key grows with K.
        def _skew_cell(li):
            def thunk():
                confs = {
                    "spark.sql.autoBroadcastJoinThreshold": "-1",
                    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
                    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
                    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1MB",
                    "spark.sql.adaptive.coalescePartitions.enabled": "false",
                }
                saved = {c: spark.conf.get(c, None) for c in confs}
                for c, v in confs.items():
                    spark.conf.set(c, v)
                try:
                    fact = li.select(
                        F.when(F.col("l_orderkey") % 10 == 0, F.lit(7))
                        .otherwise(F.col("l_orderkey") % 50000)
                        .alias("jk"),
                        "l_partkey",
                    )
                    dim = spark.range(50000).select(
                        F.col("id").alias("jk"), (F.col("id") * 10).alias("v")
                    )
                    fact.join(dim, "jk").write.format("noop").mode(
                        "overwrite"
                    ).save()
                finally:
                    for c, v in saved.items():
                        if v is None:
                            spark.conf.unset(c)
                        else:
                            spark.conf.set(c, v)
                return spark.range(1)  # run() re-writes this; ~0 cost

            return thunk

        grid[("j6_unsalted_hot_join", k)] = _skew_cell(li_k)

        # t13 BPE training cells — the vocab-bounded claim measured:
        # the per-round pair count runs over the DISTINCT-WORD vocab,
        # so (a) across K the cost tracks the vocab (upsampled copies
        # have disjoint token suffixes: vocab scales K-fold along
        # with the corpus), and (b) at FIXED corpus a 10x vocab
        # blow-up (per-doc token suffix) must cost <= ~10x, never
        # quadratic — the one family the r9 verdict called argued-
        # but-unmeasured. Training is an eager driver loop -> thunks.
        from dot_spark.operators.bpe import bpe_merges

        grid[("t13_bpe_train", k)] = lambda d=docs: bpe_merges(d, k=4)
        docs_v10 = docs.select(
            "doc_id",
            F.regexp_replace(
                "text",
                r"(\S+)",
                F.concat(F.lit("$1_"), (F.col("doc_id") % 10).cast("string")),
            ).alias("text"),
        )
        grid[("t13_bpe_train_vocab10x", k)] = (
            lambda d=docs_v10: bpe_merges(d, k=4)
        )
        # t13b batched trainer at a REAL merge budget (r10 verdict
        # task 3's receipt): ROUND COUNT, not merge count, drives
        # cost. k=64/batch=16 learns 4x the merges of k=16/batch=4 in
        # the SAME 4 rounds — its time must track the k=16 cell, not
        # 4x it; k=64/batch=4 (16 rounds) is the positive control
        # that SHOULD cost ~4x. All three stay vocab-bounded across
        # corpus scale K (disjoint-suffix upsampling grows the vocab
        # linearly; per-round work is vocab-sized, never corpus-sized).
        from dot_spark.operators.bpe import bpe_merges_batched

        grid[("t13b_bpe_batched_k16_b4", k)] = (
            lambda d=docs: bpe_merges_batched(d, k=16, batch=4)
        )
        grid[("t13b_bpe_batched_k64_b16", k)] = (
            lambda d=docs: bpe_merges_batched(d, k=64, batch=16)
        )
        grid[("t13b_bpe_batched_k64_b4", k)] = (
            lambda d=docs: bpe_merges_batched(d, k=64, batch=4)
        )

        # r11 mid-round corpus-filter trio. t24: the exact-percentile
        # cut's aggregation state is bounded by DISTINCT 3-dp scores,
        # not rows — alpha must track the linear explode+join scoring
        # pass, never blow up with K. t25: zero-shuffle scan-fused
        # hash fold — the receipt that the staged-HOF form stays
        # linear (the unstaged form is O(len²) per doc and would
        # still read linear-in-K here, which is why the STAGING is
        # pinned by a plan test and the grid pins only the sweep).
        # t26: one 256-bucket agg + broadcast-back, K-fold terms.
        from dot_spark.operators.text import (
            dsir_importance,
            hashed_linear_quality,
            perplexity_prune,
        )

        grid[("t24_perplexity_prune", k)] = (
            lambda d=docs: perplexity_prune(d)
        )
        grid[("t25_hashed_linear", k)] = (
            lambda d=docs: hashed_linear_quality(d)
        )
        grid[("t26_dsir", k)] = (
            lambda d=docs: dsir_importance(d, F.col("doc_id") % 5 == 0)
        )

        # r13 additions (r12 verdict task 3): the soft-dedup
        # reweighter and the composed soft corpus build — previously
        # the one family whose scale behavior rode the dd8/pl9 cells
        # by inference (pl17's survivor LSH pair graph chains deeper
        # than pl9's: 19.3 s eager closure at sf0.1, NOTES_r12 §14).
        # Both cells run the SHIPPED bodies (textdedup.py::
        # soft_dedup_weights / pipelines.py::soft_corpus_build — the
        # same functions the dd18/pl17 queries call), and both hand
        # back the closure ROUND COUNT via cc_stats. Copies never
        # bridge (disjoint suffixed shingles), but each copy's pair
        # GRAPH differs — LSH candidacy hashes the suffixed shingle
        # text, so copy i's chains are a fresh draw — and the loop
        # runs to the max diameter over copies: expect rounds to
        # drift up slowly with K (max of K draws; measured r13:
        # dd18 13->16 for K=1->3, pl17 flat at 8 — the quality gate
        # breaks long chains), while a JUMP toward max_iterations=25
        # means copies bridged (harness bug) or pointer jumping
        # stopped shortcutting (engine bug). Rounds land in the
        # summary JSON as cc_rounds per (cell, K).
        from dot_spark.operators.textdedup import soft_dedup_weights
        from dot_spark.pipelines import soft_corpus_build

        def _dd18_cell(d, name, k):
            st: dict = {}
            out = soft_dedup_weights(d, cc_stats=st)
            cc_rounds[(name, k)] = st
            return out

        def _pl17_cell(d, name, k):
            st: dict = {}
            out = soft_corpus_build(d, cc_stats=st)
            cc_rounds[(name, k)] = st
            return out

        grid[("dd18_soft_dedup", k)] = (
            lambda d=docs, k=k: _dd18_cell(d, "dd18_soft_dedup", k)
        )
        # pl17 needs a source column for the mixture accounting; the
        # upsampled docs carry only (doc_id, text), so rejoin source
        # from the base table by base-id (copy i of doc d keeps d's
        # source — per-source mass scales K-fold, structure constant).
        src = load_table(spark, "documents", SF_DIR).select(
            F.col("doc_id").alias("base_id"), "source"
        )
        n_base = src.count()
        docs_src = (
            docs.withColumn("base_id", F.col("doc_id") % n_base)
            .join(F.broadcast(src), "base_id")
            .drop("base_id")
        )
        grid[("pl17_soft_corpus_build", k)] = (
            lambda d=docs_src, k=k: _pl17_cell(d, "pl17_soft_corpus_build", k)
        )

    # SCALE_SANITY_ONLY=<substr>[,<substr>...] restricts the grid to
    # matching cell names — targeted re-receipts without paying for
    # the full grid (interleaving discipline unchanged within the
    # selected cells).
    only = [s for s in os.environ.get("SCALE_SANITY_ONLY", "").split(",") if s]
    if only:
        grid = {
            (name, k): v
            for (name, k), v in grid.items()
            if any(s in name for s in only)
        }

    best: dict[tuple[str, int], float] = {}
    for _ in range(2):
        for cell, df in grid.items():
            sec = run(df)
            best[cell] = min(best.get(cell, sec), sec)

    results: dict[str, dict[int, float]] = {}
    for (name, k), sec in best.items():
        results.setdefault(name, {})[k] = round(sec, 2)
        print(json.dumps({"query": name, "k": k, "sec": round(sec, 2)}), flush=True)

    summary = {}
    for name, by_k in results.items():
        ks_sorted = sorted(by_k)
        lo, hi = ks_sorted[0], ks_sorted[-1]
        alpha = (
            math.log(by_k[hi] / by_k[lo]) / math.log(hi / lo) if hi > lo else None
        )
        summary[name] = {
            "times": by_k,
            "alpha": round(alpha, 2) if alpha is not None else None,
        }
        rounds_by_k = {
            k: st["rounds"]
            for (n, k), st in cc_rounds.items()
            if n == name and "rounds" in st
        }
        if rounds_by_k:
            summary[name]["cc_rounds"] = rounds_by_k
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
