"""Amplification probe: re-time operator shapes at base vs 100× data,
all synthesized distributed (spark.range — nothing driver-side), to
check empirically that no shape has a super-linear term or a skew
funnel the tiny SFs can't expose. Probe only — never a query input.

Round 2 probed the core batch shapes (window dedup, grouped agg,
top-k); round 6 adds the round-5/6 operators the verdict asked for:
the boilerplate scrub under a DELIBERATELY skewed corpus (hot lines in
30% of documents — the exact key the operator must not funnel on),
temperature mixture over power-law sources, the deterministic global
shuffle, the flagship curation pipeline, and incremental batch dedup.

Usage: python tools/amplification_probe.py [probe ...]
Prints one markdown row per probe: | name | base s | 100× s | ratio |.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

AMP = 100


def _materialize(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _docs_with_hot_lines(spark: SparkSession, n: int) -> DataFrame:
    """Docs of 4 unique 2-token lines; 30% also carry two HOT lines
    ('cookie banner' / 'accept all') — each a single line string in 30%
    of all documents, the worst-case key for the frequency stage."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("u"), F.col("id")), F.lit("alpha"),
            F.concat(F.lit("v"), F.col("id")), F.lit("beta"),
            F.concat(F.lit("w"), F.col("id")), F.lit("gamma"),
            F.concat(F.lit("x"), F.col("id")), F.lit("delta"),
        ).alias("text"))
    return base.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 < 3,
               F.concat_ws(" ", F.col("text"),
                           F.lit("cookie banner accept all")))
         .otherwise(F.col("text")))


def probe_boilerplate(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.text import (
        remove_boilerplate_lines)

    docs = _docs_with_hot_lines(spark, n)
    _materialize(remove_boilerplate_lines(docs, "doc_id", "text"))


def probe_temperature_mixture(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.dedup import (
        temperature_mixture_sample)

    # Power-law sources, SCALE-INVARIANT: the source id derives from
    # id mod 4096, so source s covers ~2^s/4096 of the corpus at EVERY
    # n — src11 is half the corpus (the skew a web crawl actually
    # has). The previous floor(log2(id)) form made the hot source's
    # identity and mass depend on n, so base and 100x runs probed
    # different distributions and the ratio partly measured the
    # distribution change, not scale.
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"),
                 F.least(F.floor(F.log2((F.col("id") % 4096) + 1)),
                         F.lit(11)).cast("int"))
         .alias("source"))
    _materialize(temperature_mixture_sample(docs, "doc_id", "source",
                                            budget=n // 10))


def probe_deterministic_shuffle(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.layout import (
        deterministic_shuffle)

    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    _materialize(deterministic_shuffle(docs, "doc_id", seed=42))


def probe_curation_pipeline(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions import text as X
    from pyspark_etl_project_spark.extensions.dedup import (
        deterministic_split)

    # ~14-token docs, 10% exact dups, en/de/es marker mix.
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.element_at(F.array(F.lit("the"), F.lit("der"), F.lit("el")),
                         (F.col("id") % 3 + 1).cast("int")),
            F.concat(F.lit("tok"), F.col("id") % (max(n // 10, 1))),
            F.lit("quick brown fox jumps over the lazy dog near"),
            F.concat(F.lit("tail"), F.col("id") % 7),
            F.lit("and of"),
        ).alias("text"))
    from pyspark.sql import Window
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    surv = (docs.withColumn("fingerprint",
                            X.normalized_fingerprint("text"))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1))
    staged = surv.select(
        "doc_id",
        X.tokens("text").alias("_w"),
        X.tokens(F.lower(F.col("text"))).alias("_lw"),
        X.word_ngrams("text", 2).alias("_g"))
    feat = staged.select(
        "doc_id",
        F.size("_w").alias("n_tokens"),
        X.lang_id_from_tokens("_lw").alias("glang"),
        X.dup_bp_from_ngrams("_g").alias("dup_bp"))
    gated = feat.filter((F.col("n_tokens") >= 10) & (F.col("dup_bp") < 4000)
                        & (F.col("glang") != "und"))
    assigned = deterministic_split(gated, "doc_id",
                                   {"train": 90, "val": 5, "test": 5})
    _materialize(assigned.groupBy("split", "glang")
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum("n_tokens").cast("long").alias("total_tokens")))


def probe_incremental_dedup(spark: SparkSession, n: int) -> None:
    from pyspark.sql import Window

    # 40% existing corpus, 60% new batch; ~20% of batch fingerprints
    # collide with the corpus, plus intra-batch dups.
    fp = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.md5((F.col("id") % (max(n * 4 // 5, 1))).cast("string"))
         .alias("fingerprint"))
    split_at = n * 2 // 5
    corpus = (fp.filter(F.col("doc_id") < split_at)
                .select("fingerprint").distinct())
    batch = fp.filter(F.col("doc_id") >= split_at)
    fresh = batch.join(corpus, "fingerprint", "left_anti")
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    _materialize(fresh.withColumn("_rn", F.row_number().over(w))
                      .filter(F.col("_rn") == 1)
                      .select("doc_id", "fingerprint"))


def probe_bloom_pruned_join(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.operators.joins import bloom_pruned_join

    # 1%-selective small side; probe checks the prune+join stays linear
    # in the BIG side (the bloom build cost is fixed at num_bits/64
    # words regardless of n).
    big = spark.range(n).select(F.col("id").alias("k"),
                                (F.col("id") % 7).alias("g"))
    small = (spark.range(max(n // 100, 1))
             .select((F.col("id") * 100).alias("k")))
    joined = bloom_pruned_join(big, small, "k")
    _materialize(joined.groupBy("g").agg(F.count(F.lit(1)).alias("c")))


def probe_manifest_skipping(spark: SparkSession, n: int) -> None:
    import shutil
    import tempfile

    from pyspark_etl_project_spark.extensions.skipping import (
        pruned_scan, write_skipping_layout)

    # Sorted write + manifest build + a 10%-selective pruned read; the
    # write is the linear term, the manifest stays one row per file.
    df = spark.range(n).select(F.col("id").alias("doc_id"),
                               (F.col("id") % 100_000).alias("v"))
    path = tempfile.mkdtemp(prefix="amp_skip_")
    try:
        write_skipping_layout(df, path, "v", num_files=16)
        sel = pruned_scan(spark, path, "v", 0, 9_999)
        _materialize(sel.groupBy().agg(F.count(F.lit(1)).alias("c")))
    finally:
        shutil.rmtree(path, ignore_errors=True)


def probe_doc_quality_scan(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.text import (
        dedup_lines_in_doc, gopher_quality_flags)

    # Map-only pass: gopher rules + intra-doc line dedup fused into one
    # scan — should be exactly linear (no shuffle at all).
    docs = _docs_with_hot_lines(spark, n).withColumn(
        "text", F.regexp_replace(F.col("text"), " ", "\n"))
    out = docs.select(
        "doc_id",
        gopher_quality_flags("text", min_words=1).alias("q"),
        F.md5(dedup_lines_in_doc("text")).alias("fp"))
    _materialize(out.select("doc_id", F.col("q.keep").alias("keep"), "fp"))


def probe_winnow_contamination(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.dedup import (
        winnowing_contamination)

    # Train grows; holdout stays benchmark-sized (100 docs) — the probe
    # checks the broadcast-join pass is linear in the train side only.
    def corpus(rows, tag):
        return spark.range(rows).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[
                F.concat(F.lit(f"{tag}{i}w"), (F.col("id") + i) % 50)
                for i in range(12)]).alias("text"))

    train = corpus(n, "t")
    holdout = corpus(100, "t")  # same vocab -> real fp collisions
    _materialize(winnowing_contamination(train, holdout,
                                         "doc_id", "text"))


def probe_exact_quantiles(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.operators.stats import exact_quantiles

    df = spark.range(n).select(F.col("id").alias("doc_id"),
                               ((F.col("id") * 2654435761) % 100_000)
                               .alias("v"))
    _materialize(exact_quantiles(df, "v", "doc_id",
                                 [0, 25, 50, 75, 90, 99, 100]))


def probe_gram_matrix(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.similarity import (
        quantized_gram_matrix)

    # n synthetic 16-dim vectors; the shuffle key space is the constant
    # 136 cells, so time must scale with the map-side explode only.
    vecs = spark.range(n).select(
        F.transform(F.sequence(F.lit(1), F.lit(16)),
                    lambda i: ((F.col("id") * 31 + i) % 1000 / 1000.0)
                    .cast("float")).alias("embedding"))
    _materialize(quantized_gram_matrix(vecs, "embedding", dims=16))


def _zipf_docs(spark: SparkSession, n: int) -> DataFrame:
    """Docs of 20 tokens: ~80% drawn from a tiny skewed head vocabulary
    (log2-bucketed — 'w1' alone covers ~a quarter of all tokens, the
    frequent-token join skew rare_token_scores must survive) and ~20%
    singleton rare tokens (the vocabulary tail that makes the corpus
    vocab grow linearly with the data)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda i: F.when(
                (F.col("id") * 7 + i) % 5 < 4,
                F.concat(F.lit("w"), F.floor(F.log2(
                    (F.col("id") * 31 + i) % 4096 + 2)).cast("int")))
            .otherwise(F.concat(F.lit("r"),
                                (F.col("id") * 20 + i).cast("string")))
        )).alias("text"))


def probe_rare_token_scores(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.text import rare_token_scores

    _materialize(rare_token_scores(_zipf_docs(spark, n), "doc_id", "text"))


def probe_bpe_train_rounds(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.text import bpe_train

    # Two merge rounds; the per-round cost must track the VOCABULARY
    # (which the rare-token tail makes grow with n), never the corpus.
    bpe_train(_zipf_docs(spark, n), "text", n_merges=2).collect()


def probe_blocklist_filter(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.web import blocklist_verdicts

    # 1000-entry blocklist (broadcast) over n URLs; ~10% of hosts match.
    urls = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://sub"), (F.col("id") % 3).cast("string"),
                 F.lit(".host"), (F.col("id") % 10_000).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string"))
         .alias("url"))
    bl = [f"host{i}.example.com" for i in range(1000)]
    _materialize(blocklist_verdicts(urls, "doc_id", "url", bl))


def probe_dup_span_hot_passage(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.dedup import (
        duplicate_span_stats)

    # 16-token docs; 30% carry the SAME 10-token passage, so every
    # k-gram of the passage occurs in 0.3n docs — the hot-gram skew the
    # groupBy+semi-join marking must absorb (a gram-partitioned count
    # window would funnel 0.3n rows into one task here).
    passage = "cookie banner please accept all terms to continue reading now"
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 3,
               F.concat_ws(" ",
                           F.concat(F.lit("u"), F.col("id")),
                           F.lit(passage),
                           F.concat(F.lit("v"), F.col("id")),
                           F.lit("alpha beta gamma delta")))
         .otherwise(F.concat_ws(" ", *[
             F.concat(F.lit(f"t{i}x"), F.col("id")) for i in range(16)]))
         .alias("text"))
    _materialize(duplicate_span_stats(docs, "doc_id", "text", k=8))


def probe_topk_neighbors(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.dedup import (
        jaccard_pairs, topk_neighbors, word_shingles)

    # Clusters of 4 near-identical docs (shared 6-token core + 2 unique
    # tokens) — candidate pairs stay bounded per shingle by the
    # max_doc_freq cap while every doc has real neighbors to rank.
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ",
                    F.lit("shared core tokens run the corpus"),
                    F.concat(F.lit("c"), (F.col("id") / 4).cast("long")),
                    F.concat(F.lit("q"), F.col("id")))
         .alias("text"))
    sh = docs.select("doc_id", word_shingles("text", 3).alias("sh"))
    pairs = jaccard_pairs(sh, "doc_id", "sh", threshold_num=0,
                          threshold_den=1, max_doc_freq=50)
    _materialize(topk_neighbors(pairs, k=3))


def probe_curriculum_buckets(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.text import curriculum_buckets

    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 2654435761) % 4096).alias("n_tokens"))
    _materialize(curriculum_buckets(docs, "doc_id", "n_tokens", 10))



def probe_cms_sketch(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.text import cms_heavy_hitters

    # Zipf-ish head plus a growing unique tail: the sketch table must
    # stay 4x1024 cells while the corpus and vocabulary grow 100x.
    docs = spark.range(n).select(
        F.concat_ws(" ",
                    F.lit("the of and"),
                    F.concat(F.lit("w"), F.col("id") % (max(n // 20, 1))),
                    F.concat(F.lit("u"), F.col("id"))).alias("text"))
    _materialize(cms_heavy_hitters(docs, "text", top_k=20))


def probe_kmv_sketch(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.text import kmv_distinct_sketch

    docs = spark.range(n).select(
        (F.col("id") % 12).cast("string").alias("grp"),
        F.concat(F.lit("v"), (F.col("id") * 2654435761) % (n * 4))
         .alias("v"))
    _materialize(kmv_distinct_sketch(docs, "grp", "v", k=64))


def probe_column_stats(spark: SparkSession, n: int) -> None:
    docs = spark.range(n).select(
        (F.col("id") % 50).cast("double").alias("a"),
        (F.col("id") % 7).cast("string").alias("b"))
    _materialize(docs.agg(
        F.countDistinct("a"), F.min("a"), F.max("a"),
        F.countDistinct("b"), F.min("b"), F.max("b")))



def probe_triangle_count(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.graph import triangle_count

    # Ring of 4-cliques plus a HUB connected to every 100th node — the
    # hub is the wedge-explosion hazard the degree orientation must
    # defuse (its neighbors orient INTO it, so it spawns no wedges).
    base = spark.range(n)
    ring = base.select(F.col("id").alias("src"),
                       ((F.col("id") + 1) % n).alias("dst"))
    clique = base.select(F.col("id").alias("src"),
                         ((F.col("id") + 2) % n).alias("dst"))
    clique2 = base.select(F.col("id").alias("src"),
                          ((F.col("id") + 3) % n).alias("dst"))
    hub = (base.filter(F.col("id") % 100 == 0)
           .select(F.lit(n + 1).alias("src"), F.col("id").alias("dst")))
    edges = ring.unionByName(clique).unionByName(clique2).unionByName(hub)
    triangle_count(edges).collect()


def probe_label_propagation(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.graph import (
        label_propagation_majority)

    nodes = spark.range(n).select(F.col("id"))
    edges = (nodes.select(F.col("id").alias("src"),
                          ((F.col("id") + 1) % n).alias("dst"))
             .unionByName(nodes.select(
                 F.col("id").alias("src"),
                 ((F.col("id") * 17 + 3) % n).alias("dst"))))
    _materialize(label_propagation_majority(nodes, edges, n_iter=2))


def _synth_vectors(spark: SparkSession, n: int) -> DataFrame:
    """n pseudo-random 16-dim vectors with labels, synthesized
    distributed (hash-derived coordinates in [-1, 1))."""
    dims = [((F.hash(F.col("id") + d) % 1000) / F.lit(500.0) - 1.0)
            .cast("float") for d in range(16)]
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*dims).alias("embedding"),
        (F.col("id") % 16).cast("int").alias("label"))


def probe_hard_negatives_exact(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.similarity import (
        hard_negatives)

    emb = _synth_vectors(spark, n)
    queries = emb.filter("vec_id < 8").localCheckpoint(eager=False)
    corpus = emb.filter("vec_id >= 8")
    _materialize(hard_negatives(corpus, queries, k=3))


def probe_hard_negatives_lsh(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.extensions.similarity import (
        hard_negatives)

    emb = _synth_vectors(spark, n)
    queries = emb.filter("vec_id < 8").localCheckpoint(eager=False)
    corpus = emb.filter("vec_id >= 8")
    _materialize(hard_negatives(corpus, queries, k=3, prefilter="lsh",
                                num_bits=8, probe_hamming=1))


def probe_partial_stats_merge(spark: SparkSession, n: int) -> None:
    from pyspark_etl_project_spark.operators.stats import (
        column_stats_merge, column_stats_partials)

    df = spark.range(n).select(
        F.col("id"),
        (F.hash("id") % (n // 10 + 7)).cast("long").alias("v"))
    scalar, hashes = column_stats_partials(df, F.col("id") % 32,
                                           F.col("v"))
    _materialize(column_stats_merge(scalar, hashes))


_SCD2_BASE = 50_000
_SCD2_PROBE: dict[int, list] = {}  # n -> [mart_path, batch_keys, nb, calls]


def _scd2_probe_setup(spark: SparkSession, sizes: list[int]) -> None:
    """Build one probe mart per size, UNTIMED (runs during the
    harness's base-scale warmup call, which prepares both scales).
    Buckets follow the SCALE.md sizing rule — num_buckets grows with
    the mart so bucket SIZE stays ~1.5k rows — and the seed is
    pre-repartitioned on the bucket expression so the partitioned
    write emits one file per bucket, not tasks×buckets."""
    import tempfile

    from pyspark_etl_project_spark.functions.hashing import row_fingerprint
    from pyspark_etl_project_spark.operators.scd2 import (
        mart_bucket, write_mart)

    for size in sizes:
        if size in _SCD2_PROBE:
            continue
        nb = max(32, (size * 32) // _SCD2_BASE)
        seed = (spark.range(size).select(
            F.col("id").alias("csd_id"),
            F.concat(F.lit("K-"), F.col("id")).alias("ssi"),
            (F.col("id") * 7).alias("v"),
            F.lit(1).alias("ACTIVE_FLAG"),
            F.lit("2020-01-01 00:00:00").cast("timestamp")
             .alias("START_DATE"),
            F.lit("2099-12-31 00:00:00").cast("timestamp")
             .alias("END_DATE"))
            .withColumn("SOURCE_HASH_KEY",
                        row_fingerprint(sorted(["ssi", "v"])))
            .repartition(min(nb, 4096), mart_bucket("ssi", nb)))
        path = tempfile.mkdtemp(prefix=f"scd2probe{size}_") + "/mart"
        write_mart(seed, path, partition_col=None, key="ssi",
                   num_buckets=nb)
        keys = [r["ssi"] for r in
                (spark.range(size)
                 .select(F.concat(F.lit("K-"), F.col("id")).alias("ssi"))
                 .filter(mart_bucket("ssi", nb) == 0)
                 .limit(1000).collect())]
        _SCD2_PROBE[size] = [path, keys, nb, 0]


def probe_scd2_merge_batch(spark: SparkSession, n: int) -> None:
    """Streaming SCD2 foreachBatch merge: a FIXED 1000-key update batch
    (all keys in one bucket) against a mart of n rows. Per-batch cost
    must be O(touched bucket + batch) — ~FLAT as the mart scales 100×
    — because the mart read partition-prunes to the touched buckets,
    the write dynamic-overwrites only those buckets, and the surrogate
    offset is the caller's high-watermark (no full-mart MAX). Each call
    merges NEW values (the call counter salts them) so the timed run
    exercises the real UPDATE path, not the all-DUPLICATE skip.
    check_layout=False mirrors the foreach_batch_scd2 run loop, which
    verifies the layout once at stream start — the per-batch probe
    would otherwise re-list every bucket dir (O(num_buckets) metadata),
    the exact cost the once-per-run check removes."""
    from pyspark_etl_project_spark.streaming.ingest import scd2_merge_batch

    _scd2_probe_setup(spark, [n, n * AMP] if n == _SCD2_BASE else [n])
    state = _SCD2_PROBE[n]
    path, keys, nb = state[0], state[1], state[2]
    state[3] += 1
    call = state[3]
    batch = (spark.createDataFrame([(k,) for k in keys], "ssi string")
             .withColumn("v", -(F.lit(call) * F.lit(1_000_000)
                                + F.pmod(F.xxhash64("ssi"),
                                         F.lit(1_000_000)))))
    scd2_merge_batch(spark, batch, path, run_ts="2024-01-01 00:00:00",
                     key="ssi", surrogate_col="csd_id", num_buckets=nb,
                     partition_col=None,
                     surrogate_offset=n + call * 1000,
                     check_layout=False)


_BAND_BASE = 10_000
_BAND_PROBE: dict[int, list] = {}  # n -> [bands_path, nb, calls]


def _band_probe_setup(spark: SparkSession, sizes: list[int],
                      store: dict | None = None) -> None:
    """One pre-built band index per size, UNTIMED. Bucket count grows
    with the index (bucket SIZE constant — the same sizing rule as the
    mart probe), synthesized directly in index shape so setup doesn't
    pay 1M doc minhashes just to measure the guard."""
    import tempfile

    from pyspark_etl_project_spark.streaming.ingest import DOC_BUCKET_COL

    if store is None:
        store = _BAND_PROBE
    for size in sizes:
        if size in store:
            continue
        nb = max(16, (size * 16) // _BAND_BASE)
        idx = (spark.range(size)
               .select(F.col("id").alias("doc_id"),
                       F.explode(F.array(*[F.lit(i) for i in range(4)]))
                        .alias("band_id"))
               .select("doc_id", "band_id",
                       F.md5(F.concat_ws("|", "doc_id", "band_id"))
                        .alias("band_hash"),
                       F.pmod(F.xxhash64("doc_id"), F.lit(nb))
                        .cast("int").alias(DOC_BUCKET_COL))
               .repartition(min(nb, 4096), F.col(DOC_BUCKET_COL)))
        path = tempfile.mkdtemp(prefix=f"bandprobe{size}_") + "/bands"
        idx.write.mode("append").partitionBy(DOC_BUCKET_COL).parquet(path)
        store[size] = [path, nb, 0]


def probe_band_index_batch(spark: SparkSession, n: int) -> None:
    """Streaming band-index maintenance: a FIXED 50-doc fresh batch
    against an index of n docs, measured in STREAM STEADY STATE — the
    bucket-dir set is listed once at setup and threaded through calls,
    exactly as foreach_batch_band_index maintains it across
    micro-batches (the once-per-run listing is amortized over the
    stream's lifetime, like the SCD2 probe's once-per-run layout
    check). The per-batch cost must stay ~FLAT as the index scales
    100×: the already-indexed probe reads only the ≤50 bucket dirs the
    batch's docs hash to, and bucket size is held constant by the
    sizing rule — where the flat (unpartitioned) layout re-scanned the
    whole index's doc_id column per batch, growing without bound over
    the stream's lifetime. Fresh doc_ids per call (call counter salt)
    so the timed run exercises the real probe + append path."""
    from pyspark_etl_project_spark.streaming.ingest import (
        _band_index_existing_buckets, band_index_batch)

    _band_probe_setup(spark, [n, n * AMP] if n == _BAND_BASE else [n])
    state = _BAND_PROBE[n]
    path, nb = state[0], state[1]
    if len(state) == 3:  # lazily attach the per-run bucket-dir set
        state.append(_band_index_existing_buckets(spark, path, nb))
    existing = state[3]
    state[2] += 1
    base_id = 10_000_000 * state[2] + n
    words = [F.substring(F.md5((F.col("id") + F.lit(base_id + w))
                               .cast("string")), 1, 8)
             for w in range(6)]
    docs = (spark.range(50)
            .select((F.col("id") + F.lit(base_id)).alias("doc_id"),
                    F.concat_ws(" ", *words).alias("text")))
    existing.update(band_index_batch(docs, path, num_buckets=nb,
                                     existing_buckets=set(existing)))


_BAND_COMPACT_PROBE: dict[int, list] = {}


def probe_band_index_compact(spark: SparkSession, n: int) -> None:
    """Band-index retention sweep at 100× BUCKET count (the sizing
    rule scales buckets with the index, so a 100× index is a 100×-dir
    sweep with constant rows per bucket). Cost is O(buckets) per-bucket
    rewrite jobs amortized over the driver-thread pool BY DESIGN — so
    the expected ratio is ~linear-in-buckets; what the probe falsifies
    is a super-linear term (a per-bucket re-listing of the whole
    index, a guard re-walk per bucket). Re-compacting an
    already-compacted index rewrites 1 file -> 1 file per bucket —
    idempotent, so warmup/timed calls measure the same per-bucket
    work. Uses its own index store: compaction must not interleave
    with probe_band_index_batch's live append stream."""
    from pyspark_etl_project_spark.streaming.ingest import (
        compact_band_index)

    _band_probe_setup(spark, [n, n * AMP] if n == _BAND_BASE else [n],
                      _BAND_COMPACT_PROBE)
    path, nb = _BAND_COMPACT_PROBE[n][0], _BAND_COMPACT_PROBE[n][1]
    compact_band_index(spark, path, num_buckets=nb, files_per_bucket=1)


_VAC_BASE = 50_000
_VAC_PROBE: dict[int, list] = {}  # n -> [nb, path, path, ...] (paths are a queue)


def _vac_probe_setup(spark: SparkSession, sizes: list[int],
                     count: int | None = None) -> None:
    """Pre-write the marts to vacuum, UNTIMED (first call at base scale
    is the harness's warmup). vacuum_mart_path is destructive, so each
    timed call consumes its own fresh mart: two per size at base
    (warmup + timed), one at 100× — or exactly ``count`` when the
    caller knows how many it needs (the lazy rebuild needs one).
    Bucket count follows the SCALE.md sizing rule (bucket SIZE
    constant), and expiry is a function of the BUCKET id so a
    deterministic third of the buckets is fully dead — the
    dead-subtree deletion path — while the rest hold mixed expiry
    (the rewrite + survivor-collect path)."""
    import tempfile

    from pyspark_etl_project_spark.operators.scd2 import (
        mart_bucket, write_mart)

    for size in sizes:
        if size in _VAC_PROBE:
            continue
        nb = max(32, (size * 32) // _VAC_BASE)
        b = mart_bucket("ssi", nb)
        state: list = [nb]
        for _ in range(count if count is not None
                       else (2 if size == _VAC_BASE else 1)):
            seed = (spark.range(size).select(
                F.col("id").alias("csd_id"),
                F.concat(F.lit("K-"), F.col("id")).alias("ssi"),
                F.lit(1).alias("ACTIVE_FLAG"),
                F.lit("2020-01-01 00:00:00").cast("timestamp")
                 .alias("START_DATE"))
                .withColumn(
                    "END_DATE",
                    F.when(b % 3 == 0, F.lit("2020-06-01 00:00:00"))
                     .when(F.col("csd_id") % 2 == 0,
                           F.lit("2021-06-01 00:00:00"))
                     .otherwise(F.lit("2099-12-31 00:00:00"))
                     .cast("timestamp"))
                .repartition(min(nb, 4096), b))
            path = tempfile.mkdtemp(prefix=f"vacprobe{size}_") + "/mart"
            write_mart(seed, path, partition_col=None, key="ssi",
                       num_buckets=nb)
            state.append(path)
        _VAC_PROBE[size] = state


def probe_vacuum_mart_path(spark: SparkSession, n: int) -> None:
    """On-disk SCD2 retention: vacuum a mart of n rows where 1/3 of the
    buckets are fully dead and the rest are half-expired. The dominant
    term is the survivor rewrite — inherently O(mart) — so the 100×
    ratio is expected ~linear-or-below (fixed overhead amortizes); what
    the probe falsifies is anything SUPER-linear hiding in the sweep:
    the survivor collect (bounded at sources × buckets), the dir walk
    (O(live dirs), dead subtrees pruned unlisted), or a skew funnel in
    the rewrite shuffle."""
    from pyspark_etl_project_spark.operators.scd2 import vacuum_mart_path

    _vac_probe_setup(spark, [n, n * AMP] if n == _VAC_BASE else [n])
    state = _VAC_PROBE[n]
    if len(state) < 2:
        # The pre-built queue is sized to the harness's exact
        # warmup + timed-base + timed-100x call pattern; any extra
        # invocation (an added rep, reuse from another harness) would
        # otherwise die on a bare pop IndexError with no diagnostic.
        # Rebuild lazily instead — vacuum is destructive, so a fresh
        # mart per call is the only correct replay anyway. count=1:
        # the extra call needs exactly one mart, not the base-size
        # warmup+timed pair.
        del _VAC_PROBE[n]
        _vac_probe_setup(spark, [n], count=1)
        state = _VAC_PROBE[n]
    nb, path = state[0], state.pop(1)
    vacuum_mart_path(spark, path, "2023-01-01 00:00:00",
                     partition_col=None, key="ssi", num_buckets=nb)


_VAC_SPARSE_PROBE: dict[int, list] = {}


def _vac_sparse_probe_setup(spark: SparkSession, sizes: list[int],
                            count: int | None = None) -> None:
    """Marts where expiry is SPARSE — only bucket 0 holds any expired
    rows (half of them), every other bucket is fully alive. The
    expiry-pruned vacuum should classify all-but-one leaf clean and
    rewrite ONE bucket regardless of mart size."""
    import tempfile

    from pyspark_etl_project_spark.operators.scd2 import (
        mart_bucket, write_mart)

    for size in sizes:
        if size in _VAC_SPARSE_PROBE:
            continue
        nb = max(32, (size * 32) // _VAC_BASE)
        b = mart_bucket("ssi", nb)
        state: list = [nb]
        for _ in range(count if count is not None
                       else (2 if size == _VAC_BASE else 1)):
            seed = (spark.range(size).select(
                F.col("id").alias("csd_id"),
                F.concat(F.lit("K-"), F.col("id")).alias("ssi"),
                F.lit(1).alias("ACTIVE_FLAG"),
                F.lit("2020-01-01 00:00:00").cast("timestamp")
                 .alias("START_DATE"))
                .withColumn(
                    "END_DATE",
                    F.when((b == 0) & (F.col("csd_id") % 2 == 0),
                           F.lit("2020-06-01 00:00:00"))
                     .otherwise(F.lit("2099-12-31 00:00:00"))
                     .cast("timestamp"))
                .repartition(min(nb, 4096), b))
            path = tempfile.mkdtemp(prefix=f"vacsparse{size}_") + "/mart"
            write_mart(seed, path, partition_col=None, key="ssi",
                       num_buckets=nb)
            state.append(path)
        _VAC_SPARSE_PROBE[size] = state


def probe_vacuum_sparse_expiry(spark: SparkSession, n: int) -> None:
    """The expiry-pruned vacuum's headline case: expired rows live in
    ONE bucket out of 32-per-base-unit, so the pass should pay the
    narrow stats scan (END_DATE column only — linear but a sliver of
    mart bytes) plus a SINGLE-leaf rewrite (constant). Before the
    round-13 pruning, this vacuum rewrote the whole mart — the probe
    falsifies any regression back toward O(mart) rewrite by comparing
    against probe_vacuum_mart_path's rewrite-dominated ratio and
    absolute times."""
    from pyspark_etl_project_spark.operators.scd2 import vacuum_mart_path

    _vac_sparse_probe_setup(spark,
                            [n, n * AMP] if n == _VAC_BASE else [n])
    state = _VAC_SPARSE_PROBE[n]
    if len(state) < 2:
        del _VAC_SPARSE_PROBE[n]
        _vac_sparse_probe_setup(spark, [n], count=1)
        state = _VAC_SPARSE_PROBE[n]
    nb, path = state[0], state.pop(1)
    vacuum_mart_path(spark, path, "2023-01-01 00:00:00",
                     partition_col=None, key="ssi", num_buckets=nb)


_VAC_WIDEN_PROBE: dict[int, list] = {}


def _vac_widen_probe_setup(spark: SparkSession, sizes: list[int],
                           count: int | None = None) -> None:
    """TYPE-evolved marts for the widening-heal probe, UNTIMED: each
    mart is two loads in separate SRC partitions — csd_id INT in L1,
    LONG (above 2^31) in L2 — so the vacuum's mergeSchema probe
    refuses (CANNOT_MERGE_SCHEMAS) and the heal path runs: one
    globStatus over the leaf dirs, a distributed pyarrow footer scan,
    then the widened rewrite. Same sizing/expiry rules as
    _vac_probe_setup (bucket SIZE constant; a deterministic third of
    the buckets fully dead)."""
    import tempfile

    from pyspark_etl_project_spark.operators.scd2 import (
        mart_bucket, write_mart)

    for size in sizes:
        if size in _VAC_WIDEN_PROBE:
            continue
        nb = max(32, (size * 32) // _VAC_BASE)
        b = mart_bucket("ssi", nb)
        state: list = [nb]
        half = size // 2

        def seed(lo: int, hi: int, cast_type: str, off: int,
                 src: str):
            return (spark.range(lo, hi).select(
                (F.col("id") + off).cast(cast_type).alias("csd_id"),
                F.concat(F.lit("K-"), F.col("id")).alias("ssi"),
                F.lit(src).alias("SRC"),
                F.lit(1).alias("ACTIVE_FLAG"),
                F.lit("2020-01-01 00:00:00").cast("timestamp")
                 .alias("START_DATE"))
                .withColumn(
                    "END_DATE",
                    F.when(b % 3 == 0, F.lit("2020-06-01 00:00:00"))
                     .when(F.col("csd_id") % 2 == 0,
                           F.lit("2021-06-01 00:00:00"))
                     .otherwise(F.lit("2099-12-31 00:00:00"))
                     .cast("timestamp"))
                .repartition(min(nb, 4096), b))

        for _ in range(count if count is not None
                       else (2 if size == _VAC_BASE else 1)):
            path = tempfile.mkdtemp(prefix=f"vacwiden{size}_") + "/mart"
            write_mart(seed(0, half, "int", 0, "L1"), path,
                       partition_col="SRC", key="ssi", num_buckets=nb)
            write_mart(seed(half, size, "long", 2 ** 40, "L2"), path,
                       partition_col="SRC", key="ssi", num_buckets=nb)
            state.append(path)
        _VAC_WIDEN_PROBE[size] = state


def probe_vacuum_widened_heal(spark: SparkSession, n: int) -> None:
    """The round-13 heal path end-to-end on a type-evolved mart: the
    merge-refusal catch, the leaf-dir glob (bounded at 2 sources ×
    buckets), the distributed footer scan (O(files), on executors),
    and the widened survivor rewrite. Expected ~linear like the plain
    vacuum (rewrite dominates); what the probe falsifies is a
    super-linear term in the footer fan-out (a per-file driver
    round-trip, a footer re-read per bucket) or a widened-read decode
    cliff (INT32 pages upcast to long in the vectorized reader)."""
    from pyspark_etl_project_spark.operators.scd2 import vacuum_mart_path

    _vac_widen_probe_setup(spark,
                           [n, n * AMP] if n == _VAC_BASE else [n])
    state = _VAC_WIDEN_PROBE[n]
    if len(state) < 2:
        # Same lazy-rebuild contract as probe_vacuum_mart_path: the
        # destructive pass consumes one fresh mart per call.
        del _VAC_WIDEN_PROBE[n]
        _vac_widen_probe_setup(spark, [n], count=1)
        state = _VAC_WIDEN_PROBE[n]
    nb, path = state[0], state.pop(1)
    vacuum_mart_path(spark, path, "2023-01-01 00:00:00",
                     partition_col="SRC", key="ssi", num_buckets=nb)


def probe_cross_source_overlap(spark: SparkSession, n: int) -> None:
    """Pairwise source-overlap matrix under the WORST-case fingerprint
    distribution: every document carries the same 10-token boilerplate
    phrase, so one winnowing fingerprint is corpus-universal. The
    operator's scale claim (extensions/dedup.py:cross_source_overlap)
    is that the fp self-join cannot explode because the (src, fp)
    DISTINCT bounds every per-fp group by the NUMBER OF SOURCES (20
    here) — NOT by how many documents share the fingerprint. If that
    claim were wrong, the universal fp's group would grow with n and
    the pair join would go quadratic; the probe falsifies it by
    timing base vs 100× docs (expected ~linear: the winnowing pass
    dominates)."""
    from pyspark_etl_project_spark.extensions.dedup import (
        cross_source_overlap)

    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 20)).alias("source"),
        # Universal 10-token prefix (every window inside it selects the
        # same gram minima in every doc) + per-doc unique tail.
        F.concat_ws(
            " ",
            F.lit("terms of service apply to all content on this site"),
            F.concat(F.lit("u"), F.col("id")), F.lit("alpha"),
            F.concat(F.lit("v"), F.col("id")), F.lit("beta"),
            F.concat(F.lit("w"), F.col("id")), F.lit("gamma"),
        ).alias("text"))
    _materialize(cross_source_overlap(docs, "doc_id", "text", "source"))


def probe_tfidf_pairs_universal_term(spark: SparkSession, n: int) -> None:
    """The tfidf_doc_similarity_topk plan shape (plans/extensions.py:
    tfidf_doc_similarity_topk_q — tokenize → tf → document-frequency
    cap 100 → inverted-index pair join → top-20) under the worst-case
    vocabulary: three tokens appear in EVERY document. Without the
    dfreq <= 100 gate, each universal token alone would produce
    n²/2 join rows; with it, the universal tokens are dropped before
    the self-join and only the engineered pair tokens (each shared by
    exactly 2 docs) reach it. The df groupBy itself sees the hot keys
    — map-side combine must absorb them. Expected ~linear."""
    from pyspark_etl_project_spark.extensions import text as X

    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("the of and"),
            F.concat(F.lit("p"), (F.col("id") / 2).cast("long")),
            F.concat(F.lit("u"), F.col("id")),
        ).alias("text"))
    tok = (docs.select("doc_id",
                       F.explode(X.tokens(F.col("text"))).alias("t"))
               .groupBy("doc_id", "t")
               .agg(F.count(F.lit(1)).alias("tf"))
               .localCheckpoint(eager=False))
    keep = (tok.groupBy("t").agg(F.count(F.lit(1)).alias("dfreq"))
               .filter(F.col("dfreq") <= 100))
    w = (tok.join(keep, "t")
            .select("doc_id", "t",
                    F.expr("tf * (1000000 div dfreq)").alias("wgt")))
    pairs = (w.alias("a")
             .join(w.alias("b").hint("shuffle_hash"),
                   (F.col("a.t") == F.col("b.t"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("id_a"),
                      F.col("b.doc_id").alias("id_b"))
             .agg(F.sum(F.col("a.wgt") * F.col("b.wgt")).cast("long")
                  .alias("score")))
    _materialize(pairs.orderBy(F.desc("score"), "id_a", "id_b").limit(20))


def probe_pagerank_hub(spark: SparkSession, n: int) -> None:
    """Fixed-point PageRank (extensions/graph.py:pagerank_integer) on a
    ring graph where 1% of all nodes ALSO link to node 0 — the hub's
    in-degree grows with n, making it the hot key of every iteration's
    contribution groupBy. Map-side partial aggregation must absorb it
    (an un-combined shuffle would funnel n/100 rows into one reducer);
    the per-iteration score join is co-partitioned after iteration 1.
    Expected ~linear; completes the iterative-graph probe family
    (label propagation, triangle count)."""
    from pyspark_etl_project_spark.extensions.graph import pagerank_integer

    nodes = spark.range(n).select(F.col("id"))
    ring = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst"))
    to_hub = (spark.range(n).filter(F.col("id") % 100 == 1)
              .select(F.col("id").alias("src"),
                      F.lit(0).cast("long").alias("dst")))
    _materialize(pagerank_integer(nodes, ring.unionByName(to_hub),
                                  n_iter=3))


def probe_leakage_safe_split(spark: SparkSession, n: int) -> None:
    """Cluster-then-split under the two adversarial graph shapes at
    once: (a) chain clusters of 5 (constant diameter 4 — the label
    propagation round count must NOT grow with n) and (b) one STAR
    cluster covering 1% of all docs (a hub label that is a hot groupBy
    key in every propagation round — the skew funnel a tiny SF never
    exposes). The scale claim (extensions/dedup.py:leakage_safe_split)
    is pointer-doubled label propagation O(log diameter) + a pure map
    split expression; expected ratio ~linear."""
    from pyspark_etl_project_spark.extensions.dedup import (
        leakage_safe_split)

    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    chains = (spark.range(n - 1)
              .filter((F.col("id") % 5 != 4) & (F.col("id") % 100 != 0))
              .select(F.col("id").alias("id_a"),
                      (F.col("id") + 1).alias("id_b")))
    hub = (spark.range(n).filter((F.col("id") % 100 == 0)
                                 & (F.col("id") > 0))
           .select(F.lit(0).cast("long").alias("id_a"),
                   F.col("id").alias("id_b")))
    pairs = chains.unionByName(hub)
    _materialize(leakage_safe_split(pairs, ids,
                                    {"train": 90, "val": 5, "test": 5}))


def _one_hot_key_feed(spark: SparkSession, n: int) -> DataFrame:
    """The pathological repeated-key feed from SCALE.md's sizing note:
    HALF of all rows carry ONE natural key (a feed stuck re-sending a
    single record), the other half unique keys. At 100× of the 100k
    base the hot key holds 5M rows — the worst case for any plan that
    must co-locate a key's duplicates."""
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT"))
         .otherwise(F.concat(F.lit("k"), F.col("id"))).alias("nat_key"),
        F.col("id").alias("seq"),
        (F.col("id") % 97).alias("payload"))


def probe_keep_latest_window_hot_key(spark: SparkSession, n: int) -> None:
    """keep_latest DEFAULT arm (window row_number) under the one-hot-key
    feed. Every duplicate of the hot key is shuffled to one reducer and
    sorted there — the straggler shape the max_by escape hatch exists
    for. Measured, not assumed: this probe quantifies how bad the
    default gets so the sizing-note advice rests on a number."""
    from pyspark_etl_project_spark.operators.dedup import keep_latest

    _materialize(keep_latest(_one_hot_key_feed(spark, n),
                             "nat_key", "seq"))


def probe_keep_latest_maxby_hot_key(spark: SparkSession, n: int) -> None:
    """keep_latest(use_max_by=True) on the same feed: groupBy + max_by
    partial-aggregates map-side, so each map partition emits ONE row
    for the hot key and the reducer sees ~n_partitions rows instead of
    n/2. Expected at-or-below linear with a better constant than the
    window arm; value-equivalence of the arms is pinned separately by
    the gate query window_dedup_latest_maxby."""
    from pyspark_etl_project_spark.operators.dedup import keep_latest

    _materialize(keep_latest(_one_hot_key_feed(spark, n),
                             "nat_key", "seq", use_max_by=True))


PROBES = {
    # name: (fn, base_n)  — 100× runs at base_n * AMP
    "boilerplate_scrub_30pct_hot_line": (probe_boilerplate, 10_000),
    "temperature_mixture_powerlaw": (probe_temperature_mixture, 100_000),
    "deterministic_shuffle": (probe_deterministic_shuffle, 100_000),
    "curation_pipeline": (probe_curation_pipeline, 10_000),
    "incremental_dedup": (probe_incremental_dedup, 100_000),
    # round-6 ops
    "bloom_pruned_join_1pct": (probe_bloom_pruned_join, 100_000),
    "manifest_skipping_write_read": (probe_manifest_skipping, 100_000),
    "doc_quality_scan_maponly": (probe_doc_quality_scan, 10_000),
    "gram_matrix_16d": (probe_gram_matrix, 10_000),
    "winnowing_contamination_fixed_holdout": (probe_winnow_contamination,
                                              2_000),
    "exact_quantiles": (probe_exact_quantiles, 100_000),
    "rare_token_scores_zipf": (probe_rare_token_scores, 10_000),
    "bpe_train_2rounds_growing_vocab": (probe_bpe_train_rounds, 10_000),
    "blocklist_filter_1k_entries": (probe_blocklist_filter, 100_000),
    # round-6 second wave
    "dup_span_30pct_hot_passage": (probe_dup_span_hot_passage, 10_000),
    "jaccard_topk_neighbors_clustered": (probe_topk_neighbors, 10_000),
    "curriculum_buckets_rangeparted": (probe_curriculum_buckets, 100_000),
    "cms_sketch_constant_cells": (probe_cms_sketch, 10_000),
    "kmv_sketch_64min": (probe_kmv_sketch, 100_000),
    "column_stats_one_pass": (probe_column_stats, 100_000),
    "triangle_count_hub": (probe_triangle_count, 10_000),
    "label_propagation_2rounds": (probe_label_propagation, 10_000),
    # round-7 ops
    "hard_negatives_exact_8q": (probe_hard_negatives_exact, 100_000),
    "hard_negatives_lsh_r1_8q": (probe_hard_negatives_lsh, 100_000),
    "partial_stats_merge_32parts": (probe_partial_stats_merge, 100_000),
    # round-9: the redelivery-hardened streaming merge
    "scd2_merge_batch_1k_arrivals": (probe_scd2_merge_batch, _SCD2_BASE),
    "band_index_batch_50_fresh": (probe_band_index_batch, _BAND_BASE),
    # round-11: the destructive maintenance passes gated this round
    "vacuum_mart_path_third_dead": (probe_vacuum_mart_path, _VAC_BASE),
    # round-13: the type-widening heal path + the expiry-pruned pass
    "vacuum_widened_heal_int_long": (probe_vacuum_widened_heal,
                                     _VAC_BASE),
    "vacuum_sparse_expiry_1bucket": (probe_vacuum_sparse_expiry,
                                     _VAC_BASE),
    "band_index_compact_100x_buckets": (probe_band_index_compact,
                                        _BAND_BASE),
    # round-12: the two most expensive extension plans not yet probed
    "cross_source_overlap_universal_fp": (probe_cross_source_overlap,
                                          10_000),
    "leakage_split_chain5_plus_1pct_hub": (probe_leakage_safe_split,
                                           100_000),
    "pagerank_3iter_ring_1pct_hub": (probe_pagerank_hub, 100_000),
    "tfidf_pairs_universal_term": (probe_tfidf_pairs_universal_term,
                                   10_000),
    # round-17: the sizing-note hot-key scenario, both keep_latest arms
    "keep_latest_window_one_hot_key": (probe_keep_latest_window_hot_key,
                                       100_000),
    "keep_latest_maxby_one_hot_key": (probe_keep_latest_maxby_hot_key,
                                      100_000),
}


def main() -> None:
    from pyspark_etl_project_spark.session import get_spark

    names = sys.argv[1:] or list(PROBES)
    spark = get_spark("amplification-probe")
    # Warm the JVM so the base measurement isn't first-job overhead.
    _materialize(spark.range(1_000_000).select(F.sum("id").alias("s")))
    print("| operator shape | base rows | base s | 100x s | time ratio |")
    print("|---|---|---|---|---|")
    for name in names:
        fn, base_n = PROBES[name]
        fn(spark, base_n)  # untimed warmup at base scale
        t0 = time.time()
        fn(spark, base_n)
        base_t = time.time() - t0
        t0 = time.time()
        fn(spark, base_n * AMP)
        big_t = time.time() - t0
        print(f"| {name} | {base_n:,} | {base_t:.2f} | {big_t:.2f} "
              f"| {big_t / base_t:.0f}x |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
