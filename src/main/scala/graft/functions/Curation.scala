package graft.functions

import graft.ops.Ckpt._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus curation — the training-data pipeline stages downstream of dedup:
 * benchmark decontamination, PII redaction, deterministic splits, and
 * sequence packing. No reference analog (neo4j is a graph store); these are
 * the operations a 100 TB pretraining corpus needs between raw documents
 * and training shards, built on the same Spark-first rules as the dedup
 * family: broadcast the small side, hash before shuffling, never collect
 * more than a bounded statistic to the driver.
 */
object Curation {

  /**
   * Benchmark decontamination: flag corpus documents sharing at least one
   * word n-gram with a benchmark/eval set (the standard n-gram-overlap
   * decontamination test applied before training).
   *
   * Scale shape: the benchmark is thousands of rows vs a 100 TB corpus, so
   * its distinct shingles broadcast; corpus shingles reduce to 8-byte
   * xxhash64 keys before the join, the join itself is map-side, and the
   * per-doc overlap count partial-aggregates. The corpus is never shuffled
   * by shingle.
   *
   * @return (idCol, overlap_ngrams LONG) — one row per contaminated doc;
   *         clean docs are absent (left-anti of this = the keep set)
   */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int,
      idCol: String = "id", textCol: String = "text"): DataFrame = {
    def hashedShingles(df: DataFrame, cols: Column*): DataFrame = df
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .select(cols :+ explode(TextFunctions.shinglesOf(col("__toks"), n)).as("__ng"): _*)
      .withColumn("__ngh", xxhash64(col("__ng"))).drop("__ng")
    val bench = broadcast(
      hashedShingles(benchmark).select("__ngh").distinct())
    hashedShingles(corpus, col(idCol))
      .dropDuplicates(idCol, "__ngh")
      .join(bench, "__ngh")
      .groupBy(idCol).agg(count(lit(1)).as("overlap_ngrams"))
  }

  /**
   * PII redaction: emails, IPv4 addresses, and phone-number-shaped digit
   * runs replaced with typed placeholders. Applied in that order (emails
   * and IPs contain digit runs a phone pattern would otherwise shred).
   * Pure codegen'd regexp_replace — no UDF; patterns are RE2-compatible
   * (no lookaround) so external auditors can replay them.
   */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\+?\\d[\\d -]{7,}\\d"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "[EMAIL]"),
        ip, "[IP]"),
      phone, "[PHONE]")
  }

  /**
   * Deterministic train/val/test split on a stable content-independent
   * key: first hex digit of md5 of the id — 12/16 train, 2/16 val,
   * 2/16 test. Pure map-side, reproducible across engines and runs (no
   * seed state), and stable under corpus growth: a document's split never
   * changes when other documents are added or removed.
   */
  def splitLabel(id: Column): Column = {
    val h = substring(md5(id.cast("string")), 1, 1)
    when(h.isin("c", "d"), "val")
      .when(h.isin("e", "f"), "test")
      .otherwise("train")
  }

  /**
   * Deterministic per-stratum downsampling (language/domain rebalancing —
   * the standard corpus-mixing step): keep a row iff the first two hex
   * digits of md5(id) compare below the stratum's threshold (fixed-width
   * lowercase hex compares in numeric order). Map-side, seedless,
   * reproducible across engines and runs, and per-row independent —
   * growing the corpus never flips an earlier keep decision. Rates
   * quantize to 1/256.
   */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    def thr(r: Double): String = {
      // rates in [255.5/256, 1.0) round to 256, whose hex is the 3-char
      // '100' — lexicographically BELOW '11'..'ff', which would silently
      // keep ~6% instead of ~100%; saturate the rounded bucket to 0xff
      // (quantization already makes 255/256 the largest sub-1.0 rate)
      val bucket = math.min(0xff, math.max(0, (r * 256).round.toInt))
      if (r >= 1.0) "zz" // sorts above every hex pair: keep everything
      else f"$bucket%02x"
    }
    val thrCol = rates.toSeq.sortBy(_._1).foldLeft(lit(thr(defaultRate))) {
      case (acc, (k, r)) => when(col(strataCol) === k, lit(thr(r))).otherwise(acc)
    }
    df.filter(substring(md5(col(idCol).cast("string")), 1, 2) < thrCol)
  }

  /**
   * Gopher rule-based quality filter (Rae et al. 2021 §A1.1): the
   * word-level document filters — word count in [minWords, maxWords],
   * mean word length in [3, 10], symbol-to-word ratio ('#' and '...')
   * below 0.1, ≥80 % of words containing an alphabetic character, and at
   * least two English stopwords. Emits every signal plus per-document
   * `keep`, so downstream stages can re-cut thresholds without recomputing.
   *
   * Scale shape: a single narrow map over the corpus — every signal is a
   * codegen'd higher-order function on the materialized token array (one
   * tokenize per row, attribute-referenced so lambdas don't re-evaluate the
   * split), no shuffle, no UDF.
   */
  def gopherRules(df: DataFrame, idCol: String = "id", textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    df.withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .withColumn("n_words", size(col("__toks")).cast("long"))
      .withColumn("mean_word_len",
        when(col("n_words") === 0, lit(0.0)).otherwise(round(
          aggregate(col("__toks"), lit(0L), (a, t) => a + length(t))
            .cast("double") / col("n_words"), 4)))
      .withColumn("stopword_count", TextFunctions.stopwordCount(col(textCol)))
      .withColumn("symbol_ratio",
        (regexp_count(col(textCol), lit("#")) +
          regexp_count(col(textCol), lit("\\.\\.\\."))).cast("double") /
          greatest(col("n_words"), lit(1L)))
      .withColumn("alpha_word_ratio",
        when(col("n_words") === 0, lit(0.0)).otherwise(
          size(filter(col("__toks"), t => t.rlike("[A-Za-z]")))
            .cast("double") / col("n_words")))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(3, 10) &&
          col("symbol_ratio") < 0.1 &&
          col("alpha_word_ratio") >= 0.8 &&
          col("stopword_count") >= 2)
      .select(col(idCol), col("n_words"), col("mean_word_len"),
        col("stopword_count"), round(col("symbol_ratio"), 4).as("symbol_ratio"),
        round(col("alpha_word_ratio"), 4).as("alpha_word_ratio"), col("keep"))
  }

  /**
   * Bigram language-model quality score — the CCNet-style "perplexity
   * against a reference LM" corpus filter (Wenzek et al., CCNet, 2020),
   * self-trained here: fit add-α-smoothed bigram/unigram counts on the
   * corpus itself, then score each document by the mean negative log
   * probability of its bigram instances (lower = more typical text; the
   * curation step drops the high-perplexity tail).
   *
   * Scale shape: the two count tables are VOCABULARY-bounded (one
   * partial-aggregating explode pass each over the corpus — the groupBy
   * output is |vocab| / |bigram vocab| rows no matter how big the corpus),
   * and scoring is two joins keyed on those tables. Nothing quadratic, no
   * driver iteration; the single driver-side scalar is the vocabulary size.
   *
   * @return (idCol, nll DOUBLE) — one row per doc with ≥1 bigram;
   *         nll = -avg ln P(w2|w1), rounded to 4dp for engine parity
   */
  def bigramLmScore(df: DataFrame, idCol: String = "id",
      textCol: String = "text", alpha: Double = 0.5): DataFrame = {
    // tokenize ONCE: uni, the bigram counts and the final per-doc pass all
    // read the materialized token arrays instead of re-running the regex
    // split per branch (previously 3 full tokenizations + shingle passes)
    val toks = df.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
      .localCheckpoint(false)
    val uni = toks.select(explode(col("__toks")).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__cu"))
    // shinglesOf degenerates below n tokens (returns the whole joined doc
    // as one shingle) — bigram passes take only docs with a real bigram
    val biDocs = toks.filter(size(col("__toks")) >= 2)
    val big = biDocs.select(
        explode(TextFunctions.shinglesOf(col("__toks"), 2)).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__cb"))
    // vocabulary size: the one bounded driver statistic (a LONG)
    val v = uni.count()
    // fold the unigram join into a per-DISTINCT-bigram log term first:
    // both join inputs are vocabulary-bounded, so the corpus-sized
    // exploded stream joins once (on __b) instead of twice (__b then __w)
    // — one fewer corpus-size shuffle; the per-instance value is the
    // identical double (same log of the same counts)
    val lr = big
      .withColumn("__w", element_at(split(col("__b"), " "), 1))
      .join(uni, "__w")
      .select(col("__b"),
        log((col("__cb") + alpha) / (col("__cu") + alpha * v)).as("__lr"))
    biDocs.select(col(idCol),
        explode(TextFunctions.shinglesOf(col("__toks"), 2)).as("__b"))
      .join(lr, "__b")
      .groupBy(idCol)
      .agg(round(-avg(col("__lr")), 4).as("nll"))
  }

  /**
   * Per-document top-k keywords by tf-idf — the classic relevance signal,
   * used in curation for topic tagging and diversity-aware sampling.
   * idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn convention); score =
   * tf · idf, ties broken by term text. Document-frequency table is
   * VOCABULARY-bounded; term frequencies partial-aggregate; the only
   * driver scalar is the corpus row count.
   *
   * @return (idCol, term, score DOUBLE 4dp, rank 1..k)
   */
  /**
   * DSIR importance weights (Xie et al. 2023, "Data Selection for Language
   * Models via Importance Resampling"): score every document by how much
   * more likely its tokens are under the target distribution than under
   * the raw-corpus distribution, estimated with add-α-smoothed unigram
   * counts over the shared corpus vocabulary. The weight is the mean
   * per-token-occurrence log ratio ln(p_target(w)/p_raw(w)); the
   * downstream resampling step keeps documents with probability
   * proportional to exp(weight) (graft's stratifiedSample/qualityBuckets
   * consume the emitted weights).
   *
   * Scale shape: one token-count shuffle with map-side partial aggregation
   * (result is vocabulary-bounded), totals as a broadcast one-row
   * relation, the per-token log-ratio table joins back to the exploded
   * corpus on the token key, and the per-doc mean partial-aggregates —
   * the same profile as tf-idf, and the corpus text shuffles only once.
   *
   * @param isTarget row predicate defining the target distribution (a
   *                 curated high-quality subset of the same frame)
   * @return (id, dsir_weight DOUBLE, ntok LONG) — weight 0.0 for docs with
   *         no tokens
   */
  def dsirWeights(df: DataFrame, isTarget: Column, idCol: String = "id",
      textCol: String = "text", alpha: Double = 1.0): DataFrame = {
    val toks = df.select(col(idCol).as("id"), isTarget.as("__tgt"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("__w"))
    val stats = toks.groupBy("__w").agg(
      count(lit(1)).as("__rc"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__tc"))
    val totals = stats.agg(sum("__rc").as("__rtot"), sum("__tc").as("__ttot"),
      count(lit(1)).as("__vocab"))
    val lw = stats.crossJoin(broadcast(totals))
      .select(col("__w"),
        (log((col("__tc") + alpha) / (col("__ttot") + lit(alpha) * col("__vocab"))) -
          log((col("__rc") + alpha) / (col("__rtot") + lit(alpha) * col("__vocab"))))
          .as("__lw"))
    // Per-doc mean as a distinct-token grouped reduction folded in sorted
    // token order: fp summation order is then identical on every engine
    // (and every partitioning), so 4-dp rounding downstream is stable.
    val perTok = toks.groupBy("id", "__w").agg(count(lit(1)).as("__cnt"))
    val perDoc = perTok.join(lw, Seq("__w"))
      .select(col("id"), col("__cnt"),
        struct(col("__w").as("w"), (col("__cnt") * col("__lw")).as("v")).as("__s"))
      .groupBy("id")
      .agg(collect_list(col("__s")).as("__ss"), sum(col("__cnt")).as("ntok"))
      .select(col("id"),
        (aggregate(array_sort(col("__ss")), lit(0.0),
          (acc, x) => acc + x.getField("v")) / col("ntok")).as("dsir_weight"),
        col("ntok"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("dsir_weight"), lit(0.0)).as("dsir_weight"),
        coalesce(col("ntok"), lit(0L)).as("ntok"))
  }

  def tfidfTopTerms(df: DataFrame, k: Int, idCol: String = "id",
      textCol: String = "text"): DataFrame = {
    val n = df.count()
    val terms = df.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(idCol, "term").agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("score", round(
        col("__tf") * (log((lit(n) + 1.0) / (col("__df") + 1.0)) + 1.0), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("score"), col("rank"))
  }

  /**
   * Corpus mixing weights: per-stratum sampling weight that reshapes the
   * corpus token distribution to a target share map (the static form of
   * domain reweighting à la DoReMi / The Pile's mixture weights). A
   * stratum's weight = target share / actual token share; a downstream
   * sampler multiplies per-row keep probabilities (or epoch counts) by it.
   * One aggregate pass — strata cardinality is tiny by construction.
   *
   * @return (strataCol, docs LONG, tokens LONG, share DOUBLE 4dp,
   *         weight DOUBLE 4dp); strata absent from `targetShares` get the
   *         residual target mass split by their actual shares (weight 1
   *         scaling within the residual)
   */
  def mixWeights(df: DataFrame, strataCol: String,
      targetShares: Map[String, Double], tokCol: Column): DataFrame = {
    val targetCol = targetShares.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("double")) { case (acc, (s, t)) =>
        when(col(strataCol) === s, lit(t)).otherwise(acc) }
    val agg = df.groupBy(strataCol)
      .agg(count(lit(1)).as("docs"), sum(tokCol.cast("long")).as("tokens"))
      .withColumn("__target", targetCol)
    // corpus totals via a broadcast one-row join, NOT an unpartitioned
    // window (which would funnel through a single partition — harmless on
    // a strata table but the wrong habit for the 100 TB contract)
    val tot = agg.agg(sum(col("tokens")).as("__total"),
      sum(when(col("__target").isNull, col("tokens")).otherwise(0L))
        .as("__unlTok"))
    val share = col("tokens").cast("double") / col("__total")
    // residual mass (1 - Σ explicit targets) distributes over unlisted
    // strata proportionally to their actual shares → their weight is the
    // residual scale, uniform across them
    val weight = when(col("__target").isNotNull, col("__target") / share)
      .otherwise((lit(1.0) - lit(targetShares.values.sum)) /
        (col("__unlTok").cast("double") / col("__total")))
    agg.crossJoin(broadcast(tot))
      .select(col(strataCol), col("docs"), col("tokens"),
        round(share, 4).as("share"), round(weight, 4).as("weight"))
  }

  /**
   * Temperature-scaled sampling weights (the mT5/XLM-R α-sampling rule,
   * Conneau et al. 2020): q_i ∝ p_i^α for token share p_i, α ∈ (0, 1]
   * flattens the distribution toward uniform (α = 1 keeps it). A
   * stratum's weight = q_i / p_i — the factor a downstream sampler
   * multiplies per-row keep probabilities (or epoch counts) by. One
   * aggregate pass; strata cardinality is tiny by construction.
   * Complements [[mixWeights]] (explicit target shares) with the
   * closed-form temperature rule.
   *
   * @return (strataCol, tokens LONG, share DOUBLE 4dp, weight DOUBLE 4dp)
   */
  def temperatureWeights(df: DataFrame, strataCol: String, tokCol: Column,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    val agg = df.groupBy(strataCol)
      .agg(sum(tokCol.cast("long")).as("tokens"))
    val tot = agg.agg(sum(col("tokens")).as("__total"),
      sum(pow(col("tokens").cast("double"), alpha)).as("__zsum"))
    val share = col("tokens").cast("double") / col("__total")
    val q = pow(col("tokens").cast("double"), alpha) / col("__zsum")
    agg.crossJoin(broadcast(tot))
      .select(col(strataCol), col("tokens"),
        round(share, 4).as("share"), round(q / share, 4).as("weight"))
  }

  /**
   * Global quality-quantile bucketing — the curriculum / quality-tier
   * assignment step: rank every document by a score (e.g. the
   * [[bigramLmScore]] perplexity) and cut the corpus into n equal-ish
   * buckets, bucket = floor(rank·n / total) with rank 0-based in
   * (score, id) order — a closed form any engine reproduces exactly,
   * unlike ntile's ceil/floor split. Rank uses the same two-phase
   * distributed scan as [[shuffleShards]]: range-repartition by the sort
   * key, per-partition window rank, broadcast base offsets. No
   * single-partition window.
   *
   * @return (idCol, score, bucket INT 0..n-1)
   */
  def qualityBuckets(df: DataFrame, idCol: String, scoreCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive: $nBuckets")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.select(col(idCol), col(scoreCol))
      .repartitionByRange(parts, col(scoreCol), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .freshCkpt()
    val perPart = ranged.groupBy("__pid")
      .agg(count(lit(1)).as("__pn"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = perPart.map(_._2).sum
    val bases = perPart.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c) }.init
      .zip(perPart).map { case ((_, base), (pid, _)) => (pid, base) }
    import spark.implicits._
    val baseDf = broadcast(bases.toSeq.toDF("__pid", "__base"))
    val w = Window.partitionBy("__pid").orderBy(col(scoreCol), col(idCol))
    ranged.join(baseDf, "__pid")
      .withColumn("__rank",
        row_number().over(w).cast("long") - 1L + col("__base"))
      .select(col(idCol), col(scoreCol),
        floor(col("__rank") * nBuckets / total).cast("int").as("bucket"))
  }

  /**
   * Deterministic global shuffle + shard assignment — the training-shard
   * writer's layout step: order rows by a seedless pseudo-random key
   * (md5 of salt:id — reproducible across engines, runs, and cluster
   * sizes; a new salt is a fresh epoch permutation) and deal them into
   * `numShards` shards round-robin, so shard sizes differ by at most one
   * and each shard is itself in key order (a reader streaming one shard
   * sees an unbiased sample of the corpus).
   *
   * Scale shape: the global rank is the same two-phase scan as
   * [[assignPacks]] — range-repartition by key, per-partition window
   * rank, per-partition base offsets (one bounded row per partition)
   * broadcast back. No single-partition window, no driver iteration.
   *
   * @return (idCol, shard LONG 0..numShards-1, pos LONG position within
   *         the shard)
   */
  def shuffleShards(df: DataFrame, idCol: String, numShards: Int,
      salt: String): DataFrame = {
    require(numShards >= 1, s"numShards must be positive: $numShards")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .withColumn("__key", md5(concat(lit(salt), lit(":"),
        col(idCol).cast("string"))))
      .repartitionByRange(parts, col("__key"))
      .withColumn("__pid", spark_partition_id())
      .freshCkpt()
    val perPart = ranged.groupBy("__pid")
      .agg(count(lit(1)).as("__pn"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = perPart.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c) }.init
      .zip(perPart).map { case ((_, base), (pid, _)) => (pid, base) }
    import spark.implicits._
    val baseDf = broadcast(bases.toSeq.toDF("__pid", "__base"))
    val w = Window.partitionBy("__pid").orderBy(col("__key"), col(idCol))
    ranged.join(baseDf, "__pid")
      .withColumn("__rank",
        row_number().over(w).cast("long") - 1L + col("__base"))
      .select(col(idCol), (col("__rank") % numShards).as("shard"),
        floor(col("__rank") / numShards).as("pos"))
  }

  /**
   * Sequence packing (concat-and-chunk): lay documents end to end in id
   * order and cut the stream into fixed token-budget packs — the standard
   * pretraining shard layout. Each doc gets its global token offset, its
   * first pack id, and the number of packs it straddles.
   *
   * Scale shape: the global prefix sum is the classic two-phase scan —
   * range-repartition by id (the one unavoidable shuffle: packing IS a
   * global order), per-partition window cumsum, then per-partition base
   * offsets (one bounded row per partition) broadcast back. No
   * single-partition window, no driver-side iteration; the checkpoint pins
   * partitioning so both passes see identical partition ids.
   *
   * @return (idCol, tokCol, offset LONG, pack LONG, packs INT)
   */
  /**
   * Corpus datasheet (the "data card" summary every released dataset
   * ships): one aggregation pass over the corpus producing row/token/char
   * totals, exact-duplicate rate, and per-language shares — the numbers a
   * dataset README quotes. Everything is partial-aggregable (the dup rate
   * rides on a distinct-count of content hashes), so the pass scales like
   * any other groupBy; no driver loops, no sampling.
   *
   * @return one row per language plus the '__total' roll-up row:
   *         (lang, docs, tokens, chars, distinct_texts, dup_rate 4dp)
   */
  def corpusReport(df: DataFrame, textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    val toks = size(filter(split(col(textCol), "\\s+"), t => t =!= ""))
      .cast("long")
    val base = df.select(col(langCol).as("lang"), toks.as("__t"),
      length(col(textCol)).cast("long").as("__c"), md5(col(textCol)).as("__h"))
    def agg1(g: org.apache.spark.sql.RelationalGroupedDataset) = g
      .agg(count(lit(1)).as("docs"), sum("__t").as("tokens"),
        sum("__c").as("chars"), countDistinct("__h").as("distinct_texts"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("distinct_texts") / col("docs"), 4))
    agg1(base.groupBy("lang"))
      .unionByName(agg1(base.withColumn("lang", lit("__total")).groupBy("lang")))
  }

  /**
   * Deterministic negative sampling for contrastive training pairs
   * (the DPR / CLIP-style batch-construction step): for each
   * (query, positive) pair, pick k pseudo-random negatives from a pool,
   * reproducible across engines, runs and corpus repartitions.
   *
   * The pool gets a dense 0..n-1 index via the two-phase range-partition
   * prefix (the [[assignPacks]] pattern — no single-partition window);
   * probe j of query q targets index
   * ((q mod 100000)·2654435761 + j) mod n — pure integer arithmetic, so
   * DuckDB replays it exactly and no value can overflow a BIGINT. The
   * per-query base is hashed; probes step CONSECUTIVELY from it, which
   * makes the k+1 probe indices provably distinct mod n (an earlier
   * stride-40503 variant could collide whole probe runs when n divided a
   * stride multiple, silently under-filling slots). Distinct indices ⇒
   * distinct pool ids, and only the positive can knock one out — so k+1
   * probes always fill every slot 1..k (n > k is required). Every stage
   * is a hash join or bounded window on the query id; the pool is
   * scanned once.
   *
   * @return (qid, pos, neg, slot 1..k)
   */
  def negativeSamples(pairs: DataFrame, qidCol: String, posCol: String,
      pool: DataFrame, poolIdCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1 negatives, got $k")
    val spark = pairs.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ids = pool.select(col(poolIdCol).as("__pid_id")).distinct()
      .repartitionByRange(parts, col("__pid_id"))
      .withColumn("__part", spark_partition_id())
      .freshCkpt()
    val counts = ids.groupBy("__part").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    require(n > k, s"pool size $n must exceed k=$k")
    val bases = counts.scanLeft((0, 0L)) { case ((_, acc), (p, c)) =>
      (p, acc + c) }.init.zip(counts).map { case ((_, b), (p, _)) => (p, b) }
    import spark.implicits._
    val baseDf = broadcast(bases.toSeq.toDF("__part", "__base"))
    val wIdx = Window.partitionBy("__part").orderBy(col("__pid_id"))
    val indexed = ids.join(baseDf, "__part")
      .select(col("__pid_id"),
        (row_number().over(wIdx) - 1 + col("__base")).as("__idx"))
    val probes = pairs.select(col(qidCol).as("qid"), col(posCol).as("pos"))
      .select(col("qid"), col("pos"),
        explode(sequence(lit(0), lit(k))).as("__j"))
      .withColumn("__idx",
        ((col("qid") % 100000L) * 2654435761L + col("__j")) % n)
    val wDedup = Window.partitionBy("qid", "__pid_id").orderBy("__j")
    val wSlot = Window.partitionBy("qid").orderBy("__j")
    probes.join(indexed, "__idx")
      .filter(col("__pid_id") =!= col("pos"))
      .withColumn("__first", row_number().over(wDedup))
      .filter(col("__first") === 1)
      .withColumn("slot", row_number().over(wSlot))
      .filter(col("slot") <= k)
      .select(col("qid"), col("pos"), col("__pid_id").as("neg"), col("slot"))
  }

  /**
   * Document chunking: split each document into fixed-size token windows
   * with `overlap` tokens shared between consecutive chunks — the
   * context-window preparation stage between cleaning and packing in a
   * pretraining/RAG pipeline (chunk, then embed or pack).
   *
   * Chunk starts step by `chunkSize - overlap`; the final chunk may be
   * short; a document of ≤ chunkSize tokens (including an empty one)
   * yields exactly one chunk. Deterministic — same input, same chunks,
   * any partitioning.
   *
   * Scale shape: tokenize + per-row index explode + array slice — a
   * narrow map with NO shuffle at any size; output rows ≈ corpus tokens
   * / stride, each chunk built by one codegen'd slice.
   *
   * @return (id, chunk_idx INT 0.., chunk_text, ntok INT)
   */
  def chunkDocuments(df: DataFrame, chunkSize: Int, overlap: Int = 0,
      idCol: String = "id", textCol: String = "text"): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize: chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    // null text behaves like empty text (one empty chunk) — a null
    // token array would otherwise null the chunk count and DROP the row
    val toks = df.select(col(idCol).as("id"),
      TextFunctions.tokens(coalesce(col(textCol), lit(""))).as("__t"))
    val n = size(col("__t"))
    val nChunks = when(n <= chunkSize, lit(1L))
      .otherwise(ceil((n - chunkSize).cast("double") / stride).cast("long") + 1L)
    toks
      .select(col("id"), col("__t"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_idx"))
      .select(col("id"), col("chunk_idx").cast("int").as("chunk_idx"),
        slice(col("__t"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkSize)).as("__c"))
      .select(col("id"), col("chunk_idx"),
        array_join(col("__c"), " ").as("chunk_text"),
        size(col("__c")).as("ntok"))
  }

  def assignPacks(df: DataFrame, idCol: String, tokCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive: $budget")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(parts, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .freshCkpt()
    val perPart = ranged.groupBy("__pid")
      .agg(sum(col(tokCol).cast("long")).as("__psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = perPart.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid, acc + s) }.init
      .zip(perPart).map { case ((_, base), (pid, _)) => (pid, base) }
    import spark.implicits._
    val baseDf = broadcast(bases.toSeq.toDF("__pid", "__base"))
    val w = Window.partitionBy("__pid").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(baseDf, "__pid")
      .withColumn("offset",
        coalesce(sum(col(tokCol).cast("long")).over(w), lit(0L)) + col("__base"))
      .withColumn("pack", floor(col("offset") / budget))
      .withColumn("packs", when(col(tokCol) <= 0, lit(1)).otherwise(
        (floor((col("offset") + col(tokCol) - 1) / budget) - col("pack") + 1)
          .cast("int")))
      .drop("__pid", "__base")
  }
}
