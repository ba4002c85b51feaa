package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fulltext search — the Spark counterpart of the reference's fulltext index
 * procedures (community/procedure/.../builtin/FulltextProcedures.java:90
 * `db.index.fulltext.queryNodes`, Lucene BM25 scoring underneath).
 *
 * The "index" is a posting-list DataFrame (term → doc, tf) built by one
 * explode + groupBy pass; at cluster scale it is written out partitioned by
 * term prefix and reused across queries, exactly the role of the Lucene
 * segment files. Scoring is the standard BM25 formula
 * (Robertson/Spärck Jones; Lucene BM25Similarity):
 *
 *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
 *   s(d, q) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
 *
 * Everything is deterministic `functions._` composition — no UDFs — so the
 * whole pipeline is SQL-expressible and oracle-checkable.
 */
object Fulltext {

  /** Tokenization shared by index build and oracle: lowercase, split on
    * non-alphanumeric runs, drop empties. */
  val TokenPattern = "[^a-z0-9]+"

  /** Analyzer = (split pattern, lowercase?, stopwords) — the reference's
    * per-index analyzer option (FulltextProcedures.java:202,
    * db.index.fulltext.analyzers): `standard` lowercases and splits on
    * non-alphanumerics, `whitespace` splits on blanks preserving case,
    * `simple` keeps letter runs only, `english` = standard minus Lucene's
    * English stopword set. */
  final case class Analyzer(pattern: String, lowercase: Boolean,
      stopwords: Set[String])

  /** Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET. */
  private val EnglishStopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  val Analyzers: Map[String, Analyzer] = Map(
    "standard"   -> Analyzer(TokenPattern, lowercase = true, Set.empty),
    "whitespace" -> Analyzer("\\s+", lowercase = false, Set.empty),
    "simple"     -> Analyzer("[^a-z]+", lowercase = true, Set.empty),
    "english"    -> Analyzer(TokenPattern, lowercase = true, EnglishStopwords))

  private def analyzerOf(name: String): Analyzer =
    Analyzers.getOrElse(name.toLowerCase, throw new IllegalArgumentException(
      s"unknown analyzer $name — available: ${Analyzers.keys.toSeq.sorted.mkString(", ")}"))

  /** Posting lists: (id, term, tf). */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      analyzer: String = "standard"): DataFrame = {
    val a = analyzerOf(analyzer)
    val base = if (a.lowercase) lower(col(textCol)) else col(textCol)
    var toks = docs.select(col(idCol).as("id"),
        explode(split(base, a.pattern)).as("term"))
      .filter(col("term") =!= "")
    if (a.stopwords.nonEmpty)
      toks = toks.filter(!col("term").isin(a.stopwords.toSeq: _*))
    toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
  }

  /**
   * BM25 top-k for a bag-of-words query. Rank determinism across engines:
   * scores are rounded to 4dp BEFORE the (score DESC, id ASC) ordering, so
   * last-ulp summation differences cannot flip ranks.
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      query: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
      analyzer: String = "standard"): DataFrame = {
    val a = analyzerOf(analyzer)
    val q = if (a.lowercase) query.toLowerCase else query
    val terms = q.split(a.pattern).filter(_.nonEmpty)
      .filterNot(a.stopwords).distinct.toSeq
    require(terms.nonEmpty, "empty query")
    val tf = postings(docs, idCol, textCol, analyzer)
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl")) // 1 row
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    val w = idf * (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.filter(col("term").isin(terms: _*))
      .join(dl, "id")
      .join(dft, "term")
      .crossJoin(broadcast(corpus))
      .groupBy("id").agg(round(sum(w), 4).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** One parsed clause of the boolean mini-language: occur ∈ MUST(+)/
    * MUST_NOT(-)/SHOULD(default), quoted text = phrase. */
  final case class BoolClause(occur: Char, text: String, phrase: Boolean)

  /** Parse the Lucene-style subset the reference's fulltext procedures
    * accept (FulltextProcedures.java queryNodes takes a Lucene query
    * string): `+required -prohibited "a phrase" loose terms`. */
  def parseBooleanQuery(query: String): Seq[BoolClause] = {
    val Pat = """([+-]?)(?:"([^"]*)"|(\S+))""".r
    Pat.findAllMatchIn(query).map { m =>
      val occur = if (m.group(1).isEmpty) 'S' else m.group(1).head match {
        case '+' => 'M'
        case '-' => 'N'
      }
      val (text, phrase) = Option(m.group(2)) match {
        case Some(p) => (p, true)
        case None    => (m.group(3), false)
      }
      BoolClause(occur, text, phrase)
    }.toSeq.filter(_.text.nonEmpty)
  }

  /**
   * Boolean + phrase BM25 top-k — the query-syntax surface of the
   * reference's `db.index.fulltext.queryNodes` (Lucene boolean queries:
   * MUST / MUST_NOT / SHOULD clauses and quoted phrases).
   *
   * Semantics (Lucene's, minus per-field boosts, with two documented
   * simplifications):
   *  - `+term` / `+"a phrase"`: document must match;
   *  - `-term` / `-"a phrase"`: document must not match;
   *  - bare terms are SHOULD: each match adds BM25 score, and when the
   *    query has no required clause at least one SHOULD term must match;
   *  - any non-negated phrase is treated as REQUIRED (divergence 1:
   *    Lucene would let a bare phrase be optional), and phrases filter
   *    without scoring (divergence 2: Lucene scores phrase frequency) —
   *    both keep every clause SQL-expressible for the oracle;
   *  - scoring: BM25 over the MUST + SHOULD term clauses, rounded 4dp
   *    before ranking, ties to the smaller id. A document selected by
   *    required clauses alone scores 0 and ranks last.
   *
   * Phrase matching tests adjacency on the ANALYZED token stream: the
   * text is lowercased and every non-token run collapses to one space,
   * so `"fast  Merge"` matches `fast merge batch`. Term filters are
   * posting-list semi/anti-joins (never a corpus regex scan); the one
   * full-text pass happens only when the query actually has phrases.
   */
  def booleanTopK(docs: DataFrame, idCol: String, textCol: String,
      query: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
      analyzer: String = "standard"): DataFrame = {
    val a = analyzerOf(analyzer)
    def analyzeTerms(s: String): Seq[String] = {
      val base = if (a.lowercase) s.toLowerCase else s
      base.split(a.pattern).filter(_.nonEmpty).filterNot(a.stopwords).toSeq
    }
    val clauses = parseBooleanQuery(query)
    require(clauses.nonEmpty, "empty boolean query")
    val scoringTerms = clauses.filter(c => !c.phrase && c.occur != 'N')
      .flatMap(c => analyzeTerms(c.text)).distinct
    val mustTerms = clauses.filter(c => !c.phrase && c.occur == 'M')
      .flatMap(c => analyzeTerms(c.text)).distinct
    val notTerms = clauses.filter(c => !c.phrase && c.occur == 'N')
      .flatMap(c => analyzeTerms(c.text)).distinct
    def phraseNeedle(s: String): String = analyzeTerms(s).mkString(" ")
    val mustPhrases = clauses.filter(c => c.phrase && c.occur != 'N')
      .map(c => phraseNeedle(c.text)).filter(_.nonEmpty)
    val notPhrases = clauses.filter(c => c.phrase && c.occur == 'N')
      .map(c => phraseNeedle(c.text)).filter(_.nonEmpty)
    val hasMust = mustTerms.nonEmpty || mustPhrases.nonEmpty
    require(scoringTerms.nonEmpty || hasMust,
      "query needs at least one scoring or required clause")

    val tf = postings(docs, idCol, textCol, analyzer).localCheckpoint(false)
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))

    // candidate set: phrase filters need one analyzed-text pass; term
    // filters stay on the posting lists
    val phraseCands: Option[DataFrame] =
      if (mustPhrases.isEmpty && notPhrases.isEmpty) None
      else {
        val base = if (a.lowercase) lower(col(textCol)) else col(textCol)
        // the haystack must pass the SAME analyzer as the needle: under a
        // stopword analyzer the needle has stopwords removed, so a
        // stopword-keeping haystack could never contain a phrase that
        // includes one ("jump over wall" → needle "jump wall")
        val toks0 = filter(split(base, a.pattern), t => t =!= "")
        val toks =
          if (a.stopwords.isEmpty) toks0
          else filter(toks0, t => !t.isInCollection(a.stopwords.toSeq))
        val norm = concat(lit(" "), array_join(toks, " "), lit(" "))
        val pred = (mustPhrases.map(p => norm.contains(s" $p ")) ++
          notPhrases.map(p => !norm.contains(s" $p ")))
          .reduce(_ && _)
        Some(docs.filter(pred).select(col(idCol).as("id")))
      }
    var cands: DataFrame =
      if (hasMust) {
        // intersection of the required clauses — a doc needs no SHOULD
        // match once it satisfies every MUST
        var c: DataFrame = null
        for (t <- mustTerms) {
          val s = tf.filter(col("term") === t).select("id")
          c = if (c == null) s else c.join(s, Seq("id"), "left_semi")
        }
        phraseCands.foreach(p =>
          c = if (c == null) p else c.join(p, Seq("id"), "left_semi"))
        c
      } else {
        // pure-SHOULD query: at least one scoring term must match (and
        // any MUST_NOT phrase filter still applies)
        var c = tf.filter(col("term").isin(scoringTerms: _*))
          .select("id").distinct()
        phraseCands.foreach(p => c = c.join(p, Seq("id"), "left_semi"))
        c
      }
    if (notTerms.nonEmpty)
      cands = cands.join(
        tf.filter(col("term").isin(notTerms: _*)).select("id").distinct(),
        Seq("id"), "left_anti")

    val idf = log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    val w = idf * (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    val scored =
      if (scoringTerms.isEmpty)
        cands.select(col("id"), lit(0.0).as("score"))
      else {
        val scores = tf.filter(col("term").isin(scoringTerms: _*))
          .join(dl, "id")
          .join(dft, "term")
          .crossJoin(broadcast(corpus))
          .groupBy("id").agg(round(sum(w), 4).as("score"))
        cands.select("id").distinct()
          .join(scores, Seq("id"), "left_outer")
          .select(col("id"), coalesce(col("score"), lit(0.0)).as("score"))
      }
    scored.orderBy(col("score").desc, col("id").asc).limit(k)
  }

  /**
   * Persisted inverted index — the durable counterpart of [[bm25TopK]]'s
   * in-flight posting lists, playing the role of Lucene's segment files
   * (reference: fulltext indexes persist per-index Lucene directories).
   * Layout under `path`:
   *   postings/ (term, id, tf)  partitioned by bucket = xxhash64(term) mod B
   *   df/       (term, df)      partitioned the same way
   *   doclen/   (id, dl)
   *   stats/    one row (n, avgdl, buckets, analyzer)
   * A query analyzes its terms, computes their buckets WITH THE SAME
   * xxhash64 expression, and reads only those partitions — at 100 TB the
   * scan cost is |query terms| buckets out of B, not the corpus, and the
   * index is built once per corpus version instead of per query.
   */
  def saveTextIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, analyzer: String = "standard", buckets: Int = 64): Unit = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val tf = postings(docs, idCol, textCol, analyzer).localCheckpoint(false)
    val bucket = pmod(xxhash64(col("term")), lit(buckets.toLong)).as("bucket")
    // cluster by the partition column before partitionBy so each bucket
    // lands in few files, not one per write task (see saveMinhashStore)
    tf.withColumn("bucket", bucket).repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
    tf.groupBy("term").agg(count(lit(1)).as("df")).withColumn("bucket", bucket)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/df")
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
    dl.write.mode("overwrite").parquet(s"$path/doclen")
    dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
      .withColumn("buckets", lit(buckets))
      .withColumn("analyzer", lit(analyzer))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k against a persisted index: identical scores/ranks to
    * [[bm25TopK]] over the indexed corpus, but only the query terms'
    * hash-bucket partitions are read (partition-pruned scans — gated by
    * PlanAuditSpec). */
  def queryTextIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      query: String, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val st = spark.read.parquet(s"$path/stats").first()
    val (n, avgdl) = (st.getAs[Long]("n"), st.getAs[Double]("avgdl"))
    val buckets = st.getAs[Int]("buckets")
    val a = analyzerOf(st.getAs[String]("analyzer"))
    val q = if (a.lowercase) query.toLowerCase else query
    val terms = q.split(a.pattern).filter(_.nonEmpty)
      .filterNot(a.stopwords).distinct.toSeq
    require(terms.nonEmpty, "empty query")
    // bucket ids via the SAME xxhash64 expression the writer used — one
    // bounded job over |terms| rows, never a driver-side hash reimplementation
    import spark.implicits._
    val termBuckets = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(buckets.toLong))).distinct()
      .collect().map(_.getLong(0)).toSeq
    def pruned(sub: String): DataFrame =
      spark.read.parquet(s"$path/$sub")
        .filter(col("bucket").isin(termBuckets: _*))
        .filter(col("term").isin(terms: _*)).drop("bucket")
    val dl = spark.read.parquet(s"$path/doclen")
    val w = lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5)
    val score = log(w) * (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl)))
    pruned("postings")
      .join(dl, "id")
      .join(pruned("df"), "term")
      .groupBy("id").agg(round(sum(score), 4).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }
}
