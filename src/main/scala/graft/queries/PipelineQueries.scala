package graft.queries

import graft.functions.{Dedup, Similarity, TextFunctions}
import org.apache.spark.sql.functions._

/**
 * LLM training-data pipeline operators over `documents` / `embeddings`
 * (first-class components per the build brief): dedup family, similarity
 * search, text analysis. Oracles re-derive results in DuckDB SQL where the
 * computation is deterministic; the probabilistic sketches (minhash,
 * simhash, LSH) are validated in ScalaTest against exact ground truth
 * instead (see DedupSpec) and ship as rows-only entries.
 */
object PipelineQueries {
  import QueryDef.t

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "documents").select(col("doc_id").as("id"), col("text"), col("lang"), col("source"))

  /** DuckDB replay of the portable-hash MinHash sketch pipeline: CTEs up
    * to `banded(id, band, bucket)`, `sigrow(id, i, v)` and
    * `sets(id, st)` — shared by the batch pair pipeline
    * ([[minhashPairsSql]]) and the incremental-store oracle. */
  private def minhashSketchSql(): String = {
    val rng = new scala.util.Random(42)
    val prime = 2147483647L
    val coef = Seq.fill(64)((1L + rng.nextInt((prime - 1).toInt),
      rng.nextInt(prime.toInt).toLong))
    val coefRows = coef.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""tok AS (SELECT doc_id AS id,
       |    list_filter(string_split_regex(text, '\\s+'),
       |      x -> length(x) > 0) AS toks
       |  FROM documents),
       |sh0 AS (SELECT id, CASE WHEN len(toks) < 3
       |    THEN [array_to_string(toks, ' ')]
       |    ELSE [array_to_string(toks[i:i+2], ' ')
       |          for i in generate_series(1, len(toks) - 2)] END AS shs
       |  FROM tok),
       |hs AS (SELECT id, list_distinct([
       |    CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % $prime
       |    for s in shs]) AS hs FROM sh0),
       |coef(i, a, b) AS (VALUES $coefRows),
       |sigrow AS (
       |  SELECT id, c.i AS i, min((x.h * c.a + c.b) % $prime) AS v
       |  FROM (SELECT id, unnest(hs) AS h FROM hs) x, coef c
       |  GROUP BY id, c.i),
       |sig AS (SELECT id, list(v ORDER BY i) AS sig FROM sigrow GROUP BY id),
       |banded AS (
       |  SELECT id, b.b AS band, CAST(concat('0x', substr(md5(
       |      array_to_string(sig[b.b * 4 + 1 : b.b * 4 + 4], '_')), 1, 15))
       |    AS BIGINT) AS bucket
       |  FROM sig, (SELECT unnest(generate_series(0, 15)) AS b) b),
       |sets AS (SELECT id, list_distinct([
       |    CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)
       |    for s in shs]) AS st FROM sh0)""".stripMargin
  }

  /** DuckDB replay of the MinHash+LSH candidate → exact-Jaccard-verified
    * pair pipeline over the PORTABLE hash (shared by the q_dedup_minhash
    * oracle and the q_dedup_clusters closure): yields CTEs ending in
    * `vpairs(idA, idB, jaccard)`. */
  private def minhashPairsSql(threshold: Double): String = {
    val gate = threshold * 0.7
    s"""${minhashSketchSql()},
       |capped AS (SELECT id, band, bucket, row_number() OVER (
       |    PARTITION BY band, bucket ORDER BY id) AS rn
       |  FROM banded QUALIFY rn <= 64),
       |cand AS (SELECT DISTINCT a.id AS idA, b.id AS idB
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bucket = b.bucket
       |  WHERE a.id < b.id),
       |est AS (SELECT c.idA, c.idB,
       |    sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / 64.0 AS e
       |  FROM cand c JOIN sigrow sa ON sa.id = c.idA
       |    JOIN sigrow sb ON sb.id = c.idB AND sb.i = sa.i
       |  GROUP BY c.idA, c.idB),
       |vp0 AS (SELECT k.idA, k.idB,
       |    CAST(len(list_intersect(a.st, b.st)) AS DOUBLE)
       |      / (len(a.st) + len(b.st)
       |         - len(list_intersect(a.st, b.st))) AS jaccard
       |  FROM (SELECT idA, idB FROM est WHERE e >= $gate) k
       |    JOIN sets a ON a.id = k.idA JOIN sets b ON b.id = k.idB),
       |vpairs AS (SELECT * FROM vp0 WHERE jaccard >= $threshold)""".stripMargin
  }

  /** DuckDB replay of the PORTABLE IVF pipeline (q_knn_ivf and its
    * persisted twin): deterministic 2-round Lloyd with 32 lowest-id
    * seeds (the q_kmeans recipe), final per-cell mean centroids, cosine
    * probe ranking (nProbe = 8, ties lowest cid) and exact rerank
    * (k = 10, ties lowest id). */
  private val ivfOracleSql: String =
    """WITH emb AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
      |    FROM embeddings),
      |init AS (SELECT id, CAST(row_number() OVER (ORDER BY id) - 1
      |    AS INT) AS cid
      |  FROM (SELECT id FROM emb ORDER BY id LIMIT 32)),
      |c0 AS (SELECT i.cid, e.v FROM init i JOIN emb e USING (id)),
      |d1 AS (SELECT e.id, c.cid, list_cosine_similarity(e.v, c.v) AS s
      |  FROM emb e, c0 c),
      |a1 AS (SELECT id, cid FROM (SELECT id, cid, row_number() OVER (
      |    PARTITION BY id ORDER BY s DESC, cid ASC) AS rk FROM d1)
      |  WHERE rk = 1),
      |pos AS (SELECT unnest(range(1, 65)) AS ord),
      |m1 AS (SELECT a.cid, p.ord, avg(e.v[p.ord]) AS cv
      |  FROM a1 a JOIN emb e USING (id), pos p GROUP BY a.cid, p.ord),
      |c1 AS (SELECT cid, list(cv ORDER BY ord) AS v FROM m1 GROUP BY cid),
      |d2 AS (SELECT e.id, c.cid, list_cosine_similarity(e.v, c.v) AS s
      |  FROM emb e, c1 c),
      |a2 AS (SELECT id, cid FROM (SELECT id, cid, row_number() OVER (
      |    PARTITION BY id ORDER BY s DESC, cid ASC) AS rk FROM d2)
      |  WHERE rk = 1),
      |m2 AS (SELECT a.cid, p.ord, avg(e.v[p.ord]) AS cv
      |  FROM a2 a JOIN emb e USING (id), pos p GROUP BY a.cid, p.ord),
      |c2 AS (SELECT cid, list(cv ORDER BY ord) AS v FROM m2 GROUP BY cid),
      |q AS (SELECT id AS qid, v AS qv FROM emb WHERE id < 5),
      |probes AS (SELECT qid, cid FROM (
      |    SELECT q.qid, c.cid, row_number() OVER (PARTITION BY q.qid
      |      ORDER BY list_cosine_similarity(q.qv, c.v) DESC, c.cid ASC)
      |      AS rn
      |    FROM q, c2 c) WHERE rn <= 8),
      |cand AS (SELECT p.qid, a.id FROM probes p JOIN a2 a ON a.cid = p.cid
      |  WHERE a.id <> p.qid),
      |scored AS (SELECT cand.qid, cand.id,
      |    list_cosine_similarity(e1.v, e2.v) AS sim
      |  FROM cand JOIN emb e1 ON e1.id = cand.qid
      |            JOIN emb e2 ON e2.id = cand.id)
      |SELECT qid, CAST(row_number() OVER (PARTITION BY qid
      |    ORDER BY sim DESC, id ASC) AS INT) AS rank, id
      |FROM scored QUALIFY rank <= 10""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: hash-groupBy on md5(text) — one shuffle.
    QueryDef("q_dedup_exact",
      (s, d) => Dedup.exact(docs(s, d))
        .select(col("h"), col("representative"), col("dupCount")),
      Some("""SELECT md5(text) AS h, min(doc_id) AS representative,
             |  count(*) AS dupCount
             |FROM documents GROUP BY md5(text)""".stripMargin)),

    // Duplicate RESOLUTION: doc → canonical id + keep flag, the projection
    // a pipeline applies after detection (filter(keep) or re-point refs).
    QueryDef("q_dedup_canonical",
      (s, d) => Dedup.exactCanonical(docs(s, d))
        .select(col("id"), col("canonical"), col("keep")),
      Some("""SELECT doc_id AS id,
             |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical,
             |  doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
             |FROM documents""".stripMargin)),

    // Near-dup CLUSTER resolution: minhash candidates → exact-Jaccard
    // verify → connected components → canonical per cluster. xxhash64-
    // seeded sketches aren't reproducible in DuckDB → rows-only; the
    // planted-transitive-duplicate contract is locked in DedupSpec.
    QueryDef("q_dedup_clusters",
      (s, d) => Dedup.nearDupClusters(docs(s, d), threshold = 0.8,
          hash64 = Dedup.portableHash64)
        .groupBy("keep").agg(count(lit(1)).as("n"))
        .orderBy(col("keep")),
      // the full resolution replays: portable-hash candidate pairs at
      // 0.8, then a recursive-CTE transitive closure whose per-id minimum
      // reachable id IS the canonical (the engine's min-label components)
      Some(s"""WITH RECURSIVE ${minhashPairsSql(0.8)},
             |e AS (SELECT idA AS a, idB AS b FROM vpairs
             |  UNION SELECT idB, idA FROM vpairs),
             |reach(a, b) AS (SELECT a, b FROM e
             |  UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
             |canon AS (SELECT d.doc_id AS id,
             |    least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS canonical
             |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
             |  GROUP BY d.doc_id)
             |SELECT (id = canonical) AS keep, count(*) AS n
             |FROM canon GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Incremental (daily-crawl) dedup: sketch the first 80% of the corpus
    // into a persisted MinHash store, then dedup the remaining 20% batch
    // against it — candidates touch only the buckets the batch hashes
    // into, corpus text is never rescanned. Under the portable hash the
    // oracle replays the WHOLE store protocol: store-side sketches,
    // batch-bucket semi-join, per-matched-bucket cap, estimate gate and
    // exact-Jaccard verify (DedupSpec additionally proves batch-vs-store
    // pairs equal the full recompute, including after an append).
    QueryDef("q_dedup_incremental",
      (s, d) => {
        val all = docs(s, d)
        val cut = 400L
        val store = s"${System.getProperty("java.io.tmpdir")}/graft_mhstore_" +
          Integer.toHexString(d.hashCode)
        Dedup.saveMinhashStore(all.filter(col("id") < cut), store,
          hash64 = Dedup.portableHash64)
        Dedup.minhashDedupIncremental(all.filter(col("id") >= cut), store,
            threshold = 0.8, hash64 = Dedup.portableHash64)
          .agg(count(lit(1)).as("pairs"),
            countDistinct(col("newId")).as("dup_new_docs"))
      },
      Some(s"""WITH ${minhashSketchSql()},
             |newb AS (SELECT * FROM banded WHERE id >= 400),
             |matched AS (SELECT s.* FROM banded s
             |  JOIN (SELECT DISTINCT band, bucket FROM newb) nb
             |    USING (band, bucket)
             |  WHERE s.id < 400),
             |capped AS (SELECT id, band, bucket, row_number() OVER (
             |    PARTITION BY band, bucket ORDER BY id) AS rn
             |  FROM matched QUALIFY rn <= 64),
             |prs AS (SELECT DISTINCT n.id AS newId, c.id AS oldId
             |  FROM newb n JOIN capped c USING (band, bucket)
             |  WHERE n.id <> c.id),
             |est AS (SELECT p.newId, p.oldId,
             |    sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / 64.0 AS e
             |  FROM prs p JOIN sigrow sa ON sa.id = p.newId
             |    JOIN sigrow sb ON sb.id = p.oldId AND sb.i = sa.i
             |  GROUP BY p.newId, p.oldId),
             |vp AS (SELECT k.newId, k.oldId,
             |    CAST(len(list_intersect(a.st, b.st)) AS DOUBLE)
             |      / (len(a.st) + len(b.st)
             |         - len(list_intersect(a.st, b.st))) AS jaccard
             |  FROM (SELECT newId, oldId FROM est WHERE e >= ${0.8 * 0.7}) k
             |    JOIN sets a ON a.id = k.newId JOIN sets b ON b.id = k.oldId)
             |SELECT count(*) AS pairs, count(DISTINCT newId) AS dup_new_docs
             |FROM vp WHERE jaccard >= 0.8""".stripMargin)),

    // Exact n-gram (word-set) Jaccard pairs within (lang, source) blocks —
    // the verification metric of the dedup family, blocked so the pair join
    // never goes quadratic in the corpus.
    QueryDef("q_dedup_jaccard",
      (s, d) => Dedup.ngramJaccardPairs(docs(s, d), Seq("lang", "source"), 0.5)
        .select(col("idA"), col("idB"), round(col("jaccard"), 4).as("jaccard")),
      Some("""WITH sets AS (SELECT doc_id, lang, source,
             |    list_distinct(list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0)) AS ws
             |  FROM documents)
             |SELECT a.doc_id AS idA, b.doc_id AS idB,
             |  round(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
             |        len(list_distinct(list_concat(a.ws, b.ws))), 4) AS jaccard
             |FROM sets a JOIN sets b
             |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
             |      len(list_distinct(list_concat(a.ws, b.ws))) >= 0.5""".stripMargin)),

    // ExactSubstr duplicate spans (Lee et al. 2022): maximal character
    // ranges covered by a 40-char substring that occurs >= 2 times anywhere
    // in the corpus. Gram-positional Spark design (hashed k-grams + one
    // count shuffle + per-doc interval merge) replaces the reference
    // suffix-array build; fully deterministic → exact DuckDB oracle.
    QueryDef("q_dedup_substr",
      (s, d) => Dedup.exactSubstrSpans(docs(s, d), k = 40),
      Some("""WITH d AS (SELECT doc_id AS id, text, length(text) AS n FROM documents),
             |p AS (SELECT id, i AS pos, substr(text, CAST(i AS INT), 40) AS gram
             |  FROM d, LATERAL (SELECT unnest(range(1, n - 38)) AS i) t
             |  WHERE n >= 40),
             |r AS (SELECT gram FROM p GROUP BY gram HAVING count(*) >= 2),
             |dp AS (SELECT p.id, p.pos FROM p JOIN r USING (gram)),
             |f AS (SELECT id, pos, CASE WHEN lag(pos) OVER w IS NULL
             |      OR pos > lag(pos) OVER w + 39 THEN 1 ELSE 0 END AS newg
             |  FROM dp WINDOW w AS (PARTITION BY id ORDER BY pos)),
             |g AS (SELECT id, pos, sum(newg) OVER (PARTITION BY id ORDER BY pos) AS grp
             |  FROM f)
             |SELECT id, min(pos) AS start, max(pos) + 39 AS "end",
             |  max(pos) + 39 - min(pos) + 1 AS chars
             |FROM g GROUP BY id, grp""".stripMargin)),

    // MinHash+LSH near-dup (sketch → band-bucket join → exact verify),
    // EXACT-REPLAY oracled: the query runs the full production pipeline
    // (shingles, 64 seeded permutations, 16 band buckets with the skew
    // cap, signature-agreement estimate, exact-Jaccard verify) over the
    // portable md5-derived 64-bit hash, and the oracle re-derives every
    // stage in SQL — the fixed seed-42 coefficients are interpolated as
    // literals. xxhash64 remains the scale-path default (DedupSpec pins
    // the sketch quality there).


    QueryDef("q_dedup_minhash",
      (s, d) => Dedup.minhashDedup(docs(s, d), threshold = 0.5,
          hash64 = Dedup.portableHash64)
        .select(col("idA"), col("idB"), round(col("jaccard"), 4).as("jaccard")),
      Some(s"""WITH ${minhashPairsSql(0.5)}
             |SELECT idA, idB, round(jaccard, 4) AS jaccard
             |FROM vpairs""".stripMargin)),

    // SimHash near-dup (64-bit signature, 16-bit band LSH, hamming
    // verify), EXACT-REPLAY oracled over the portable hash: 64 conditional
    // bit sums, sign bits OR-composed (bit 63 = BIGINT min value on the
    // SQL side), 4 x 16-bit band buckets, bit_count(xor) hamming.
    QueryDef("q_dedup_simhash",
      (s, d) => Dedup.simhashDedup(docs(s, d), maxHamming = 6,
          tokenHash = Dedup.portableHash64)
        .select(col("idA"), col("idB"), col("hamming")),
      Some("""WITH tok AS (SELECT doc_id AS id,
             |    unnest(list_filter(string_split_regex(text, '\s+'),
             |      x -> length(x) > 0)) AS t
             |  FROM documents),
             |h AS (SELECT id,
             |    CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
             |  FROM tok),
             |bits AS (
             |  SELECT id, js.j AS j,
             |    CASE WHEN sum(CASE WHEN (h >> js.j) & 1 = 1
             |        THEN 1 ELSE -1 END) > 0
             |      THEN CASE WHEN js.j = 63 THEN (-9223372036854775807 - 1)
             |           ELSE (CAST(1 AS BIGINT) << js.j) END
             |      ELSE 0 END AS bit
             |  FROM h, (SELECT unnest(generate_series(0, 63)) AS j) js
             |  GROUP BY id, js.j),
             |sig AS (SELECT id, CAST(sum(bit) AS BIGINT) AS sig
             |  FROM bits GROUP BY id),
             |banded AS (SELECT id, sig, b.b AS band,
             |    (sig >> (b.b * 16)) & 65535 AS bucket
             |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS b) b),
             |pairs AS (SELECT DISTINCT a.id AS idA, b.id AS idB,
             |    a.sig AS sA, b.sig AS sB
             |  FROM banded a JOIN banded b
             |    ON a.band = b.band AND a.bucket = b.bucket
             |  WHERE a.id < b.id)
             |SELECT idA, idB, CAST(bit_count(xor(sA, sB)) AS INT) AS hamming
             |FROM pairs WHERE bit_count(xor(sA, sB)) <= 6""".stripMargin)),

    // Brute-force cosine top-k — exact ANN baseline. Query vectors 0..4
    // against the full corpus; ids only (rank ties broken by id).
    QueryDef("q_knn_bruteforce",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.bruteForceTopK(corpus, queries, 10)
          .select(col("qid"), col("rank").cast("int").as("rank"), col("id"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
             |    FROM embeddings WHERE vec_id < 5),
             |scored AS (SELECT q.qid, e.vec_id AS id,
             |    list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS sim
             |  FROM embeddings e, q WHERE e.vec_id <> q.qid)
             |SELECT qid, CAST(row_number() OVER (PARTITION BY qid
             |    ORDER BY sim DESC, id ASC) AS INT) AS rank, id
             |FROM scored QUALIFY rank <= 10""".stripMargin)),

    // Hard-negative mining: per query vector, the 5 most similar
    // embeddings with a DIFFERENT class label — the negatives a
    // contrastive loss actually learns from. Scores round to 4dp before
    // the (sim DESC, id ASC) rank so both engines agree on every tie.
    QueryDef("q_hard_negatives",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val corpus = emb.select(col("vec_id").as("id"),
          col("embedding").as("vec"), col("label"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
            col("label").as("qlabel"))
        Similarity.hardNegatives(corpus, queries, 5)
          .select(col("qid"), col("rank").cast("int").as("rank"), col("id"),
            col("sim"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
             |    label AS ql FROM embeddings WHERE vec_id < 5),
             |scored AS (SELECT q.qid, e.vec_id AS id,
             |    round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 4)
             |      AS sim
             |  FROM embeddings e, q
             |  WHERE e.vec_id <> q.qid AND e.label <> q.ql)
             |SELECT qid, CAST(row_number() OVER (PARTITION BY qid
             |    ORDER BY sim DESC, id ASC) AS INT) AS rank, id, sim
             |FROM scored QUALIFY rank <= 5""".stripMargin)),

    // Distributed spherical k-means (Lloyd, 2 iterations, k=4) — the
    // clustering stage of semantic stratification. Deterministic init (k
    // lowest-id vectors, cid in id order) and fp64 math end to end, so
    // the DuckDB oracle replays the exact assignments: argmax cosine per
    // round, per-(cluster, dim) mean update between rounds.
    QueryDef("q_kmeans",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.kmeansAssign(
          emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
          k = 4, iters = 2)
      },
      Some("""WITH emb AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
             |    FROM embeddings),
             |init AS (SELECT id, CAST(row_number() OVER (ORDER BY id) - 1
             |    AS INT) AS cid
             |  FROM (SELECT id FROM emb ORDER BY id LIMIT 4)),
             |c0 AS (SELECT i.cid, e.v FROM init i JOIN emb e USING (id)),
             |d1 AS (SELECT e.id, c.cid, list_cosine_similarity(e.v, c.v) AS s
             |  FROM emb e, c0 c),
             |a1 AS (SELECT id, cid FROM (SELECT id, cid, row_number() OVER (
             |    PARTITION BY id ORDER BY s DESC, cid ASC) AS rk FROM d1)
             |  WHERE rk = 1),
             |pos AS (SELECT unnest(range(1, 65)) AS ord),
             |m1 AS (SELECT a.cid, p.ord, avg(e.v[p.ord]) AS cv
             |  FROM a1 a JOIN emb e USING (id), pos p GROUP BY a.cid, p.ord),
             |c1 AS (SELECT cid, list(cv ORDER BY ord) AS v FROM m1 GROUP BY cid),
             |d2 AS (SELECT e.id, c.cid, list_cosine_similarity(e.v, c.v) AS s
             |  FROM emb e, c1 c),
             |a2 AS (SELECT id, cid FROM (SELECT id, cid, row_number() OVER (
             |    PARTITION BY id ORDER BY s DESC, cid ASC) AS rk FROM d2)
             |  WHERE rk = 1)
             |SELECT id, CAST(cid AS INT) AS cluster FROM a2""".stripMargin)),

    // SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    // within each cluster drop members within cosine tau of a kept,
    // lower-centroid-sim member. Deterministic end to end (same replayed
    // k-means as q_kmeans + a final mean centroid + ranked pair prune), so
    // the whole pipeline oracle-checks in DuckDB. tau=0.45 sits 5.5e-4
    // from the nearest corpus pair — no fp-boundary flakes cross-engine.
    QueryDef("q_dedup_semantic",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.semanticDedup(
          emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
          k = 8, iters = 2, tau = 0.45)
      },
      Some("""WITH emb AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
             |    FROM embeddings),
             |init AS (SELECT id, CAST(row_number() OVER (ORDER BY id) - 1
             |    AS INT) AS cid
             |  FROM (SELECT id FROM emb ORDER BY id LIMIT 8)),
             |c0 AS (SELECT i.cid, e.v FROM init i JOIN emb e USING (id)),
             |d1 AS (SELECT e.id, c.cid, list_cosine_similarity(e.v, c.v) AS s
             |  FROM emb e, c0 c),
             |a1 AS (SELECT id, cid FROM (SELECT id, cid, row_number() OVER (
             |    PARTITION BY id ORDER BY s DESC, cid ASC) AS rk FROM d1)
             |  WHERE rk = 1),
             |pos AS (SELECT unnest(range(1, 65)) AS ord),
             |m1 AS (SELECT a.cid, p.ord, avg(e.v[p.ord]) AS cv
             |  FROM a1 a JOIN emb e USING (id), pos p GROUP BY a.cid, p.ord),
             |c1 AS (SELECT cid, list(cv ORDER BY ord) AS v FROM m1 GROUP BY cid),
             |d2 AS (SELECT e.id, c.cid, list_cosine_similarity(e.v, c.v) AS s
             |  FROM emb e, c1 c),
             |a2 AS (SELECT id, cid FROM (SELECT id, cid, row_number() OVER (
             |    PARTITION BY id ORDER BY s DESC, cid ASC) AS rk FROM d2)
             |  WHERE rk = 1),
             |m2 AS (SELECT a.cid, p.ord, avg(e.v[p.ord]) AS cv
             |  FROM a2 a JOIN emb e USING (id), pos p GROUP BY a.cid, p.ord),
             |c2 AS (SELECT cid, list(cv ORDER BY ord) AS v FROM m2 GROUP BY cid),
             |rnk AS (SELECT a.id, a.cid, e.v, row_number() OVER (
             |    PARTITION BY a.cid
             |    ORDER BY list_cosine_similarity(e.v, c.v) ASC, a.id ASC) AS rk
             |  FROM a2 a JOIN emb e USING (id) JOIN c2 c ON a.cid = c.cid),
             |drp AS (SELECT DISTINCT b.id FROM rnk a JOIN rnk b
             |  ON a.cid = b.cid AND a.rk < b.rk
             |  AND list_cosine_similarity(a.v, b.v) >= 0.45)
             |SELECT r.id, CAST(r.cid AS INT) AS cluster, d.id IS NULL AS keep
             |FROM rnk r LEFT JOIN drp d ON r.id = d.id""".stripMargin)),

    // LSH-bucketed ANN (scale path) + embedding-cosine near-dup pairs —
    // approximate by construction: recall measured against brute force in
    // SimilaritySpec; rows-only here.
    // Portable-hash LSH: the hyperplane signs are exact i64 arithmetic over
    // md5-derived weights, so the oracle replays the buckets, the
    // hamming-1 multiprobe, and the cosine rerank — the full pipeline is
    // hash-verified (the MinHash precedent, extended to ANN).
    QueryDef("q_knn_lsh",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.lshTopK(corpus, queries, 10, nBits = 8, portable = true)
          .select(col("qid"), col("rank").cast("int").as("rank"), col("id"))
      },
      Some("""WITH emb AS (SELECT vec_id AS id,
             |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |iv AS (SELECT id,
             |    [CAST(floor(x * 1000000) AS BIGINT) for x in v] AS iv
             |  FROM emb),
             |w AS (SELECT j, d,
             |    (CAST(concat('0x', substr(md5(concat(j, ':', d)), 1, 15))
             |       AS BIGINT) % 1000003) - 500001 AS w
             |  FROM (SELECT unnest(generate_series(0, 7)) AS j),
             |       (SELECT unnest(generate_series(0, 127)) AS d)),
             |comp AS (SELECT i.id, w.j, sum(i.iv[w.d + 1] * w.w) AS s
             |  FROM iv i JOIN w ON w.d < len(i.iv) GROUP BY i.id, w.j),
             |bits AS (SELECT id,
             |    CAST(sum(CASE WHEN s >= 0 THEN 1 << j ELSE 0 END) AS BIGINT)
             |      AS bucket
             |  FROM comp GROUP BY id),
             |q AS (SELECT id AS qid, bucket AS b0 FROM bits WHERE id < 5),
             |probes AS (SELECT qid, b0 AS bucket FROM q
             |  UNION SELECT qid, xor(b0, CAST(1 << j AS BIGINT)) AS bucket
             |  FROM q, (SELECT unnest(generate_series(0, 7)) AS j)),
             |cand AS (SELECT DISTINCT p.qid, c.id
             |  FROM probes p JOIN bits c USING (bucket) WHERE c.id <> p.qid),
             |scored AS (SELECT cand.qid, cand.id,
             |    list_cosine_similarity(e1.v, e2.v) AS sim
             |  FROM cand JOIN emb e1 ON e1.id = cand.qid
             |            JOIN emb e2 ON e2.id = cand.id),
             |ranked AS (SELECT qid, id, row_number() OVER (
             |    PARTITION BY qid ORDER BY sim DESC, id ASC) AS rank
             |  FROM scored)
             |SELECT qid, CAST(rank AS INT) AS rank, id
             |FROM ranked WHERE rank <= 10""".stripMargin)),

    // IVF-flat ANN: k-means cells + nProbe search + exact rerank. Under
    // PORTABLE training (full-corpus deterministic Lloyd, the q_kmeans
    // replay) the oracle recomputes the cells, the final mean centroids,
    // the per-query probe ranking and the exact rerank — the whole IVF
    // pipeline is hash-verified. Recall additionally gated in
    // SimilaritySpec.
    QueryDef("q_knn_ivf",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfTopK(corpus, queries, 10, nList = 32, nProbe = 8,
            portable = true)
          .select(col("qid"), col("rank").cast("int").as("rank"), col("id"))
      },
      Some(ivfOracleSql)),

    // Persisted IVF layout: cells written partitioned by cid, queries scan
    // ONLY the probed partitions (file-level pruning — the durable form of
    // FAISS inverted lists). The portable index stores the SAME cells and
    // centroids as q_knn_ivf, so the oracle is identical; pruning and
    // equality-vs-in-memory additionally gated in SimilaritySpec.
    QueryDef("q_knn_ivf_indexed",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
        Similarity.saveIvfIndex(corpus, dir, nList = 32, portable = true)
        Similarity.ivfTopKIndexed(s, dir, queries, 10, nProbe = 8)
          .select(col("qid"), col("rank").cast("int").as("rank"), col("id"))
      },
      Some(ivfOracleSql)),

    // Product-quantization ANN (Jégou et al. 2011): 64 fp32 dims → 8 byte
    // codes, queries scored by ADC lookup tables over the codes — the
    // memory-scale ANN layout (32× compression). PORTABLE codebooks
    // (lowest-id unit-vector seeds, no Lloyd) make encode/ADC/rerank
    // engine-replayable: the oracle recomputes every code, every lookup
    // table, the ADC shortlist and the exact rerank. Recall additionally
    // gated in SimilaritySpec.
    QueryDef("q_knn_pq",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        // nBits=6 (64 centroids/subspace): ADC quality is set by the
        // refine stage; 64 cents cut the encode pass 4x vs 256
        graft.functions.Similarity.pqTopK(corpus, queries, 10, m = 8, nBits = 6,
            portable = true)
          .select(col("qid"), col("rank").cast("int").as("rank"), col("id"))
      },
      Some("""WITH emb AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
             |    FROM embeddings),
             |u AS (SELECT id, CASE WHEN nrm = 0 THEN v
             |    ELSE [x / nrm for x in v] END AS u
             |  FROM (SELECT id, v,
             |    sqrt(list_sum([x * x for x in v])) AS nrm FROM emb)),
             |seeds AS (SELECT u, row_number() OVER (ORDER BY id) - 1 AS cid
             |  FROM (SELECT id, u FROM u ORDER BY id LIMIT 64)),
             |sp AS (SELECT unnest(generate_series(0, 7)) AS j),
             |cb AS (SELECT j, cid, u[j*8+1 : j*8+8] AS cv FROM seeds, sp),
             |enc AS (SELECT id, j, cid AS code FROM (
             |    SELECT x.id, c.j, c.cid, row_number() OVER (
             |      PARTITION BY x.id, c.j
             |      ORDER BY list_inner_product(x.u[c.j*8+1 : c.j*8+8], c.cv)
             |        DESC, c.cid ASC) AS rk
             |    FROM u x, cb c) WHERE rk = 1),
             |q AS (SELECT id AS qid, u AS qu FROM u WHERE id < 5),
             |lut AS (SELECT q.qid, c.j, c.cid,
             |    list_inner_product(q.qu[c.j*8+1 : c.j*8+8], c.cv) AS lv
             |  FROM q, cb c),
             |adc AS (SELECT l.qid, e.id,
             |    list_sum(list(l.lv ORDER BY l.j)) AS sim
             |  FROM enc e JOIN lut l ON l.j = e.j AND l.cid = e.code
             |  WHERE e.id <> l.qid
             |  GROUP BY l.qid, e.id),
             |short AS (SELECT qid, id FROM (
             |    SELECT qid, id, row_number() OVER (PARTITION BY qid
             |      ORDER BY sim DESC, id ASC) AS rk FROM adc)
             |  WHERE rk <= 40),
             |ex AS (SELECT s.qid, s.id,
             |    list_inner_product(a.u, b.u) AS sim
             |  FROM short s JOIN u a ON a.id = s.id
             |    JOIN u b ON b.id = s.qid)
             |SELECT qid, CAST(row_number() OVER (PARTITION BY qid
             |    ORDER BY sim DESC, id ASC) AS INT) AS rank, id
             |FROM ex QUALIFY rank <= 10""".stripMargin)),

    // Portable-hash bucketed near-dup: same i64 hyperplane signs as
    // q_knn_lsh, so the oracle replays bucket assignment, the per-bucket
    // cap, the bucket-confined pair join and the cosine threshold. Pair
    // ids only (the exact-twin convention — no float column to ulp-flip).
    QueryDef("q_cosine_near_dup",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        Similarity.cosineNearDup(
          emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
          threshold = 0.40, nBits = 6, portable = true)
          .select(col("idA"), col("idB"))
      },
      Some("""WITH emb AS (SELECT vec_id AS id,
             |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |iv AS (SELECT id,
             |    [CAST(floor(x * 1000000) AS BIGINT) for x in v] AS iv
             |  FROM emb),
             |w AS (SELECT j, d,
             |    (CAST(concat('0x', substr(md5(concat(j, ':', d)), 1, 15))
             |       AS BIGINT) % 1000003) - 500001 AS w
             |  FROM (SELECT unnest(generate_series(0, 5)) AS j),
             |       (SELECT unnest(generate_series(0, 127)) AS d)),
             |comp AS (SELECT i.id, w.j, sum(i.iv[w.d + 1] * w.w) AS s
             |  FROM iv i JOIN w ON w.d < len(i.iv) GROUP BY i.id, w.j),
             |bits AS (SELECT id,
             |    CAST(sum(CASE WHEN s >= 0 THEN 1 << j ELSE 0 END) AS BIGINT)
             |      AS bucket
             |  FROM comp GROUP BY id),
             |capped AS (SELECT id, bucket, row_number() OVER (
             |    PARTITION BY bucket ORDER BY id) AS rn
             |  FROM bits QUALIFY rn <= 1024)
             |SELECT a.id AS idA, b.id AS idB
             |FROM capped a JOIN capped b ON a.bucket = b.bucket
             |  AND a.id < b.id
             |JOIN emb ea ON ea.id = a.id JOIN emb eb ON eb.id = b.id
             |WHERE list_cosine_similarity(ea.v, eb.v) >= 0.40""".stripMargin)),

    // Exact brute-force twin of q_cosine_near_dup: every pair over the
    // threshold (the LSH-bucketed form above trades recall for the
    // bucketed join, so it stays rows-only; the exact pair set is
    // relationally replayable — DuckDB list_cosine_similarity).
    QueryDef("q_cosine_near_dup_exact",
      (s, d) => {
        // UNIT-NORMALIZE each vector once before the pair join: cosine
        // then costs one dot fold per pair instead of dot + two norms
        val emb = t(s, d, "embeddings")
          .filter(col("vec_id") < 800)
          .select(col("vec_id").as("id"),
            Similarity.asDouble(col("embedding")).as("v"))
          // norm hoisted to its own column: inside the transform lambda
          // the fold would re-evaluate per ELEMENT (O(d²) per vector);
          // Similarity.dot(v, v) is the fused native sum of squares
          .withColumn("__n", sqrt(Similarity.dot(col("v"), col("v"))))
          .select(col("id"),
            transform(col("v"), x => x / col("__n")).as("u"))
        val a = emb.select(col("id").as("idA"), col("u").as("uA"))
        val b = emb.select(col("id").as("idB"), col("u").as("uB"))
        a.crossJoin(b).filter(col("idA") < col("idB"))
          .filter(Similarity.dot(col("uA"), col("uB")) >= 0.40)
          .select(col("idA"), col("idB"))
      },
      Some("""SELECT a.vec_id AS idA, b.vec_id AS idB
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE a.vec_id < 800 AND b.vec_id < 800
             |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.40
             |""".stripMargin)),

    // Repetition quality signals (Gopher-style filters, Rae et al. 2021
    // §A1.1): duplicate-line fraction, top-bigram coverage, duplicate-
    // bigram coverage — the pre-training boilerplate/spam drop criteria.
    QueryDef("q_text_repetition",
      (s, d) => t(s, d, "documents")
        // tokens/shingles materialize ONCE per row: lambda-heavy signal
        // expressions re-evaluate inline subtrees per element otherwise
        .withColumn("__toks", TextFunctions.tokens(col("text")))
        .withColumn("__sh", TextFunctions.shinglesOf(col("__toks"), 2))
        .select(col("doc_id"),
          round(TextFunctions.duplicateLineFraction(col("text")), 4).as("dup_line_frac"),
          round(TextFunctions.topNgramFractionOf(col("__sh"), size(col("__toks")), 2), 4)
            .as("top_bigram_frac"),
          round(TextFunctions.duplicateNgramFractionOf(col("__sh"), size(col("__toks")), 2), 4)
            .as("dup_bigram_frac")),
      Some("""WITH tok AS (
             |  SELECT doc_id, text,
             |    list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0) AS t
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, t,
             |    CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
             |    ELSE list_transform(generate_series(1, len(t) - 1),
             |      i -> array_to_string(t[i:i+1], ' ')) END AS s,
             |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
             |      l -> l <> '') AS lines
             |  FROM tok)
             |SELECT doc_id,
             |  round(CASE WHEN len(lines) = 0 THEN 0.0
             |    ELSE (len(lines) - len(list_distinct(lines))) / len(lines)::double END, 4) AS dup_line_frac,
             |  round(CASE WHEN len(t) = 0 OR len(s) = 0 THEN 0.0
             |    ELSE list_max(list_transform(list_distinct(s),
             |      g -> len(list_filter(s, x -> x = g)))) * 2 / len(t)::double END, 4) AS top_bigram_frac,
             |  round(CASE WHEN len(t) = 0 THEN 0.0
             |    ELSE least((len(s) - len(list_distinct(s))) * 2 / len(t)::double, 1.0) END, 4) AS dup_bigram_frac
             |FROM sh""".stripMargin)),

    // Text analysis: token counts (whitespace + BPE-ish regex).
    QueryDef("q_token_count",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_bpe"),
          col("n_chars")),
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0)) AS BIGINT) AS n_tokens,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe,
             |  n_chars
             |FROM documents""".stripMargin)),

    // Context-window chunking: 50-token windows, 10-token overlap — the
    // training-data splitting stage; oracle re-derives windows with
    // generate_series + list_slice.
    QueryDef("q_text_chunks",
      (s, d) => t(s, d, "documents")
        .withColumn("__toks", TextFunctions.tokens(col("text")))
        .select(col("doc_id"),
          explode(TextFunctions.chunksOf(col("__toks"), 50, 10)).as("c"))
        .select(col("doc_id"), col("c.idx").as("idx"),
          col("c.chunk").as("chunk"), col("c.n_tokens").as("n_tokens")),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0) AS toks
             |  FROM documents),
             |n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
             |c AS (SELECT doc_id, toks, n,
             |    greatest(1, CAST(floor((n + 29) / 40.0) AS INT)) AS nc FROM n),
             |e AS (SELECT doc_id, toks, n,
             |    unnest(generate_series(0, nc - 1)) AS i FROM c)
             |SELECT doc_id, CAST(i AS INT) AS idx,
             |  array_to_string(list_slice(toks, i*40 + 1, least(i*40 + 50, n)), ' ') AS chunk,
             |  CAST(least(i*40 + 50, n) - i*40 AS INT) AS n_tokens
             |FROM e""".stripMargin)),

    // Language-ID heuristic (stopword hit rate) — deterministic formula,
    // identical on both sides.
    QueryDef("q_lang_id",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextFunctions.langId(col("text")).as("pred_lang"))
        .groupBy(col("pred_lang")).agg(count(lit(1)).as("n")),
      Some("""WITH toks AS (SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0) AS tk
             |  FROM documents),
             |r AS (SELECT doc_id, CASE WHEN len(tk) = 0 THEN 0.0
             |    ELSE CAST(len(list_filter(tk, w -> list_contains(
             |      ['the','a','of','and','to','in','is','on','for','with'], w))) AS DOUBLE) / len(tk)
             |    END AS ratio FROM toks)
             |SELECT CASE WHEN ratio >= 0.08 THEN 'en' ELSE 'other' END AS pred_lang,
             |  count(*) AS n
             |FROM r GROUP BY 1""".stripMargin)),

    // Quality scoring (length/alpha/punctuation/stopword blend).
    QueryDef("q_quality_score",
      (s, d) => t(s, d, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality")),
      Some("""WITH base AS (SELECT doc_id, text,
             |    CAST(length(text) AS DOUBLE) AS len,
             |    list_filter(string_split_regex(lower(text), '\s+'), w -> length(w) > 0) AS tk
             |  FROM documents WHERE doc_id < 500),
             |m AS (SELECT doc_id,
             |    least(len / 500.0, 1.0) AS len_score,
             |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / greatest(len, 1.0) AS alpha,
             |    1.0 - least(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / greatest(len, 1.0) * 10.0, 1.0) AS punct_score,
             |    least(CASE WHEN len(tk) = 0 THEN 0.0
             |      ELSE CAST(len(list_filter(tk, w -> list_contains(
             |        ['the','a','of','and','to','in','is','on','for','with'], w))) AS DOUBLE) / len(tk) END * 4.0, 1.0) AS stop_score
             |  FROM base)
             |SELECT doc_id, round(len_score * 0.3 + alpha * 0.3 + punct_score * 0.2 + stop_score * 0.2, 4) AS quality
             |FROM m""".stripMargin)),

    // Gopher rule-based quality filters (Rae et al. 2021 §A1.1): word
    // count, mean word length, symbol-to-word ratio, alphabetic-word
    // ratio, stopword count — each signal plus the combined keep verdict,
    // replayed exactly by the oracle. One narrow map, no shuffle.
    QueryDef("q_gopher_rules",
      (s, d) => graft.functions.Curation.gopherRules(docs(s, d)),
      Some("""WITH tk AS (SELECT doc_id AS id, text,
             |    list_filter(string_split_regex(text, '\s+'),
             |      w -> length(w) > 0) AS ws
             |  FROM documents),
             |sig AS (SELECT id,
             |    CAST(len(ws) AS BIGINT) AS n_words,
             |    CASE WHEN len(ws) = 0 THEN 0.0 ELSE round(
             |      CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
             |        / len(ws), 4) END AS mean_word_len,
             |    CAST(len(list_filter(ws, w -> list_contains(
             |      ['the','a','of','and','to','in','is','on','for','with'],
             |      lower(w)))) AS BIGINT) AS stopword_count,
             |    CAST(len(regexp_extract_all(text, '#'))
             |      + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
             |      / greatest(len(ws), 1) AS symbol_ratio,
             |    CASE WHEN len(ws) = 0 THEN 0.0 ELSE
             |      CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
             |        AS DOUBLE) / len(ws) END AS alpha_word_ratio
             |  FROM tk)
             |SELECT id, n_words, mean_word_len, stopword_count,
             |  round(symbol_ratio, 4) AS symbol_ratio,
             |  round(alpha_word_ratio, 4) AS alpha_word_ratio,
             |  n_words BETWEEN 50 AND 100000
             |    AND mean_word_len BETWEEN 3 AND 10
             |    AND symbol_ratio < 0.1 AND alpha_word_ratio >= 0.8
             |    AND stopword_count >= 2 AS keep
             |FROM sig""".stripMargin)),

    // Character-entropy quality signal (bits/char): low = repeated-char
    // spam, high = encoded blobs. Map-side higher-order functions only; the
    // oracle re-derives the same distribution with an unnest + groupBy.
    QueryDef("q_char_entropy",
      (s, d) => docs(s, d).select(col("id"),
        round(TextFunctions.charEntropy(col("text")), 4).as("entropy")),
      Some("""WITH ch AS (SELECT doc_id AS id,
             |    unnest(regexp_extract_all(text, '.')) AS c FROM documents),
             |cc AS (SELECT id, c, count(*) AS k FROM ch GROUP BY id, c),
             |n AS (SELECT id, CAST(sum(k) AS DOUBLE) AS n FROM cc GROUP BY id)
             |SELECT cc.id, round(-sum((k / n) * log2(k / n)), 4) AS entropy
             |FROM cc JOIN n USING (id) GROUP BY cc.id""".stripMargin)),

    // The composed curation pipeline end to end — quality filter (Gopher
    // rules) → exact dedup among survivors → deterministic split → per-split
    // doc/token accounting — one lazily-planned DAG, exactly how the
    // stages chain in production; the oracle replays every stage in order.
    QueryDef("q_curation_pipeline",
      (s, d) => {
        val base = docs(s, d)
        val kept = graft.functions.Curation.gopherRules(base)
          .filter(col("keep")).select("id")
        val survivors = base.join(kept, "id")
        val canon = Dedup.exactCanonical(survivors)
          .filter(col("keep")).select("id")
        survivors.join(canon, "id")
          .select(graft.functions.Curation.splitLabel(col("id")).as("split"),
            TextFunctions.tokenCount(col("text")).cast("long").as("ntok"))
          .groupBy("split")
          .agg(count(lit(1)).as("n"), sum("ntok").as("tokens"))
      },
      Some("""WITH tk AS (SELECT doc_id AS id, text,
             |    list_filter(string_split_regex(text, '\s+'),
             |      w -> length(w) > 0) AS ws
             |  FROM documents),
             |keepers AS (SELECT id, text, ws FROM tk
             |  WHERE len(ws) BETWEEN 50 AND 100000
             |    AND (CASE WHEN len(ws) = 0 THEN 0.0 ELSE round(
             |      CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
             |        / len(ws), 4) END) BETWEEN 3 AND 10
             |    AND CAST(len(regexp_extract_all(text, '#'))
             |      + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
             |      / greatest(len(ws), 1) < 0.1
             |    AND CAST(len(list_filter(ws,
             |        w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
             |      / len(ws) >= 0.8
             |    AND len(list_filter(ws, w -> list_contains(
             |      ['the','a','of','and','to','in','is','on','for','with'],
             |      lower(w)))) >= 2),
             |ded AS (SELECT id, ws,
             |    min(id) OVER (PARTITION BY md5(text)) AS canon
             |  FROM keepers),
             |lab AS (SELECT
             |    CASE WHEN substr(md5(CAST(id AS VARCHAR)), 1, 1) IN ('c','d')
             |         THEN 'val'
             |         WHEN substr(md5(CAST(id AS VARCHAR)), 1, 1) IN ('e','f')
             |         THEN 'test' ELSE 'train' END AS split,
             |    len(ws) AS ntok
             |  FROM ded WHERE id = canon)
             |SELECT split, count(*) AS n, CAST(sum(ntok) AS BIGINT) AS tokens
             |FROM lab GROUP BY split""".stripMargin)),

    // Document fingerprints: order-insensitive md5 over the sorted word set
    // (oracle-checked) — the rolling-hash variant is spec-tested.
    QueryDef("q_fingerprint",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextFunctions.wordSetFingerprint(col("text")).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("representative"), count(lit(1)).as("n")),
      Some("""SELECT md5(array_to_string(list_sort(list_distinct(
             |    list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0))), ' ')) AS fp,
             |  min(doc_id) AS representative, count(*) AS n
             |FROM documents GROUP BY 1""".stripMargin)),

    // Fulltext BM25 (reference FulltextProcedures.java:90, Lucene BM25):
    // posting lists + the standard formula, top-20 — the oracle mirrors the
    // exact computation (tokenizer, idf, length norm) in DuckDB.
    QueryDef("q_fulltext_bm25",
      (s, d) => graft.functions.Fulltext.bm25TopK(
        t(s, d, "documents"), "doc_id", "text",
        query = "spark filter join window", k = 20),
      Some("""WITH tf AS (
             |  SELECT doc_id AS id, term, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
             |    FROM documents) WHERE term <> '' GROUP BY doc_id, term),
             |dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY id),
             |corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
             |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |q AS (SELECT unnest(['spark','filter','join','window']) AS term),
             |scores AS (
             |  SELECT tf.id, sum(
             |    ln(1 + (corpus.n - dft.df + 0.5) / (dft.df + 0.5)) *
             |    (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / corpus.avgdl))) AS score
             |  FROM tf JOIN q USING (term) JOIN dl ON dl.id = tf.id
             |  JOIN dft ON dft.term = tf.term CROSS JOIN corpus
             |  GROUP BY tf.id)
             |SELECT id, round(score, 4) AS score FROM scores
             |ORDER BY round(score, 4) DESC, id ASC LIMIT 20""".stripMargin)),

    // Corpus datasheet: the data-card numbers (docs/tokens/chars,
    // exact-dup rate, per-language shares plus the roll-up) in one
    // partial-aggregable pass, replayed exactly by the oracle.
    QueryDef("q_corpus_report",
      (s, d) => graft.functions.Curation.corpusReport(docs(s, d)),
      Some("""WITH base AS (SELECT lang,
             |    CAST(len(list_filter(string_split_regex(text, '\s+'),
             |      t -> length(t) > 0)) AS BIGINT) AS t,
             |    CAST(length(text) AS BIGINT) AS c, md5(text) AS h
             |  FROM documents),
             |rolled AS (SELECT lang, t, c, h FROM base
             |  UNION ALL SELECT '__total', t, c, h FROM base)
             |SELECT lang, count(*) AS docs, CAST(sum(t) AS BIGINT) AS tokens,
             |  CAST(sum(c) AS BIGINT) AS chars,
             |  CAST(count(DISTINCT h) AS BIGINT) AS distinct_texts,
             |  round(1.0 - count(DISTINCT h) / count(*), 4) AS dup_rate
             |FROM rolled GROUP BY lang""".stripMargin)),

    // Deterministic negative sampling (DPR/CLIP batch construction): 4
    // pseudo-random customer negatives per (order, customer) positive
    // pair, multiplicative-hash probes over a two-phase dense pool index
    // — pure integer arithmetic, so the oracle replays every probe, the
    // positive/duplicate drops, and the slot ranks exactly.
    QueryDef("q_negative_samples",
      (s, d) => graft.functions.Curation.negativeSamples(
        t(s, d, "orders").filter(col("o_orderkey") < 2000)
          .select(col("o_orderkey").cast("long").as("q"),
            col("o_custkey").cast("long").as("p")),
        "q", "p",
        t(s, d, "customer").select(col("c_custkey").cast("long").as("cid")),
        "cid", k = 4),
      Some("""WITH pool AS (
             |  SELECT DISTINCT CAST(c_custkey AS BIGINT) AS pid FROM customer),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pool),
             |idx AS (SELECT pid, row_number() OVER (ORDER BY pid) - 1 AS i
             |  FROM pool),
             |probes AS (
             |  SELECT CAST(o_orderkey AS BIGINT) AS qid,
             |    CAST(o_custkey AS BIGINT) AS pos, j.j AS j,
             |    ((o_orderkey % 100000) * 2654435761 + j.j) % n.n AS i
             |  FROM orders, (SELECT unnest(generate_series(0, 4)) AS j) j, n
             |  WHERE o_orderkey < 2000),
             |hit AS (SELECT qid, pos, j, pid FROM probes
             |  JOIN idx USING (i) WHERE pid <> pos),
             |ded AS (SELECT *, row_number() OVER (
             |    PARTITION BY qid, pid ORDER BY j) AS f FROM hit),
             |slotted AS (SELECT qid, pos, pid AS neg, row_number() OVER (
             |    PARTITION BY qid ORDER BY j) AS slot
             |  FROM ded WHERE f = 1)
             |SELECT qid, pos, neg, CAST(slot AS INT) AS slot
             |FROM slotted WHERE slot <= 4""".stripMargin)),

    // JSONL round-trip (the LLM-training interchange format): export the
    // documents table as JSONL (name-sorted keys, nulls omitted), read
    // it back with an explicit schema, and aggregate — the oracle runs
    // the same aggregate on the original table, so any serialization
    // loss (encoding, truncation, type drift) breaks the hash.
    QueryDef("q_jsonl_roundtrip",
      (s, d) => {
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_" +
          Integer.toHexString(d.hashCode)
        val src = docs(s, d).select(col("id"), col("text"), col("lang"),
          col("source"))
        graft.sources.Jsonl.save(src, path)
        graft.sources.Jsonl.load(s, path, Some(src.schema))
          .groupBy("lang").agg(count(lit(1)).as("n"),
            sum(length(col("text"))).as("chars"),
            countDistinct("source").as("sources"))
      },
      Some("""SELECT lang, count(*) AS n,
             |  CAST(sum(length(text)) AS BIGINT) AS chars,
             |  CAST(count(DISTINCT source) AS BIGINT) AS sources
             |FROM documents GROUP BY lang""".stripMargin)),

    // Boolean + phrase query syntax (the Lucene-subset surface of the
    // reference's db.index.fulltext.queryNodes): MUST term, MUST phrase
    // (adjacency on the analyzed token stream), MUST_NOT term, two SHOULD
    // terms contributing BM25 score. The oracle replays every clause as
    // posting-list membership filters plus one normalized-text contains.
    QueryDef("q_fulltext_boolean",
      (s, d) => graft.functions.Fulltext.booleanTopK(
        t(s, d, "documents"), "doc_id", "text",
        query = "+spark \"fast merge\" -window table batch", k = 20),
      Some("""WITH tf AS (
             |  SELECT doc_id AS id, term, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
             |    FROM documents) WHERE term <> '' GROUP BY doc_id, term),
             |dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY id),
             |corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
             |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |ph AS (SELECT doc_id AS id FROM documents
             |  WHERE contains(' ' || array_to_string(list_filter(
             |      string_split_regex(lower(text), '[^a-z0-9]+'),
             |      t -> t <> ''), ' ') || ' ', ' fast merge ')),
             |eligible AS (
             |  SELECT DISTINCT id FROM tf
             |  WHERE term IN ('spark', 'table', 'batch')
             |    AND id IN (SELECT id FROM tf WHERE term = 'spark')
             |    AND id IN (SELECT id FROM ph)
             |    AND id NOT IN (SELECT id FROM tf WHERE term = 'window')),
             |q AS (SELECT unnest(['spark', 'table', 'batch']) AS term),
             |scores AS (
             |  SELECT tf.id, sum(
             |    ln(1 + (corpus.n - dft.df + 0.5) / (dft.df + 0.5)) *
             |    (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / corpus.avgdl))) AS score
             |  FROM tf JOIN q USING (term) JOIN dl ON dl.id = tf.id
             |  JOIN dft ON dft.term = tf.term CROSS JOIN corpus
             |  WHERE tf.id IN (SELECT id FROM eligible)
             |  GROUP BY tf.id)
             |SELECT id, round(score, 4) AS score FROM scores
             |ORDER BY round(score, 4) DESC, id ASC LIMIT 20""".stripMargin)),

    // Persisted fulltext index: the same BM25 top-20 served from the
    // on-disk bucket-partitioned posting lists — build + partition-pruned
    // query (only the query terms' hash buckets are read). Same oracle as
    // q_fulltext_bm25: the index must not change a single score or rank.
    QueryDef("q_fulltext_indexed",
      (s, d) => {
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_ftidx_" +
          Integer.toHexString(d.hashCode)
        graft.functions.Fulltext.saveTextIndex(
          t(s, d, "documents"), "doc_id", "text", path)
        graft.functions.Fulltext.queryTextIndex(
          s, path, "spark filter join window", k = 20)
      },
      Some("""WITH tf AS (
             |  SELECT doc_id AS id, term, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
             |    FROM documents) WHERE term <> '' GROUP BY doc_id, term),
             |dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY id),
             |corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
             |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |q AS (SELECT unnest(['spark','filter','join','window']) AS term),
             |scores AS (
             |  SELECT tf.id, sum(
             |    ln(1 + (corpus.n - dft.df + 0.5) / (dft.df + 0.5)) *
             |    (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / corpus.avgdl))) AS score
             |  FROM tf JOIN q USING (term) JOIN dl ON dl.id = tf.id
             |  JOIN dft ON dft.term = tf.term CROSS JOIN corpus
             |  GROUP BY tf.id)
             |SELECT id, round(score, 4) AS score FROM scores
             |ORDER BY round(score, 4) DESC, id ASC LIMIT 20""".stripMargin)),

    // Relationship fulltext (reference FulltextProcedures.java:120
    // db.index.fulltext.queryRelationships): documents' text carried as a
    // `caption` property on AUTHORED rels, queried via the procedure
    // surface with the default analyzer. Same BM25 oracle as
    // q_fulltext_bm25 — rel id = doc_id, so the id spaces line up.
    QueryDef("q_fulltext_rels",
      (s, d) => {
        val docs = t(s, d, "documents")
        val nodes = docs.select((col("doc_id") + 1000000).as("id"),
          lit(Array("Document")).as("labels"))
        val rels = docs.select(col("doc_id").as("id"),
          lit(0L).as("src"), (col("doc_id") + 1000000).as("dst"),
          lit("AUTHORED").as("type"), col("text").as("caption"))
        graft.functions.Procedures.call(s,
          graft.graph.PropertyGraph(nodes, rels),
          "db.index.fulltext.queryRelationships",
          "caption", "spark filter join window", Int.box(20))
      },
      Some("""WITH tf AS (
             |  SELECT doc_id AS id, term, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
             |    FROM documents) WHERE term <> '' GROUP BY doc_id, term),
             |dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY id),
             |corpus AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
             |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |q AS (SELECT unnest(['spark','filter','join','window']) AS term),
             |scores AS (
             |  SELECT tf.id, sum(
             |    ln(1 + (corpus.n - dft.df + 0.5) / (dft.df + 0.5)) *
             |    (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / corpus.avgdl))) AS score
             |  FROM tf JOIN q USING (term) JOIN dl ON dl.id = tf.id
             |  JOIN dft ON dft.term = tf.term CROSS JOIN corpus
             |  GROUP BY tf.id)
             |SELECT id, round(score, 4) AS score FROM scores
             |ORDER BY round(score, 4) DESC, id ASC LIMIT 20""".stripMargin)),

    // Multimodal binary columns: documents' text re-materialized as BINARY
    // payloads (UTF-8 bytes), then content-hash dedup + byte sizing — the
    // metadata pass every image/audio corpus runs before decode. Oracle
    // hashes the same bytes in DuckDB.
    // REAL audio decode round trip: build canonical WAV payloads (PCM16
    // samples derived from nation keys) as binary IN Spark, decode them
    // back with wavSamples, compute RMS/peak/zero-crossings — the oracle
    // re-derives the features from the closed-form sample values, so any
    // decode bug (endianness, offset, sign) breaks the hash match.
    QueryDef("q_multimodal_audio",
      (s, d) => {
        def le32(x: Int) = Array(x.toByte, (x >> 8).toByte, (x >> 16).toByte, (x >> 24).toByte)
        def le16(x: Int) = Array(x.toByte, (x >> 8).toByte)
        val header: Array[Byte] =
          "RIFF".getBytes("ASCII") ++ le32(36 + 8) ++ "WAVE".getBytes("ASCII") ++
          "fmt ".getBytes("ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
          le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
          "data".getBytes("ASCII") ++ le32(8)
        val headerHex = header.map("%02X".format(_)).mkString
        def le16hex(c: org.apache.spark.sql.Column) = {
          val h = lpad(hex(pmod(c.cast("long"), lit(65536L))), 4, "0")
          concat(h.substr(3, 2), h.substr(1, 2))
        }
        val k = col("n_nationkey").cast("long")
        val wav = unhex(concat(lit(headerHex),
          le16hex(k * 3), le16hex(-k * 2), le16hex(k + 1000), le16hex(-k * 5)))
        t(s, d, "nation").filter(col("n_nationkey").between(1, 24))
          .select(k.as("key"), wav.as("payload"))
          .select(col("key"),
            graft.functions.Multimodal.sniffMime(col("payload")).as("mime"),
            round(graft.functions.Multimodal.wavRms(col("payload")), 4).as("rms"),
            graft.functions.Multimodal.wavPeak(col("payload")).as("peak"),
            graft.functions.Multimodal.wavZeroCrossings(col("payload")).as("zc"))
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS key, 'audio/wav' AS mime,
             |  round(sqrt((9.0*n_nationkey*n_nationkey + 4.0*n_nationkey*n_nationkey +
             |    (1000.0+n_nationkey)*(1000.0+n_nationkey) +
             |    25.0*n_nationkey*n_nationkey) / 4), 4) AS rms,
             |  CAST(1000 + n_nationkey AS INT) AS peak, 3 AS zc
             |FROM nation WHERE n_nationkey BETWEEN 1 AND 24""".stripMargin)),

    QueryDef("q_multimodal_binary",
      (s, d) => graft.functions.Multimodal.dedupExact(
        t(s, d, "documents").select(col("doc_id"), col("text").cast("binary").as("payload")),
        "doc_id", "payload"),
      Some("""SELECT sha256(text) AS h, min(doc_id) AS representative,
             |  count(*) AS dupCount, max(CAST(strlen(text) AS BIGINT)) AS bytes
             |FROM documents GROUP BY 1""".stripMargin)),

    // Z-ordered spatial layout (space-filling-curve clustering — the
    // columnar analog of the reference's SpaceFillingCurve point index):
    // customers scatter to pseudo-coordinates, the table persists
    // partitioned by Morton-curve prefix, and the bbox query reads only
    // intersecting curve cells (partition-pruned, gated in ZOrderSpec)
    // before the exact predicate. The oracle filters the same box
    // directly — pruning must be invisible to results.
    QueryDef("q_spatial_zorder",
      (s, d) => {
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_" +
          Integer.toHexString(d.hashCode)
        val pts = t(s, d, "customer")
          .select(col("c_custkey").cast("long").as("key"),
            (col("c_custkey") % 97).cast("double").as("px"),
            (col("c_custkey") % 89).cast("double").as("py"))
        graft.functions.Spatial.saveZOrdered(pts, "px", "py", path,
          0.0, 97.0, 0.0, 89.0, bits = 12, prefixBits = 6)
        graft.functions.Spatial.queryBBox(s, path, 10.0, 20.0, 30.0, 40.0)
          .select(col("key"), col("px"), col("py"))
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS key,
             |  CAST(c_custkey % 97 AS DOUBLE) AS px,
             |  CAST(c_custkey % 89 AS DOUBLE) AS py
             |FROM customer
             |WHERE c_custkey % 97 BETWEEN 10 AND 30
             |  AND c_custkey % 89 BETWEEN 20 AND 40""".stripMargin)),

    // JPEG frame-header parsing: each part synthesizes a real JFIF byte
    // stream (SOI, APP0, DQT, then SOF0 carrying psize-derived dims) and
    // the marker-segment WALK — offsets chained through variable-length
    // segments as a codegen fold — must recover height/width. The oracle
    // computes the planted dims directly; any walk misstep nulls or
    // shifts them and breaks the hash.
    QueryDef("q_multimodal_jpeg",
      (s, d) => {
        val h = lpad(hex(col("p_size") + 100), 4, "0")
        val w = lpad(hex(col("p_size") + 200), 4, "0")
        val jpeg = unhex(concat(
          lit("FFD8"),                                       // SOI
          lit("FFE000104A46494600010100000100010000"),       // APP0 (len 16)
          lit("FFDB0005AABBCC"),                             // DQT (len 5)
          lit("FFC0000B08"), h, w, lit("01011100")))         // SOF0 (len 11)
        t(s, d, "part").filter(col("p_partkey") <= 200)
          .select(col("p_partkey").cast("long").as("key"), jpeg.as("bin"))
          .select(col("key"),
            graft.functions.Multimodal.jpegHeight(col("bin")).as("h"),
            graft.functions.Multimodal.jpegWidth(col("bin")).as("w"))
      },
      Some("""SELECT CAST(p_partkey AS BIGINT) AS key,
             |  CAST(p_size + 100 AS BIGINT) AS h,
             |  CAST(p_size + 200 AS BIGINT) AS w
             |FROM part WHERE p_partkey <= 200""".stripMargin)),

    // Benchmark decontamination: corpus docs sharing any word 3-gram with
    // the "benchmark" slice (doc_id % 41 = 0). Benchmark shingles
    // broadcast; corpus shingles reduce to xxhash64 keys (equality-only —
    // the oracle recomputes with the actual strings).
    QueryDef("q_decontaminate",
      (s, d) => {
        val all = docs(s, d)
        graft.functions.Curation.decontaminate(
          all.filter(col("id") % 41 =!= 0), all.filter(col("id") % 41 === 0),
          n = 3)
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0) AS ws
             |  FROM documents),
             |ngrams AS (
             |  SELECT doc_id, unnest(list_transform(
             |    range(1, greatest(len(ws) - 2, 0) + 1),
             |    i -> array_to_string(ws[i:i+2], ' '))) AS ng
             |  FROM toks),
             |bench AS (SELECT DISTINCT ng FROM ngrams WHERE doc_id % 41 = 0)
             |SELECT doc_id AS id, count(DISTINCT ng) AS overlap_ngrams
             |FROM ngrams JOIN bench USING (ng)
             |WHERE doc_id % 41 <> 0 GROUP BY doc_id""".stripMargin)),

    // PII redaction: emails / IPv4 / phone-shaped digit runs replaced with
    // typed placeholders. Synthetic PII is appended deterministically from
    // doc_id so both engines redact the same strings; results compare by
    // md5 of the redacted text.
    QueryDef("q_redact_pii",
      (s, d) => docs(s, d).select(col("id"),
        md5(graft.functions.Curation.redactPii(concat(
          col("text"), lit(" contact user"), col("id"),
          lit("@example.com at 10.1.2."), col("id") % 250,
          lit(" or +1 555 010 "), lit(1000) + col("id") % 9000))).as("h")),
      Some("""SELECT doc_id AS id,
             |  md5(regexp_replace(regexp_replace(regexp_replace(
             |    concat(text, ' contact user', doc_id, '@example.com at 10.1.2.',
             |      doc_id % 250, ' or +1 555 010 ', 1000 + doc_id % 9000),
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
             |    '\+?\d[\d -]{7,}\d', '[PHONE]', 'g')) AS h
             |FROM documents""".stripMargin)),

    // Deterministic content-independent train/val/test split: first hex
    // digit of md5(doc_id) — 12/16, 2/16, 2/16. A doc's split never
    // changes as the corpus grows (no seeded shuffle to replay).
    QueryDef("q_split_deterministic",
      (s, d) => docs(s, d)
        .select(graft.functions.Curation.splitLabel(col("id")).as("split"),
          TextFunctions.tokenCount(col("text")).cast("long").as("ntok"))
        .groupBy("split").agg(count(lit(1)).as("n"), sum("ntok").as("tokens")),
      Some("""WITH lab AS (SELECT
             |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d')
             |         THEN 'val'
             |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f')
             |         THEN 'test' ELSE 'train' END AS split,
             |    len(list_filter(string_split_regex(text, '\s+'),
             |      w -> length(w) > 0)) AS ntok
             |  FROM documents)
             |SELECT split, count(*) AS n, CAST(sum(ntok) AS BIGINT) AS tokens
             |FROM lab GROUP BY split""".stripMargin)),

    // Deterministic stratified downsampling (corpus mixing): keep all
    // English, half of French, a quarter of everything else — md5-keyed
    // per-row decisions both engines replay exactly.
    QueryDef("q_stratified_sample",
      (s, d) => graft.functions.Curation.stratifiedSample(
          docs(s, d), "id", "lang",
          Map("en" -> 1.0, "fr" -> 0.5), defaultRate = 0.25)
        .groupBy("lang").agg(count(lit(1)).as("n")),
      Some("""SELECT lang, count(*) AS n FROM documents
             |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
             |  CASE lang WHEN 'en' THEN 'zz' WHEN 'fr' THEN '80'
             |  ELSE '40' END
             |GROUP BY lang""".stripMargin)),

    // Bigram-LM quality scoring (CCNet-style perplexity filter): add-0.5
    // smoothed bigram model self-trained on the corpus; each doc scored by
    // mean negative log P(w2|w1) over its bigram instances. Count tables
    // are vocabulary-bounded; the corpus is never collected.
    QueryDef("q_lm_quality",
      (s, d) => graft.functions.Curation.bigramLmScore(docs(s, d)),
      Some("""WITH toks AS (SELECT doc_id, list_filter(
             |    string_split_regex(text, '\s+'), w -> length(w) > 0) AS ws
             |  FROM documents),
             |big AS (SELECT doc_id, unnest(list_transform(
             |    range(1, greatest(len(ws) - 1, 0) + 1),
             |    i -> array_to_string(ws[i:i+1], ' '))) AS b
             |  FROM toks),
             |cb AS (SELECT b, count(*) AS cb FROM big GROUP BY b),
             |cu AS (SELECT w, count(*) AS cu
             |  FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w),
             |v AS (SELECT count(*) AS v FROM cu)
             |SELECT doc_id AS id,
             |  round(-avg(ln((cb + 0.5) / (cu + 0.5 * v))), 4) AS nll
             |FROM big JOIN cb USING (b)
             |  JOIN cu ON split_part(b, ' ', 1) = cu.w, v
             |GROUP BY doc_id""".stripMargin)),

    // Per-doc top-3 tf-idf keywords (smoothed sklearn idf), ties by term.
    QueryDef("q_tfidf",
      (s, d) => graft.functions.Curation.tfidfTopTerms(
        docs(s, d).filter(col("id") < 200), k = 3),
      Some("""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
             |n AS (SELECT count(*) AS n FROM docs),
             |terms AS (SELECT doc_id, unnest(list_filter(
             |    string_split_regex(text, '\s+'), w -> length(w) > 0)) AS term
             |  FROM docs),
             |tf AS (SELECT doc_id, term, count(*) AS tf
             |  FROM terms GROUP BY doc_id, term),
             |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |scored AS (SELECT doc_id, term,
             |    round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 4) AS score
             |  FROM tf JOIN dfreq USING (term), n)
             |SELECT doc_id AS id, term, score, CAST(rank AS INT) AS rank
             |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
             |    ORDER BY score DESC, term ASC) AS rank FROM scored)
             |WHERE rank <= 3""".stripMargin)),

    // DSIR importance weights (Xie et al. 2023): mean per-token log ratio
    // of add-1-smoothed unigram probabilities, target = English docs vs
    // the whole corpus. Deterministic up to fp summation order → 4dp.
    // Hash-stability hardening (both sides, identically): a 1e-9 shift
    // before rounding so cross-engine ln ULP noise can't flip a 4-dp
    // boundary, and `+ 0.0` after so a weight that rounds to zero can't
    // surface as IEEE -0.0 on one engine and +0.0 on the other (DuckDB's
    // round keeps the sign of a negative zero; java BigDecimal drops it —
    // observed as the single divergent row in CORRECTNESS_r09).
    QueryDef("q_dsir_weights",
      (s, d) => graft.functions.Curation.dsirWeights(
        docs(s, d), isTarget = col("lang") === "en")
        .select(col("id"),
          (round(col("dsir_weight") + lit(1e-9), 4) + lit(0.0))
            .as("dsir_weight"),
          col("ntok")),
      Some("""WITH d AS (SELECT doc_id AS id, lang, text FROM documents),
             |tk AS (SELECT id, lang = 'en' AS tgt,
             |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |      w -> length(w) > 0)) AS w
             |  FROM d),
             |st AS (SELECT w, count(*) AS rc, count(*) FILTER (tgt) AS tc
             |  FROM tk GROUP BY w),
             |tot AS (SELECT CAST(sum(rc) AS DOUBLE) AS rtot,
             |    CAST(sum(tc) AS DOUBLE) AS ttot, count(*) AS vocab FROM st),
             |lw AS (SELECT w, ln((tc + 1.0) / (ttot + vocab))
             |    - ln((rc + 1.0) / (rtot + vocab)) AS lw
             |  FROM st, tot),
             |pt AS (SELECT id, w, count(*) AS cnt FROM tk GROUP BY id, w),
             |pd AS (SELECT p.id,
             |    list_sum(list(p.cnt * l.lw ORDER BY p.w)) / sum(p.cnt) AS wt,
             |    CAST(sum(p.cnt) AS BIGINT) AS ntok
             |  FROM pt p JOIN lw l USING (w) GROUP BY p.id)
             |SELECT d.id,
             |  round(coalesce(pd.wt, 0.0) + 1e-9, 4) + 0.0 AS dsir_weight,
             |  coalesce(pd.ntok, 0) AS ntok
             |FROM d LEFT JOIN pd USING (id)""".stripMargin)),

    // Corpus mixing weights: reshape the token distribution to target
    // shares (en 60%, fr 20%, residual split by actual share).
    QueryDef("q_mix_weights",
      (s, d) => graft.functions.Curation.mixWeights(
        docs(s, d).withColumn("ntok",
          TextFunctions.tokenCount(col("text")).cast("long")),
        "lang", Map("en" -> 0.6, "fr" -> 0.2), col("ntok")),
      Some("""WITH agg AS (SELECT lang, count(*) AS docs,
             |    CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
             |      w -> length(w) > 0))) AS BIGINT) AS tokens,
             |    CASE lang WHEN 'en' THEN 0.6 WHEN 'fr' THEN 0.2 END AS t
             |  FROM documents GROUP BY lang),
             |tot AS (SELECT CAST(sum(tokens) AS DOUBLE) AS total,
             |    CAST(sum(CASE WHEN t IS NULL THEN tokens ELSE 0 END) AS DOUBLE)
             |      AS unl
             |  FROM agg)
             |SELECT lang, docs, tokens, round(tokens / total, 4) AS share,
             |  round(CASE WHEN t IS NOT NULL THEN t / (tokens / total)
             |    ELSE (1.0 - 0.8) / (unl / total) END, 4) AS weight
             |FROM agg, tot""".stripMargin)),

    // Deterministic epoch shuffle + round-robin shard assignment: global
    // rank in md5('epoch0:'||id) order via the two-phase distributed
    // scan; shard = rank % 8, pos = rank / 8. The oracle's single-node
    // window rank must agree exactly with the range-partitioned form.
    QueryDef("q_shard_assign",
      (s, d) => graft.functions.Curation.shuffleShards(
        docs(s, d).select(col("id")), "id", numShards = 8, salt = "epoch0"),
      Some("""SELECT doc_id AS id, rnk % 8 AS shard, rnk // 8 AS pos
             |FROM (SELECT doc_id, CAST(row_number() OVER (
             |    ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id)
             |    AS BIGINT) - 1 AS rnk
             |  FROM documents)""".stripMargin)),

    // Temperature-scaled sampling weights (mT5/XLM-R α-sampling, α=0.5):
    // q ∝ share^α flattens the language distribution toward uniform.
    QueryDef("q_temperature_weights",
      (s, d) => graft.functions.Curation.temperatureWeights(
        docs(s, d).withColumn("ntok",
          TextFunctions.tokenCount(col("text")).cast("long")),
        "lang", col("ntok"), alpha = 0.5),
      Some("""WITH agg AS (SELECT lang,
             |    CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
             |      w -> length(w) > 0))) AS BIGINT) AS tokens
             |  FROM documents GROUP BY lang),
             |tot AS (SELECT CAST(sum(tokens) AS DOUBLE) AS total,
             |    sum(pow(tokens, 0.5)) AS zsum FROM agg)
             |SELECT lang, tokens, round(tokens / total, 4) AS share,
             |  round((pow(tokens, 0.5) / zsum) / (tokens / total), 4) AS weight
             |FROM agg, tot""".stripMargin)),

    // Global quality-quantile bucketing (curriculum tiers): rank by
    // (n_chars, id) via the two-phase distributed scan, bucket =
    // floor(rank·4 / total) — the oracle's single-node window rank must
    // agree exactly with the range-partitioned form.
    QueryDef("q_quality_buckets",
      (s, d) => graft.functions.Curation.qualityBuckets(
        t(s, d, "documents").select(col("doc_id").as("id"),
          col("n_chars").as("score")),
        "id", "score", nBuckets = 4),
      Some("""WITH ranked AS (SELECT doc_id AS id, n_chars AS score,
             |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
             |      - 1 AS rnk,
             |    count(*) OVER () AS total
             |  FROM documents)
             |SELECT id, score, CAST(rnk * 4 // total AS INT) AS bucket
             |FROM ranked""".stripMargin)),

    // Sequence packing (concat-and-chunk, 512-token packs): global token
    // offset per doc in id order via the two-phase distributed prefix sum,
    // then pack id + straddle count. The oracle's single-node window
    // cumsum must agree exactly with the range-partitioned scan.
    QueryDef("q_pack_sequences",
      (s, d) => graft.functions.Curation.assignPacks(
        docs(s, d).select(col("id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("ntok")),
        "id", "ntok", budget = 512),
      Some("""WITH toks AS (SELECT doc_id AS id,
             |    CAST(len(list_filter(string_split_regex(text, '\s+'),
             |      w -> length(w) > 0)) AS BIGINT) AS ntok
             |  FROM documents),
             |off AS (SELECT id, ntok,
             |    CAST(COALESCE(sum(ntok) OVER (ORDER BY id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |      AS "offset"
             |  FROM toks)
             |SELECT id, ntok, "offset", "offset" // 512 AS pack,
             |  CAST(CASE WHEN ntok <= 0 THEN 1
             |    ELSE ("offset" + ntok - 1) // 512 - "offset" // 512 + 1
             |    END AS INT) AS packs
             |FROM off""".stripMargin)),

    // BPE tokenizer training (Sennrich et al. 2016): first-round adjacent
    // character-pair statistics — the argmax input of merge 0 — replayed
    // exactly in SQL (char pairs weighted by word frequency, end-of-word
    // marker included, ties lexicographic).
    QueryDef("q_bpe_pairs",
      (s, d) => graft.functions.Bpe.pairStats(docs(s, d), k = 20),
      Some("""WITH wc AS (SELECT wd, CAST(count(*) AS BIGINT) AS cnt FROM (
             |    SELECT unnest(list_filter(
             |      string_split_regex(lower(text), '\s+'),
             |      x -> length(x) > 0)) AS wd FROM documents) GROUP BY wd),
             |p AS (
             |  SELECT substr(wd, i, 1) AS l, substr(wd, i + 1, 1) AS r, cnt
             |  FROM wc, LATERAL unnest(generate_series(1, length(wd) - 1)) AS t(i)
             |  WHERE length(wd) >= 2
             |  UNION ALL
             |  SELECT substr(wd, length(wd), 1), '</w>', cnt FROM wc)
             |SELECT l, r, CAST(sum(cnt) AS BIGINT) AS n
             |FROM p GROUP BY l, r
             |ORDER BY n DESC, l, r LIMIT 20""".stripMargin)),

    // The full merge loop, replayed in a RECURSIVE CTE: per round the
    // oracle recomputes the weighted pair argmax (ties lexicographic,
    // like the trainer) and applies the leftmost-non-overlapping merge
    // via run-parity windows (a match merges iff the consecutive-match
    // run before it has even length — exactly the trainer's left fold).
    // Exhaustion terminates the recursion like the trainer's empty-argmax
    // check, so the merge table replays row-for-row.
    QueryDef("q_bpe_train",
      (s, d) => graft.functions.Bpe.train(docs(s, d), merges = 1000),
      Some("""WITH RECURSIVE st AS (
             |  SELECT 0 AS it, CAST(count(*) AS BIGINT) AS cnt,
             |    list_append(list_transform(generate_series(1, length(wd)),
             |      i -> substr(wd, i, 1)), '</w>') AS syms,
             |    NULL::VARCHAR AS l, NULL::VARCHAR AS r, NULL::BIGINT AS n
             |  FROM (SELECT unnest(list_filter(
             |      string_split_regex(lower(text), '\s+'),
             |      x -> length(x) > 0)) AS wd FROM documents)
             |  GROUP BY wd
             |  UNION ALL
             |  SELECT it + 1, cnt, nw.ns, best.l, best.r, best.n
             |  FROM st,
             |    (SELECT l, r, n FROM (
             |        SELECT syms[i] AS l, syms[i+1] AS r, sum(cnt) AS n
             |        FROM st, LATERAL unnest(generate_series(1, len(syms)-1))
             |          AS g(i)
             |        GROUP BY 1, 2)
             |      ORDER BY n DESC, l, r LIMIT 1) AS best,
             |    LATERAL (
             |      SELECT flatten(list(piece ORDER BY i)) AS ns FROM (
             |        SELECT i,
             |          CASE WHEN mg THEN [best.l || best.r]
             |               WHEN lag(mg) OVER (ORDER BY i) THEN []
             |               ELSE [s] END AS piece
             |        FROM (
             |          SELECT i, s, m,
             |            m AND (i - 1 - coalesce(max(CASE WHEN NOT m THEN i END)
             |              OVER (ORDER BY i
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |              0)) % 2 = 0 AS mg
             |          FROM (
             |            SELECT i, syms[i] AS s,
             |              i < len(syms) AND syms[i] = best.l
             |                AND syms[i+1] = best.r AS m
             |            FROM unnest(generate_series(1, len(syms))) AS g(i))
             |        ))
             |    ) AS nw
             |  WHERE it < 1000
             |)
             |SELECT DISTINCT CAST(it - 1 AS INT) AS rank, l AS "left",
             |  r AS "right", l || r AS merged, n AS pairCount
             |FROM st WHERE it > 0""".stripMargin)),

    // Document chunking (fixed token windows, 8-token overlap): the
    // context-window prep stage before embedding/packing. Deterministic
    // slices, so the oracle replays every window boundary and the chunk
    // text itself.
    QueryDef("q_chunk_documents",
      (s, d) => graft.functions.Curation.chunkDocuments(
        docs(s, d), chunkSize = 64, overlap = 8),
      Some("""WITH tk AS (SELECT doc_id AS id,
             |    list_filter(string_split_regex(text, '\s+'),
             |      w -> length(w) > 0) AS t
             |  FROM documents),
             |n AS (SELECT id, t,
             |    CASE WHEN len(t) <= 64 THEN 1
             |      ELSE CAST(ceil((len(t) - 64) / 56.0) AS BIGINT) + 1 END AS nc
             |  FROM tk),
             |c AS (SELECT id, t,
             |    unnest(generate_series(0, nc - 1)) AS chunk_idx
             |  FROM n)
             |SELECT id, CAST(chunk_idx AS INT) AS chunk_idx,
             |  array_to_string(t[(chunk_idx * 56 + 1):(chunk_idx * 56 + 64)], ' ')
             |    AS chunk_text,
             |  CAST(len(t[(chunk_idx * 56 + 1):(chunk_idx * 56 + 64)]) AS INT)
             |    AS ntok
             |FROM c""".stripMargin))
  )
}
