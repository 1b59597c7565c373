package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Retrieval-fusion and corpus-scoring operators — the layer between
  * the index structures (BM25 / IVF, TextAnalysis + Similarity) and a
  * training-data curation decision: hybrid lexical+vector ranking,
  * LM-style fluency scoring, and DSIR-shaped importance weighting.
  *
  * House discipline as everywhere: exact integer arithmetic wherever a
  * ranking depends on it (micro-/ppb-units with `div`), 6-dp-rounded
  * cosine with id tiebreaks, DECIMAL(38)/HUGEINT for products that pass
  * int64 at 100 TB-scale counts.
  */
object Ranking {

  /** Cosine via the codegen'd kernel (same fold order as the oracle's
    * list_sum — see [[graft.functions.CosineSim]]). */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim(a, b)

  /** DuckDB replay of [[cosine]] for explicit operands (same sequential
    * fold; duplicated from Similarity where it is private). */
  private def cosSql(u: String, v: String): String =
    s"""list_sum(list_transform(range(1, 65),
       |  k -> CAST($u[k] AS DOUBLE) * CAST($v[k] AS DOUBLE)))
       |/ sqrt(list_sum(list_transform(range(1, 65), k -> CAST($u[k] AS DOUBLE) * CAST($u[k] AS DOUBLE))))
       |/ sqrt(list_sum(list_transform(range(1, 65), k -> CAST($v[k] AS DOUBLE) * CAST($v[k] AS DOUBLE))))"""
      .stripMargin

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.,
    * SIGIR'09): fuse a LEXICAL ranking (integer tf-idf over the BM25
    * query terms) with a VECTOR ranking (cosine vs one query embedding)
    * by RRF score Σ 1/(60+rank) — the standard production hybrid-search
    * combiner (lexical recall + semantic recall, no score calibration
    * needed because only RANKS enter the fusion).
    *
    * Exact-integer discipline: the fused score is parts-per-billion
    * `1000000000 div (60 + rank)` summed over the two arms (missing arm
    * contributes 0), so fusion order and float rounding can never
    * reorder ties — ranking is bit-identical across engines.
    *
    * Scale shape: each arm is a top-`kCand` ranked list — at corpus
    * scale the lexical arm is served by the persisted inverted index
    * (TextAnalysis.tokenIndex / BM25) and the vector arm by the IVF
    * index (Similarity.retrievalServed); fusion itself joins two k-row
    * lists, driver-free and constant-cost regardless of corpus size.
    * The rank windows run over an aggregate-bounded input (lexical: the
    * per-doc score aggregate; vector: one query's candidates), and both
    * arms carry an explicit `limit(kCand)` so the unpartitioned fusion
    * window is provably bounded (PlanRegressionSpec's window guard).
    */
  def hybridRrf(spark: SparkSession, dir: String,
                kCand: Int = 20, k: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val terms = TextAnalysis.Bm25Terms

    // Lexical arm: integer tf-idf = Σ_t tf_t · (n_docs div df_t).
    val words = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").isin(terms: _*))
    val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfw = tf.groupBy("w").agg(count(lit(1)).as("dfw"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val wLex = Window.orderBy(col("lex_score").desc, col("doc_id"))
    val lexTop = tf.join(dfw, "w").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), expr("tf * (n_docs div dfw)").as("contrib"))
      .groupBy("doc_id").agg(sum("contrib").as("lex_score"))
      .withColumn("lex_rank", row_number().over(wLex))
      .filter(col("lex_rank") <= kCand).limit(kCand)
      .select(col("doc_id"), col("lex_rank"))

    // Vector arm: cosine vs the vec_id=0 query embedding (the docstore
    // join convention vec_id = doc_id, as in Similarity.retrieval).
    val e = Tables.embeddings(spark, dir)
    val qv = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wVec = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val vecTop = qv.join(e, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qv"), col("embedding")), 6).as("cos_sim"))
      .withColumn("vec_rank", row_number().over(wVec))
      .filter(col("vec_rank") <= kCand).limit(kCand)
      .select(col("vec_id").as("doc_id"), col("vec_rank"))

    val wF = Window.orderBy(col("rrf_ppb").desc, col("doc_id"))
    lexTop.join(vecTop, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"),
        expr("coalesce(1000000000 div (60 + lex_rank), 0)" +
          " + coalesce(1000000000 div (60 + vec_rank), 0)").as("rrf_ppb"))
      .withColumn("fused_rank", row_number().over(wF))
      .filter(col("fused_rank") <= k)
  }

  /** Per-document mean inverse BIGRAM conditional probability in exact
    * micro-units — the bigram analog of [[TextAnalysis.docRarity]]'s
    * unigram score and the engine-exact stand-in for LM perplexity as a
    * FLUENCY filter: text whose word transitions are unpredictable
    * under the corpus bigram model (word-salad, mis-segmented, OCR
    * noise) scores high; fluent boilerplate scores low. Each bigram
    * occurrence xy contributes floor(10⁶·c₁(x)/c(xy)) — exactly
    * 10⁶/p̂(y|x) with c₁(x) the count of x in bigram-FIRST position, so
    * the conditional masses sum exactly to 1 per left-word.
    *
    * Scale: one shingle explode and two token-keyed joins back against
    * the build-once PERSISTED bigram/first-position count indexes
    * ([[bigramIndexPaths]]) — the docRarity shape. The counts must be
    * scans, not inline aggregates, for the Zipf-skewed join keys to be
    * AQE-skew-splittable at all (an inline count is already
    * hash-partitioned on its own join key, so OptimizeSkewedJoin never
    * sees a splittable stage — see TextAnalysis.docRarityFrom, where
    * ScaleToolsSpec pins the split on the operator's own plan).
    * Docs with <2 tokens have no bigrams and drop out (inner join), in
    * both engines.
    */
  private val bigramIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Build-once bigram count indexes for `dir`: (xy → cxy) and
    * (x → cx1, count of x in bigram-first position) as parquet — the
    * corpus LM artifact [[bigramSurprisal]] serves from. Same
    * fresh-tempdir lifecycle as TextAnalysis.vocabIndexPath. */
  private[graft] def bigramIndexPaths(
      spark: SparkSession, dir: String): (String, String) =
    bigramIndexCache.computeIfAbsent(dir, d => {
      graft.functions.ShinglesAll.register(spark)
      val bi = Tables.documents(spark, d)
        .select(explode(expr("shingles_all(text, 2)")).as("xy"))
      val bOut = java.nio.file.Files
        .createTempDirectory("graft-bigram-ix").toFile.getAbsolutePath
      bi.groupBy("xy").agg(count(lit(1)).as("cxy"))
        .write.mode("overwrite").parquet(bOut)
      val fOut = java.nio.file.Files
        .createTempDirectory("graft-bifirst-ix").toFile.getAbsolutePath
      bi.select(split(col("xy"), " ").getItem(0).as("x"))
        .groupBy("x").agg(count(lit(1)).as("cx1"))
        .write.mode("overwrite").parquet(fOut)
      (bOut, fOut)
    })

  def bigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val (bPath, fPath) = bigramIndexPaths(spark, dir)
    graft.functions.ShinglesAll.register(spark)
    val bi = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(expr("shingles_all(text, 2)")).as("xy"))
    val bcnt = spark.read.parquet(bPath)
    val fcnt = spark.read.parquet(fPath)
    bi.withColumn("x", split(col("xy"), " ").getItem(0))
      .join(bcnt, "xy").join(fcnt, "x")
      .select(col("doc_id"), col("lang"),
        expr("CAST(1000000 AS DECIMAL(38,0)) * cx1 div cxy").as("inv_p"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("inv_p").cast("decimal(38,0)")).as("s"))
      .selectExpr("doc_id", "lang", "n_bigrams",
        "s div n_bigrams AS surprisal_micro")
  }

  /** DSIR-shaped importance weights (Xie et al., NeurIPS'23 "Data
    * Selection for Language Models via Importance Resampling"), log-free
    * engine-exact form: score each document by how target-like its
    * unigram profile is, weight r(w) = 10⁶·p̂_target(w)/p̂_raw(w)
    * computed as ONE integer floor-div per vocab word
    * `(10⁶·ct·Nr) div (cr·Nt)` (target = the lang='en' slice standing
    * in for a curated target corpus; raw = the whole corpus), per-doc
    * score = mean ratio over its token occurrences. Monotone in the
    * true likelihood ratio for docs of equal length, so top-p selection
    * by this score IS importance-ranked selection — with every rank
    * reproducible bit-for-bit, unlike the float log-ratio original.
    *
    * Products run in DECIMAL(38,0)/HUGEINT: ct·Nr ≈ 10²⁴ at 100 TB
    * corpus counts, far past int64. Shape: a build-once PERSISTED
    * ratio table ([[dsirRatioPath]] — exactly what the paper
    * precomputes and reuses across selection runs) + one token-keyed
    * join back against the scan — the docRarity scale pattern, with
    * the same reason the counts must be a scan and not an inline
    * aggregate (AQE skew-splittability; see TextAnalysis.docRarityFrom).
    */
  private val dsirRatioCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def dsirRatioPath(spark: SparkSession, dir: String): String =
    dsirRatioCache.computeIfAbsent(dir, d => {
      val words = Tables.documents(spark, d)
        .select(col("lang"),
          explode(split(lower(col("text")), "\\s+")).as("w"))
      val raw = words.groupBy("w").agg(count(lit(1)).as("cr"))
      val tgt = words.filter(col("lang") === "en")
        .groupBy("w").agg(count(lit(1)).as("ct"))
      val nr = raw.agg(sum("cr").as("nr"))
      val nt = tgt.agg(sum("ct").as("nt"))
      val out = java.nio.file.Files
        .createTempDirectory("graft-dsir-ratio").toFile.getAbsolutePath
      raw.join(tgt, Seq("w"), "left_outer")
        .na.fill(0L, Seq("ct"))
        .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
        .select(col("w"),
          expr("CAST(1000000 AS DECIMAL(38,0)) * ct * nr" +
            " div (CAST(cr AS DECIMAL(38,0)) * nt)").as("rw"))
        .write.mode("overwrite").parquet(out)
      out
    })

  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val ratio = spark.read.parquet(dsirRatioPath(spark, dir))
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(lower(col("text")), "\\s+")).as("w"))
    words.join(ratio, "w")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("rw").cast("decimal(38,0)")).as("s"))
      .selectExpr("doc_id", "lang", "n_tokens",
        "s div n_tokens AS dsir_micro")
  }

  /** INTERPOLATED KNESER-NEY bigram probabilities (Kneser & Ney,
    * ICASSP'95; Chen & Goodman'98 formulation) for the top-k most
    * frequent bigrams — the smoothing every count-based n-gram LM
    * ships with, and the third member of the discounting family next
    * to [[bigramSurprisal]] (raw MLE) and the Good-Turing table
    * (q_freq_of_freqs): absolute-discount the bigram count by D and
    * back off to the CONTINUATION unigram (how many distinct left
    * contexts a word follows — "Francisco" is frequent but only ever
    * follows "San", so its continuation mass is tiny).
    *
    * Engine-exact form: with D = 3/4,
    *   p_KN(y|x) = max(c(xy)−D, 0)/c₁(x)
    *             + D·N1+(x·)/c₁(x) · N1+(·y)/N1+(··)
    * cleared to ONE rational (multiply through by 4·c₁(x)·N1+(··)):
    *   p_micro = ((4·c(xy)−3)·N1+(··) + 3·N1+(x·)·N1+(·y)) · 10⁶
    *             div (4·c₁(x)·N1+(··))
    * — a single integer floor-div, so both engines replay it
    * digit-for-digit (c(xy) ≥ 1 in the table, so the max() never
    * binds). Products run in DECIMAL(38)/HUGEINT: c(xy)·N1+(··) is
    * ~10²⁴ at 100 TB corpus counts.
    *
    * Plan/scale shape: everything derives from the build-once PERSISTED
    * bigram index ([[bigramIndexPaths]] — the same artifact
    * bigramSurprisal serves from, built at most once per JVM): the
    * left-context totals c₁(x)/N1+(x·) and continuation counts N1+(·y)
    * are each ONE map-side-combined aggregate over the post-aggregate
    * bigram-type table (vocab-sized, never the token stream), the
    * denominator N1+(··) a broadcast 1-row count. The report is the
    * top-k bigrams (TakeOrderedAndProject on the index), so the three
    * join-backs run with a k-row side — AQE broadcasts it — and the
    * output is k rows at any SF.
    */
  def kneserNey(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val (bPath, _) = bigramIndexPaths(spark, dir)
    val bcnt = spark.read.parquet(bPath)
      .withColumn("x", split(col("xy"), " ").getItem(0))
      .withColumn("y", split(col("xy"), " ").getItem(1))
    val left = bcnt.groupBy("x")
      .agg(sum("cxy").as("c1x"), count(lit(1)).as("n1p_x"))
    val cont = bcnt.groupBy("y").agg(count(lit(1)).as("cont_y"))
    val nTypes = bcnt.agg(count(lit(1)).as("n_types"))
    bcnt.orderBy(col("cxy").desc, col("xy")).limit(k)
      .join(left, "x").join(cont, "y")
      .crossJoin(broadcast(nTypes))
      .select(col("xy"), col("cxy"), col("c1x"), col("n1p_x"),
        col("cont_y"), col("n_types"),
        expr("CAST(((4 * CAST(cxy AS DECIMAL(38,0)) - 3) * n_types" +
          " + 3 * CAST(n1p_x AS DECIMAL(38,0)) * cont_y) * 1000000" +
          " div (4 * CAST(c1x AS DECIMAL(38,0)) * n_types) AS BIGINT)")
          .as("pkn_micro"))
      .orderBy(col("cxy").desc, col("xy"))
  }

  /** LAST-TOUCH attribution: for every purchase, the most recent
    * strictly-earlier non-purchase event by the same user (the
    * marketing-attribution primitive; also the "what did the user see
    * before converting" feature join of a recommender log). One
    * user-partitioned window with a ROWS UNBOUNDED PRECEDING..1
    * PRECEDING frame and an ignore-nulls conditional `last` — never a
    * self-join, so cost is one shuffle by user regardless of history
    * length. First-session purchases with no prior event keep NULL
    * attribution (a real funnel signal, not an error).
    *
    * Determinism: event order is (ts, event_id) — unique — and `ts` is
    * already epoch-nanos (Tables.normalizeTs), so `gap_ns` is exact
    * integer event-time arithmetic in both engines.
    */
  def lastTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("src",
        last(when(col("event_type") =!= "purchase",
          struct(col("event_id"), col("event_type"), col("ts"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts_ns"),
        col("src.event_id").as("src_event_id"),
        col("src.event_type").as("src_event_type"),
        (col("ts") - col("src.ts")).as("gap_ns"))
  }

  /** SHAPLEY-VALUE CHANNEL ATTRIBUTION — the game-theoretic split of
    * conversion credit across the three marketing touchpoints (view /
    * click / signup), the principled answer where [[lastTouchAttribution]]
    * is the heuristic one: each channel gets its average marginal
    * contribution over all 2³ coalitions. The value function is
    * v(S) = (conversions among users whose ENTIRE touch set ⊆ S) / N —
    * monotone, and with the constant denominator N every Shapley value
    * is one exact rational with denominator 6N (3! = 6 carries the
    * coalition weights 2/1/2 as INTEGER w6), so the attribution
    * hash-checks and Σ shapley ≡ v(all) − v(none) by construction.
    *
    * Plan/scale shape: one events scan → per-user conditional
    * aggregate (touch bitmask + converted) → 8-row exact-touchset
    * cell table — EVERYTHING after is algebra on ≤ 8×8 bounded rows
    * (subset sums via a bitmask join, marginals via a coalition
    * join), independent of corpus size; 3 rows out. */
  def shapleyAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg((max(when(col("event_type") === "view", 1).otherwise(0)) +
        max(when(col("event_type") === "click", 1).otherwise(0)) * 2 +
        max(when(col("event_type") === "signup", 1).otherwise(0)) * 4)
        .as("t"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      .groupBy("t")
      .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
      .localCheckpoint() // 8 rows; feeds vsum and the total
    val subsets = (0 until 8).toDF("s")
    val vsum = subsets.crossJoin(cells)
      .filter(expr("(t & s) = t"))
      .groupBy("s").agg(sum("n_conv").as("v"))
      // subsets with no qualifying touchset (possible at tiny SF)
      .unionByName(subsets.select(col("s"), lit(0L).as("v")))
      .groupBy("s").agg(max("v").as("v"))
    val tot = cells.agg(sum("n_users").as("n_total"))
    val channels = Seq((1, "view"), (2, "click"), (4, "signup"))
      .toDF("c", "channel")
    channels.crossJoin(vsum.select(col("s"), col("v")))
      .filter(expr("(s & c) = 0"))
      .join(vsum.select(col("s").as("s1"), col("v").as("v1")),
        expr("s1 = (s | c)"))
      .select(col("channel"),
        expr("CASE bit_count(s) WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END")
          .as("w6"),
        (col("v1") - col("v")).as("dv"))
      .groupBy("channel").agg(sum(expr("w6 * dv")).as("num6"))
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(
        vsum.filter(col("s") === 7).select(col("v").as("v_all"))))
      .crossJoin(broadcast(
        vsum.filter(col("s") === 0).select(col("v").as("v_none"))))
      .select(col("channel"),
        expr("CAST(CAST(num6 AS DECIMAL(38,0)) * 1000000" +
          " div (6 * CAST(n_total AS DECIMAL(38,0))) AS BIGINT)")
          .as("shapley_ppm"),
        expr("CAST(CAST(v_all AS DECIMAL(38,0)) * 1000000 div n_total" +
          " AS BIGINT)").as("v_all_ppm"),
        expr("CAST(CAST(v_none AS DECIMAL(38,0)) * 1000000 div n_total" +
          " AS BIGINT)").as("v_none_ppm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shapley_attribution" -> shapleyAttribution,
    "q_hybrid_rrf" -> ((s, d) => hybridRrf(s, d)),
    "q_bigram_surprisal" -> bigramSurprisal,
    "q_dsir_weights" -> dsirWeights,
    "q_kneser_ney" -> ((s, d) => kneserNey(s, d)),
    "q_attribution" -> lastTouchAttribution)

  /** RRF oracle generated from the SAME term list as the operator. */
  private lazy val hybridRrfSql: String = {
    val termList = TextAnalysis.Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |  FROM documents),
       |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
       |       FROM words WHERE w IN ($termList) GROUP BY 1, 2),
       |dfw AS (SELECT w, CAST(count(*) AS BIGINT) AS dfw FROM tf GROUP BY 1),
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |lex AS (
       |  SELECT doc_id, sum(tf * (n_docs // dfw)) AS lex_score
       |  FROM tf JOIN dfw USING (w) CROSS JOIN nd GROUP BY 1),
       |lextop AS (
       |  SELECT doc_id, lex_rank FROM (
       |    SELECT doc_id, CAST(row_number() OVER (
       |      ORDER BY lex_score DESC, doc_id) AS INT) AS lex_rank FROM lex)
       |  WHERE lex_rank <= 20),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |vec AS (
       |  SELECT e.vec_id AS doc_id,
       |         round(${cosSql("q.qv", "e.embedding")}, 6) AS cos_sim
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
       |vectop AS (
       |  SELECT doc_id, vec_rank FROM (
       |    SELECT doc_id, CAST(row_number() OVER (
       |      ORDER BY cos_sim DESC, doc_id) AS INT) AS vec_rank FROM vec)
       |  WHERE vec_rank <= 20),
       |f AS (
       |  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
       |         l.lex_rank, v.vec_rank,
       |         CAST(coalesce(1000000000 // (60 + l.lex_rank), 0)
       |       + coalesce(1000000000 // (60 + v.vec_rank), 0) AS BIGINT)
       |           AS rrf_ppb
       |  FROM lextop l FULL JOIN vectop v ON l.doc_id = v.doc_id)
       |SELECT doc_id, lex_rank, vec_rank, rrf_ppb, fused_rank FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    ORDER BY rrf_ppb DESC, doc_id) AS INT) AS fused_rank FROM f)
       |WHERE fused_rank <= 10""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_hybrid_rrf" -> hybridRrfSql,
    "q_kneser_ney" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws
        |  FROM documents),
        |big AS (
        |  SELECT unnest(list_transform(range(2, len(ws) + 1),
        |         i -> ws[i-1] || ' ' || ws[i])) AS xy
        |  FROM toks),
        |b2 AS (
        |  SELECT xy, CAST(count(*) AS BIGINT) AS cxy,
        |         str_split(xy, ' ')[1] AS x, str_split(xy, ' ')[2] AS y
        |  FROM big GROUP BY 1),
        |lft AS (SELECT x, CAST(sum(cxy) AS BIGINT) AS c1x,
        |               CAST(count(*) AS BIGINT) AS n1p_x
        |        FROM b2 GROUP BY 1),
        |cont AS (SELECT y, CAST(count(*) AS BIGINT) AS cont_y
        |         FROM b2 GROUP BY 1),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM b2),
        |top AS (SELECT * FROM b2 ORDER BY cxy DESC, xy LIMIT 20)
        |SELECT t.xy, t.cxy, l.c1x, l.n1p_x, c.cont_y, n.n_types,
        |       CAST(((4 * CAST(t.cxy AS HUGEINT) - 3) * n.n_types
        |             + 3 * CAST(l.n1p_x AS HUGEINT) * c.cont_y) * 1000000
        |            // (4 * CAST(l.c1x AS HUGEINT) * n.n_types)
        |         AS BIGINT) AS pkn_micro
        |FROM top t JOIN lft l USING (x) JOIN cont c USING (y)
        |CROSS JOIN nt n""".stripMargin,
    "q_bigram_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |         regexp_split_to_array(lower(text), '\s+') AS ws
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, lang, unnest(list_transform(range(2, len(ws) + 1),
        |         i -> ws[i-1] || ' ' || ws[i])) AS xy
        |  FROM toks),
        |bcnt AS (SELECT xy, CAST(count(*) AS BIGINT) AS cxy
        |         FROM big GROUP BY 1),
        |fcnt AS (SELECT str_split(xy, ' ')[1] AS x,
        |                CAST(count(*) AS BIGINT) AS cx1
        |         FROM big GROUP BY 1),
        |perdoc AS (
        |  SELECT b.doc_id, b.lang, count(*) AS n_bigrams,
        |         sum(1000000 * f.cx1 // c.cxy) AS s
        |  FROM big b JOIN bcnt c USING (xy)
        |  JOIN fcnt f ON f.x = str_split(b.xy, ' ')[1]
        |  GROUP BY 1, 2)
        |SELECT doc_id, lang, CAST(n_bigrams AS BIGINT) AS n_bigrams,
        |       CAST(s // n_bigrams AS BIGINT) AS surprisal_micro
        |FROM perdoc""".stripMargin,
    "q_dsir_weights" ->
      """WITH words AS (
        |  SELECT doc_id, lang,
        |         unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |  FROM documents),
        |raw AS (SELECT w, CAST(count(*) AS BIGINT) AS cr
        |        FROM words GROUP BY 1),
        |tgt AS (SELECT w, CAST(count(*) AS BIGINT) AS ct
        |        FROM words WHERE lang = 'en' GROUP BY 1),
        |tots AS (SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS nr,
        |                (SELECT CAST(sum(ct) AS BIGINT) FROM tgt) AS nt),
        |ratio AS (
        |  SELECT r.w,
        |         CAST(CAST(1000000 AS HUGEINT) * coalesce(t.ct, 0) * x.nr
        |              // (CAST(r.cr AS HUGEINT) * x.nt) AS BIGINT) AS rw
        |  FROM raw r LEFT JOIN tgt t USING (w) CROSS JOIN tots x),
        |perdoc AS (
        |  SELECT doc_id, lang, count(*) AS n_tokens, sum(rw) AS s
        |  FROM words JOIN ratio USING (w) GROUP BY 1, 2)
        |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(s // n_tokens AS BIGINT) AS dsir_micro
        |FROM perdoc""".stripMargin,
    "q_shapley_attribution" ->
      """WITH per AS (
        |  SELECT user_id,
        |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |       + 2 * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |       + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |           AS t,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS conv
        |  FROM events GROUP BY 1),
        |cells AS (SELECT t, CAST(count(*) AS BIGINT) AS n_users,
        |                 CAST(sum(conv) AS BIGINT) AS n_conv
        |          FROM per GROUP BY 1),
        |subsets AS (SELECT CAST(range AS INT) AS s FROM range(0, 8)),
        |vsum AS (
        |  SELECT s, CAST(coalesce(sum(CASE WHEN (t & s) = t
        |    THEN n_conv END), 0) AS BIGINT) AS v
        |  FROM subsets LEFT JOIN cells ON (t & s) = t GROUP BY s),
        |tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS n_total FROM cells),
        |ch(c, channel) AS (VALUES (1, 'view'), (2, 'click'), (4, 'signup')),
        |marg AS (
        |  SELECT ch.channel,
        |         CASE bit_count(a.s) WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END
        |           AS w6,
        |         b.v - a.v AS dv
        |  FROM ch JOIN vsum a ON (a.s & ch.c) = 0
        |  JOIN vsum b ON b.s = (a.s | ch.c)),
        |shap AS (SELECT channel, CAST(sum(w6 * dv) AS BIGINT) AS num6
        |         FROM marg GROUP BY 1)
        |SELECT sh.channel,
        |       CAST(CAST(num6 AS HUGEINT) * 1000000
        |         // (6 * CAST(t.n_total AS HUGEINT)) AS BIGINT)
        |         AS shapley_ppm,
        |       CAST(CAST(v7.v AS HUGEINT) * 1000000 // t.n_total AS BIGINT)
        |         AS v_all_ppm,
        |       CAST(CAST(v0.v AS HUGEINT) * 1000000 // t.n_total AS BIGINT)
        |         AS v_none_ppm
        |FROM shap sh CROSS JOIN tot t
        |CROSS JOIN (SELECT v FROM vsum WHERE s = 7) v7
        |CROSS JOIN (SELECT v FROM vsum WHERE s = 0) v0""".stripMargin,
    "q_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ns(ts) AS tsn
        |  FROM events),
        |a AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_id END
        |      IGNORE NULLS) OVER w AS src_event_id,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |      IGNORE NULLS) OVER w AS src_event_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN tsn END
        |      IGNORE NULLS) OVER w AS src_tsn
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id AS purchase_id, user_id, tsn AS purchase_ts_ns,
        |       src_event_id, src_event_type, tsn - src_tsn AS gap_ns
        |FROM a WHERE event_type = 'purchase'""".stripMargin)
}
