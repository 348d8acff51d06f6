package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** [EXT] Text analysis over `documents` (SURVEY.md §2.7 X4): statistics,
  * token counting (whitespace + regex), a marker-token language-ID
  * heuristic, a composite quality score, and a rolling-hash fingerprint.
  * All pure Column expressions — narrow maps, codegen'd, shuffle-free
  * except the final presentation sort.
  */
object TextAnalysis {

  /** X4a — per-document statistics: token counts, distinct tokens,
    * type-token ratio, average token length.
    */
  def x4Stats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"), col("lang"),
        length(col("text")).as("n_chars_m"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        round(size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 6).as("ttr"),
        round((length(col("text")) - size(col("toks")) + 1).cast("double") / size(col("toks")), 6).as("avg_tok_len"))
      .orderBy("doc_id")

  val x4StatsSql: String =
    """SELECT doc_id, lang,
      |  CAST(length(text) AS INTEGER) AS n_chars_m,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
      |  round(len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' ')), 6) AS ttr,
      |  round((length(text) - len(string_split(text, ' ')) + 1) * 1.0 / len(string_split(text, ' ')), 6) AS avg_tok_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** X4b — token counting two ways: whitespace tokens and a BPE-ish
    * regex lexer ([a-z]+ words, digit runs, single non-space symbols).
    */
  def x4TokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).as("regex_tokens"))
      .orderBy("doc_id")

  val x4TokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS regex_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // Marker tokens per language — the stopword-list LID heuristic. On the
  // synthetic token-soup corpus these are the most lang-skewed tokens;
  // the *operator semantics* (argmax of marker counts with deterministic
  // tie-break) is what the oracle pins, not linguistic accuracy.
  private val markers = Seq(
    "en" -> Seq("hash", "order", "table"),
    "de" -> Seq("customer", "join", "row"),
    "fr" -> Seq("scan", "data", "batch"),
    "es" -> Seq("slow", "agg", "merge"),
    "zh" -> Seq("small", "column", "line"))

  private def markerCount(lang: String): org.apache.spark.sql.Column = {
    val lst = markers.toMap.apply(lang).map(m => s"'$m'").mkString(", ")
    expr(s"size(filter(split(text, ' '), t -> t IN ($lst)))")
  }

  /** X4c — language-ID heuristic: argmax of per-language marker-token
    * counts, ties broken by the fixed language order en>de>fr>es>zh.
    */
  def x4LangId(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .withColumn("c_en", markerCount("en"))
      .withColumn("c_de", markerCount("de"))
      .withColumn("c_fr", markerCount("fr"))
      .withColumn("c_es", markerCount("es"))
      .withColumn("c_zh", markerCount("zh"))
    val mx = greatest(col("c_en"), col("c_de"), col("c_fr"), col("c_es"), col("c_zh"))
    d.select(col("doc_id"), col("lang").as("true_lang"),
        when(col("c_en") === mx, "en").when(col("c_de") === mx, "de")
          .when(col("c_fr") === mx, "fr").when(col("c_es") === mx, "es")
          .otherwise("zh").as("pred_lang"))
      .orderBy("doc_id")
  }

  val x4LangIdSql: String = {
    def c(l: String) =
      s"len(list_filter(string_split(text, ' '), t -> list_contains([${markers.toMap.apply(l).map(m => s"'$m'").mkString(", ")}], t)))"
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |    ${c("en")} AS c_en, ${c("de")} AS c_de, ${c("fr")} AS c_fr,
       |    ${c("es")} AS c_es, ${c("zh")} AS c_zh
       |  FROM documents)
       |SELECT doc_id, lang AS true_lang,
       |  CASE WHEN c_en = greatest(c_en, c_de, c_fr, c_es, c_zh) THEN 'en'
       |       WHEN c_de = greatest(c_en, c_de, c_fr, c_es, c_zh) THEN 'de'
       |       WHEN c_fr = greatest(c_en, c_de, c_fr, c_es, c_zh) THEN 'fr'
       |       WHEN c_es = greatest(c_en, c_de, c_fr, c_es, c_zh) THEN 'es'
       |       ELSE 'zh' END AS pred_lang
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** Composite quality score over a token-array column: length
    * saturation, lexical diversity, and filler-token penalty — shared by
    * [[x4Quality]] and the [[x4PrepFunnel]] quality gate.
    */
  private def qualityCol(tk: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n = size(tk).cast("double")
    round(
      least(n / 100.0, lit(1.0)) * 0.3
        + size(array_distinct(tk)).cast("double") / n * 0.3
        + (lit(1.0) - size(filter(tk, t => t === "a" || t === "the")).cast("double") / n) * 0.4,
      6)
  }

  /** X4d — composite quality score: length saturation, lexical diversity,
    * and filler-token penalty, each a deterministic double expression.
    */
  def x4Quality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), qualityCol(split(col("text"), " ")).as("quality"))
      .orderBy("doc_id")

  val x4QualitySql: String =
    """SELECT doc_id,
      |  round(least(len(toks) / 100.0, 1.0) * 0.3
      |      + (len(list_distinct(toks)) * 1.0 / len(toks)) * 0.3
      |      + (1.0 - len(list_filter(toks, t -> t IN ('a', 'the'))) * 1.0 / len(toks)) * 0.4,
      |    6) AS quality
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** X4e — document fingerprint: 31-polynomial rolling hash of the full
    * text mod 1e9+7 (each step pmod-bounded — ANSI-safe, and the same
    * fold is expressible in the oracle dialect).
    */
  def x4Fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        expr("""aggregate(
                |  transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1))),
                |  0L, (acc, c) -> pmod(acc * 31 + c, 1000000007))""".stripMargin).as("fingerprint"))
      .orderBy("doc_id")

  val x4FingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(0::BIGINT, [ascii(text[i]) for i in range(1, length(text) + 1)]),
      |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** X4g — PII redaction: email and phone patterns replaced with typed
    * placeholder tags, with per-doc match counts. The fixture text is
    * synthetic tokens, so the query plants deterministic PII (an email
    * and a phone derived from doc_id) before scrubbing — both engines
    * construct and redact identically, putting the regex semantics (not
    * just the no-op path) under the oracle gate. Pure narrow map.
    */
  def x4Redact(s: SparkSession, dir: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b\\d{3}-\\d{4}\\b"
    Tables.documents(s, dir)
      .withColumn("dirty", concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com or 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .select(
        col("doc_id"),
        regexp_count(col("dirty"), lit(email)).as("n_emails"),
        regexp_count(col("dirty"), lit(phone)).as("n_phones"),
        regexp_replace(regexp_replace(col("dirty"), email, "<EMAIL>"),
          phone, "<PHONE>").as("clean"))
      .orderBy("doc_id")
  }

  val x4RedactSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
      |  CAST(len(regexp_extract_all(dirty, '\b\d{3}-\d{4}\b')) AS INTEGER) AS n_phones,
      |  regexp_replace(
      |    regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS clean
      |FROM (
      |  SELECT doc_id,
      |    text || ' contact user' || doc_id || '@example.com or 555-' ||
      |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS dirty
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** X4h — overlapping-window chunking (training-context assembly):
    * 32-token chunks on a 24-token stride, 1-based chunk numbers, token
    * counts per chunk. One narrow generate per doc — no shuffle except
    * the presentation sort; at 100 TB this is the map stage in front of
    * tokenization.
    */
  /** THE chunking expression (32-token windows at stride 24 over `toks`/
    * `n`) — shared with [[graft.operators.Dags.dagTrainingPrep]] so the
    * composite can never drift from the oracle-checked operator it
    * claims to reuse.
    */
  private[graft] val chunkTransformSql: String =
    "transform(sequence(1, n, 24), i -> struct(size(slice(toks, i, 32)) AS nt, array_join(slice(toks, i, 32), ' ') AS ch))"
  def x4Chunk(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"), col("n"),
        posexplode(expr(chunkTransformSql)).as(Seq("pos", "c")))
      .select(col("doc_id"), col("n").as("n_tokens"),
        (col("pos") + 1).cast("int").as("chunk_no"),
        col("c.nt").as("n_chunk_tokens"), col("c.ch").as("chunk"))
      .orderBy("doc_id", "chunk_no")

  val x4ChunkSql: String =
    """SELECT doc_id, n AS n_tokens,
      |  CAST((start - 1) // 24 + 1 AS INTEGER) AS chunk_no,
      |  CAST(least(start + 31, n) - start + 1 AS INTEGER) AS n_chunk_tokens,
      |  array_to_string(toks[start:least(start + 31, n)], ' ') AS chunk
      |FROM (
      |  SELECT doc_id, toks, n, unnest(range(1, n + 1, 24)) AS start
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
      |          CAST(len(string_split(text, ' ')) AS INTEGER) AS n
      |        FROM documents))
      |ORDER BY doc_id, chunk_no""".stripMargin

  /** X4f — TF-IDF top-3 terms per document: term frequency per (doc,
    * term), document frequency per term, idf = ln((N+1)/(df+1)), ranked
    * per doc by (tfidf desc, term asc).
    *
    * Scale shape: tf and df are two-phase hash aggregates over the
    * exploded terms; the document count is a 1-row broadcast; the
    * df-side join shuffles on `term` (vocabulary-sized — at 100 TB the
    * vocab side is still orders of magnitude smaller than the corpus and
    * the tf side arrives already partitioned by term from its aggregate).
    * The final per-doc top-3 is a window over the doc's own terms.
    */
  def x4TfIdf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    // spread before the term explode (guide §2.5: one-task fixture scan
    // serializes the tokenize+explode map; no-op at production scale)
    val terms = graft.engine.Spread.byKey(docs, "doc_id")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    // tf holds one row per distinct (doc, term), so df derives from it
    // directly — no second explode/distinct/shuffle chain over the corpus.
    // No paired unpersist (the result is lazy): session cache growth is
    // bounded by the CacheManager's logical-plan dedup — repeated calls
    // re-reference ONE entry (the Similarity.bandedCorpus note).
    val tf = Caches.scoped(
      terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("tfidf"))
      .orderBy("doc_id", "rk")
  }

  val x4TfIdfSql: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, rk, term, tfidf FROM (
      |  SELECT doc_id, term, tfidf,
      |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS rk
      |  FROM scored) WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** X4i — corpus bigram language-model scoring: per-document mean
    * log-likelihood under the corpus's own bigram MLE,
    * lp(w1 w2) = ln(c(w1 w2) / c(w1·)), where c(w1·) counts w1 as a
    * bigram prefix. This is the KenLM-style perplexity quality filter of
    * production training-data pipelines (docs whose bigrams are corpus-
    * atypical score low), expressed with the corpus itself as the LM.
    *
    * Scale shape: one explode to bigram rows, two two-phase hash
    * aggregates for the bigram/prefix counts (vocabulary-sized outputs —
    * tiny next to the corpus), joins back on the bigram/prefix keys (AQE
    * broadcasts them when they fit), then a per-doc aggregate. Per-bigram
    * log-probs are rounded and decimal-summed (Exact) so the mean is
    * partition-order-independent.
    */
  def x4NgramLm(s: SparkSession, dir: String): DataFrame = {
    // spread before the bigram explode (guide §2.5, the x4TfIdf note)
    val docs = graft.engine.Spread.byKey(
      Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2),
      "doc_id")
    val bigrams = docs.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1), i =>
          struct(element_at(col("toks"), i).as("w1"),
            concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1)).as("bg")))).as("e"))
      .select(col("doc_id"), col("e.w1").as("w1"), col("e.bg").as("bg"))
      // feeds both count aggregates and the scoring join; released at
      // the harness's query boundary (Caches.releaseScoped)
      .transform(graft.operators.Caches.scoped)
    val cb = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val cp = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("cp"))
    bigrams.join(cb, Seq("bg")).join(cp, Seq("w1"))
      .withColumn("lp", round(log(col("cb").cast("double") / col("cp")), 6))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        graft.engine.Exact.davg(col("lp")).as("avg_logp"))
      .orderBy("doc_id")
  }

  val x4NgramLmSql: String =
    """WITH tk AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |b AS (
      |  SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i + 1] AS bg
      |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM tk)),
      |cb AS (SELECT bg, count(*) AS cb FROM b GROUP BY bg),
      |cp AS (SELECT w1, count(*) AS cp FROM b GROUP BY w1)
      |SELECT b.doc_id, count(*) AS n_bigrams,
      |  CAST(SUM(CAST(round(ln(cb.cb * 1.0 / cp.cp), 6) AS DECIMAL(28,6))) AS DOUBLE)
      |    / count(*) AS avg_logp
      |FROM b JOIN cb ON b.bg = cb.bg JOIN cp ON b.w1 = cp.w1
      |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin

  /** X4j — intra-document repetition signals, token-level (the Gopher/
    * MassiveText repetition filters): `top_bigram_frac` = share of the
    * document's bigram mass held by its single most frequent bigram;
    * `dup_trigram_frac` = share of trigram mass in trigrams occurring
    * more than once; `keep` gates both at 0.05. This targets the doc
    * shape near-dedup can NEVER catch — repetition INSIDE one document
    * (nav boilerplate, lyrics loops, degenerate generation) — which is
    * why production pipelines run it alongside, not instead of, X2.
    *
    * Scale shape: one explode to tagged (doc_id, n, gram) rows, one
    * two-phase hash aggregate keyed (doc_id, n, gram), then two per-doc
    * reductions — the x4TfIdf discipline: no window, no join, no
    * self-join. The shuffle key contains doc_id, and a pathologically
    * repetitive doc compresses BEST map-side (its gram rows collapse to
    * few distinct keys in the partial aggregate), so the adversarial
    * input is the cheap one. Docs under 3 tokens carry no trigram and
    * are excluded (same floor as the dedup family).
    */
  def x4Repetition(s: SparkSession, dir: String): DataFrame =
    repetitionFractions(Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 3))
      .withColumn("keep",
        col("top_bigram_frac") <= 0.05 && col("dup_trigram_frac") <= 0.05)
      .orderBy("doc_id")

  /** Per-doc repetition fractions over a (doc_id, tk) frame of ≥3-token
    * docs — the [[x4Repetition]] gram pipeline, shared with
    * [[x4PrepFunnel]]'s repetition gate: one explode to tagged
    * (doc_id, gn, gram) rows, one two-phase hash aggregate, two per-doc
    * reductions.
    */
  private def repetitionFractions(t: DataFrame): DataFrame = {
    // spread before the bigram+trigram explode (guide §2.5: the frames
    // passed here root at one-task fixture scans; no-op once parallel)
    val grams = graft.engine.Spread.byKey(t, "doc_id")
      .select(col("doc_id"), explode(concat(
        transform(sequence(lit(1), size(col("tk")) - 1), i =>
          struct(lit(2).as("n"), concat_ws(" ", element_at(col("tk"), i),
            element_at(col("tk"), i + 1)).as("g"))),
        transform(sequence(lit(1), size(col("tk")) - 2), i =>
          struct(lit(3).as("n"), concat_ws(" ", element_at(col("tk"), i),
            element_at(col("tk"), i + 1),
            element_at(col("tk"), i + 2)).as("g"))))).as("e"))
      .select(col("doc_id"), col("e.n").as("gn"), col("e.g").as("g"))
    grams.groupBy(col("doc_id"), col("gn"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("gn"))
      .agg(max(col("c")).as("maxc"), sum(col("c")).as("tot"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dupmass"))
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("gn") === 2,
          round(col("maxc") / col("tot"), 6))).as("top_bigram_frac"),
        max(when(col("gn") === 3,
          round(col("dupmass") / col("tot"), 6))).as("dup_trigram_frac"))
  }

  /** X4k — the composed prep-filter funnel with per-stage DROP
    * ATTRIBUTION: every document is labeled with the FIRST gate it
    * fails — `short` (< 3 tokens) → `quality` (composite score,
    * [[x4Quality]]'s formula, < 0.65) → `repetition` (either
    * [[x4Repetition]] signal > 0.05) → `exact_dup` (not the min-doc_id
    * of its identical-text group) → `keep`. This is the data-accounting
    * view a production training-data pipeline publishes next to the
    * corpus itself (how much was dropped, and WHY, per stage) — the
    * audit that `dag_training_prep`'s silent filters don't expose.
    *
    * Stage order is the production cheap-gates-first order (narrow maps
    * before any wide stage), and it commutes with the dedup stage:
    * identical texts score identically on every per-doc gate, so a
    * group fails or survives the gates as a unit and the min-id
    * representative is the same whether dedup runs first or last.
    *
    * Scale shape: quality is a pure narrow map; repetition is the
    * [[x4Repetition]] explode + doc_id-keyed two-phase aggregate (the
    * adversarial, repetitive doc compresses best map-side); the dedup
    * stage shuffles a 128-bit text digest (md5 — portable to the
    * oracle dialect), never the text itself. No self-joins, no windows
    * over the corpus-wide key space — the widest shuffle key is
    * (digest) with group size = duplicate multiplicity.
    */
  def x4PrepFunnel(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("tk", split(col("text"), " "))
      .withColumn("n", size(col("tk")).cast("double"))
      .withColumn("quality", qualityCol(col("tk")))
    val rep = repetitionFractions(d.filter(size(col("tk")) >= 3)
      .select(col("doc_id"), col("tk")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
    d.join(rep, Seq("doc_id"), "left")
      .withColumn("min_id", min(col("doc_id")).over(w))
      .withColumn("stage",
        when(col("n") < 3, "short")
          .when(col("quality") < 0.65, "quality")
          .when(col("top_bigram_frac") > 0.05 || col("dup_trigram_frac") > 0.05, "repetition")
          .when(col("doc_id") =!= col("min_id"), "exact_dup")
          .otherwise("keep"))
      .select(col("doc_id"), col("quality"),
        col("top_bigram_frac"), col("dup_trigram_frac"),
        col("stage"), (col("stage") === "keep").as("keep"))
      .orderBy("doc_id")
  }

  val x4PrepFunnelSql: String =
    """WITH d AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
      |q AS (
      |  SELECT doc_id, text, len(tk) AS n,
      |    round(least(len(tk) / 100.0, 1.0) * 0.3
      |        + (len(list_distinct(tk)) * 1.0 / len(tk)) * 0.3
      |        + (1.0 - len(list_filter(tk, t -> t IN ('a', 'the'))) * 1.0 / len(tk)) * 0.4,
      |      6) AS quality
      |  FROM d),
      |g AS (
      |  SELECT doc_id, 2 AS gn, tk[i] || ' ' || tk[i + 1] AS g
      |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM d
      |        WHERE len(tk) >= 3)
      |  UNION ALL
      |  SELECT doc_id, 3 AS gn, tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS g
      |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i FROM d
      |        WHERE len(tk) >= 3)),
      |c AS (SELECT doc_id, gn, g, count(*) AS c FROM g GROUP BY doc_id, gn, g),
      |p AS (SELECT doc_id, gn, max(c) AS maxc, sum(c) AS tot,
      |        sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupmass
      |      FROM c GROUP BY doc_id, gn),
      |r AS (SELECT doc_id,
      |        max(CASE WHEN gn = 2 THEN round(maxc * 1.0 / tot, 6) END) AS top_bigram_frac,
      |        max(CASE WHEN gn = 3 THEN round(dupmass * 1.0 / tot, 6) END) AS dup_trigram_frac
      |      FROM p GROUP BY doc_id),
      |staged AS (
      |  SELECT q.doc_id, q.quality, r.top_bigram_frac, r.dup_trigram_frac,
      |    CASE WHEN q.n < 3 THEN 'short'
      |         WHEN q.quality < 0.65 THEN 'quality'
      |         WHEN r.top_bigram_frac > 0.05 OR r.dup_trigram_frac > 0.05 THEN 'repetition'
      |         WHEN q.doc_id <> min(q.doc_id) OVER (PARTITION BY md5(q.text)) THEN 'exact_dup'
      |         ELSE 'keep' END AS stage
      |  FROM q LEFT JOIN r USING (doc_id))
      |SELECT doc_id, quality, top_bigram_frac, dup_trigram_frac, stage,
      |  stage = 'keep' AS keep
      |FROM staged ORDER BY doc_id""".stripMargin

  val x4RepetitionSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |g AS (
      |  SELECT doc_id, 2 AS n, tk[i] || ' ' || tk[i + 1] AS g
      |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM t)
      |  UNION ALL
      |  SELECT doc_id, 3 AS n, tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS g
      |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i FROM t)),
      |c AS (SELECT doc_id, n, g, count(*) AS c FROM g GROUP BY doc_id, n, g),
      |p AS (SELECT doc_id, n, max(c) AS maxc, sum(c) AS tot,
      |        sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupmass
      |      FROM c GROUP BY doc_id, n)
      |SELECT doc_id,
      |  max(CASE WHEN n = 2 THEN round(maxc * 1.0 / tot, 6) END) AS top_bigram_frac,
      |  max(CASE WHEN n = 3 THEN round(dupmass * 1.0 / tot, 6) END) AS dup_trigram_frac,
      |  (max(CASE WHEN n = 2 THEN round(maxc * 1.0 / tot, 6) END) <= 0.05
      |   AND max(CASE WHEN n = 3 THEN round(dupmass * 1.0 / tot, 6) END) <= 0.05) AS keep
      |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
