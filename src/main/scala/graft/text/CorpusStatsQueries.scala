package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus-shape statistics: the empirical-law fits and canonicalization
  * censuses a curation run publishes beside its dedup/quality reports —
  * Zipf rank-frequency slope, Heaps' vocabulary-growth exponent, URL
  * canonicalization dedup, and per-source distinctive-term lift.
  *
  * Reference scope: the K-Means repo has no text surface; these extend the
  * mandated LLM-pipeline family (BASELINE.json:6, text analysis) with the
  * corpus-level diagnostics that detect crawler pathologies (a Zipf slope
  * far from -1 flags boilerplate/spam; a Heaps beta near 0 flags a
  * template corpus; URL-level dup mass flags a crawl-frontier bug).
  *
  * Scale design: every query reduces to a VOCABULARY-bounded or
  * fixed-bucket frame in one combinable aggregate before any window/fit
  * math — the token explode is linear and map-side-collapsed; no window
  * ever runs over corpus-scale rows. Fits (least squares in log space) fold
  * 10-100 bounded rows. Ranks/rates are integer cross-multiplications
  * wherever rational; the fit coefficients round at 6dp.
  */
object CorpusStatsQueries {

  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Least-squares slope/intercept of y on x over a small frame — shared
    * by the two log-space law fits. Returns (slope, intercept) columns
    * from aggregated Σ columns n, sx, sy, sxy, sxx.
    */
  private def slopeCol: Column =
    (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NS: Zipf rank-frequency fit — ln(freq) regressed on ln(rank) over
    // the top-100 terms. Corpus collapses to term counts first (vocab-
    // bounded), the rank window runs over that frame only, and the fit
    // folds 100 rows. A healthy natural corpus sits near slope -1.
    "q_zipf_fit" -> { (s, dir) =>
      val tc = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      val ranked = tc
        .withColumn("rk", row_number().over(
          Window.orderBy(col("cnt").desc, col("term"))))
        .filter(col("rk") <= 100)
        .select(log(col("rk").cast("double")).as("x"),
          log(col("cnt").cast("double")).as("y"))
      ranked
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .select(col("n").as("n_fit"),
          (round(slopeCol, 6) + lit(0.0)).as("slope"),
          (round((col("sy") - slopeCol * col("sx")) / col("n"), 6) + lit(0.0)).as("intercept"))
    },

    // NS: Heaps'-law vocabulary growth — cumulative vocabulary vs
    // cumulative token mass at 10 doc-id prefix checkpoints, with the
    // growth exponent beta fitted in log space. Terms carry only their
    // FIRST bucket (min over a monotone bucketing of doc_id), so the
    // per-term frame is vocab-bounded and the cumulative window runs over
    // exactly 10 rows. Beta well under 1 is the healthy sub-linear growth;
    // beta near 0 means a closed template vocabulary.
    "q_heaps_law" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val width = docs.agg(((max("doc_id") + 10) / 10).cast("long").as("w"))
      val bucketed = docs.crossJoin(broadcast(width))
        .select(col("doc_id"), col("text"), expr("doc_id DIV w").as("bucket"))
      val tokensPerBucket = bucketed
        .groupBy("bucket")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      val newTermsPerBucket = bucketed
        .select(col("bucket"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("term").agg(min("bucket").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_new"))
      val w = Window.orderBy("bucket")
      val curve = tokensPerBucket
        .join(newTermsPerBucket, Seq("bucket"), "left_outer")
        .na.fill(0L, Seq("n_new"))
        .withColumn("tokens_cum", sum("n_tokens").over(w))
        .withColumn("vocab_cum", sum("n_new").over(w))
        .select("bucket", "tokens_cum", "vocab_cum")
      val beta = curve
        .select(log(col("tokens_cum").cast("double")).as("x"),
          log(col("vocab_cum").cast("double")).as("y"))
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        // + 0.0 folds any -0.0 from an exactly-flat fit to +0.0 (the
        // duplicate-heavy stress corpus produces beta = 0; both engines
        // must hash the same zero)
        .select((round(slopeCol, 6) + lit(0.0)).as("beta"))
      curve.crossJoin(broadcast(beta)).orderBy("bucket")
    },

    // NS: URL canonicalization dedup census — the crawl-frontier hygiene
    // pass: scheme/host case folding, www-stripping, utm-query and
    // fragment removal, /index.html and scheme normalization, then a
    // per-source (docs, canonical-distinct, dup ppm) census. URLs are
    // hash-derived from doc ids (the fixture carries none) so both engines
    // materialize identical raw strings; the canonicalizer is the operator
    // under test. One distinct-agg per source; dup rate integer ppm.
    "q_url_dedup" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
        .withColumn("h1", pmod(h32(concat(lit("u1:"), col("doc_id"))), lit(2)))
        .withColumn("h2", pmod(h32(concat(lit("u2:"), col("doc_id"))), lit(2)))
        .withColumn("h3", pmod(h32(concat(lit("u3:"), col("doc_id"))), lit(3)))
        .withColumn("raw_url", concat(
          when(col("h1") === 0, "http").otherwise("HTTPS"), lit("://"),
          when(col("h2") === 0, "www.").otherwise(""),
          col("source"), lit(".Example.com/p/"),
          pmod(col("doc_id"), lit(50)).cast("string"),
          when(col("h3") === 1, "?utm_source=x")
            .when(col("h3") === 2, "/index.html#frag").otherwise("")))
      val canon = d.withColumn("canon",
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(lower(col("raw_url")), "#.*$", ""),
                "\\?utm_[^#]*$", ""),
              "/index\\.html$", ""),
            "^http://", "https://"),
          "://www\\.", "://"))
      canon.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("canon").as("n_canonical"))
        .withColumn("dup_ppm",
          expr("(n_docs - n_canonical) * 1000000 DIV n_docs"))
        .orderBy("source")
    },

    // NS: per-source distinctive terms — top-3 terms by lift (in-source
    // frequency share over corpus share), the "what is this source about"
    // panel on a mixture dashboard. Lift is an exact integer
    // cross-multiplication (tf_src·total_corpus·1e6 DIV total_src·tf_corpus
    // — fixture-magnitude bounded; at true corpus scale promote to
    // decimal(38) like q_auc), ranked per source over the vocab-bounded
    // (source × term) frame with a total tie-break.
    "q_source_lift" -> { (s, dir) =>
      val tok = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      val st = tok.groupBy("source", "term").agg(count(lit(1)).as("tf_src"))
      val srcTot = st.groupBy("source").agg(sum("tf_src").as("total_src"))
      val termTot = st.groupBy("term").agg(sum("tf_src").as("tf_corpus"))
      val corpusTot = st.agg(sum("tf_src").as("total_corpus"))
      val lifted = st.join(srcTot, "source").join(termTot, "term")
        .crossJoin(broadcast(corpusTot))
        .withColumn("lift_x1e6",
          expr("tf_src * total_corpus * 1000000 DIV (total_src * tf_corpus)"))
      lifted
        .withColumn("rk", row_number().over(Window.partitionBy("source")
          .orderBy(col("lift_x1e6").desc, col("tf_src").desc, col("term"))))
        .filter(col("rk") <= 3)
        .select("source", "rk", "term", "tf_src", "lift_x1e6")
        .orderBy("source", "rk")
    },

    // NS: leave-one-out source ablation — the cheapest honest data
    // valuation: for each source, what happens to the corpus-level metric
    // (mean tokens per doc, milli-precision) if that source is removed?
    // LOO deltas come FREE from the totals (metric_without = (T − t_s) /
    // (N − n_s)) — no per-source re-scan, the algebraic trick that makes
    // group-ablation valuation one aggregate at 100 TB. Exact integers
    // throughout (truncating DIV, all operands non-negative); delta in
    // ppm of the full-corpus metric ranks sources by marginal effect.
    "q_source_ablation" -> { (s, dir) =>
      val perSrc = Tables.documents(s, dir)
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("t_src"))
      val tot = perSrc.agg(sum("n_docs").as("n_all"), sum("t_src").as("t_all"))
      perSrc.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"),
          expr("t_all * 1000 DIV n_all").as("metric_all_milli"),
          expr("(t_all - t_src) * 1000 DIV (n_all - n_docs)").as("metric_without_milli"))
        .withColumn("delta_ppm",
          // symmetric truncating division: Spark DIV truncates toward zero
          // but DuckDB // floors, so a negative delta must be divided on
          // its absolute value on both engines
          expr("""CASE WHEN metric_without_milli >= metric_all_milli
                 |  THEN (metric_without_milli - metric_all_milli) * 1000000 DIV metric_all_milli
                 |  ELSE -((metric_all_milli - metric_without_milli) * 1000000 DIV metric_all_milli)
                 |END""".stripMargin))
        .orderBy("source")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q_zipf_fit" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |tc AS (SELECT term, count(*) AS cnt FROM tok WHERE len(term) > 0 GROUP BY 1),
        |r AS (SELECT row_number() OVER (ORDER BY cnt DESC, term) AS rk, cnt FROM tc),
        |xy AS (SELECT ln(rk::DOUBLE) AS x, ln(cnt::DOUBLE) AS y FROM r WHERE rk <= 100),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x*y) AS sxy, sum(x*x) AS sxx FROM xy)
        |SELECT n AS n_fit,
        |       round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) + 0.0 AS slope,
        |       round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) + 0.0 AS intercept
        |FROM a""".stripMargin,
    "q_heaps_law" ->
      """WITH wd AS (SELECT (max(doc_id) + 10) // 10 AS w FROM documents),
        |b AS (SELECT doc_id, text, doc_id // (SELECT w FROM wd) AS bucket FROM documents),
        |tpb AS (SELECT bucket, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |        FROM b GROUP BY 1),
        |terms AS (SELECT unnest(string_split(text, ' ')) AS term, bucket FROM b),
        |fb AS (SELECT term, min(bucket) AS bucket FROM terms WHERE len(term) > 0 GROUP BY 1),
        |npb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_new FROM fb GROUP BY 1),
        |curve AS (SELECT tpb.bucket,
        |                 CAST(sum(n_tokens) OVER (ORDER BY tpb.bucket) AS BIGINT) AS tokens_cum,
        |                 CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY tpb.bucket) AS BIGINT) AS vocab_cum
        |          FROM tpb LEFT JOIN npb ON tpb.bucket = npb.bucket),
        |xy AS (SELECT ln(tokens_cum::DOUBLE) AS x, ln(vocab_cum::DOUBLE) AS y FROM curve),
        |a AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x*y) AS sxy, sum(x*x) AS sxx FROM xy),
        |beta AS (SELECT round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) + 0.0 AS beta FROM a)
        |SELECT bucket, tokens_cum, vocab_cum, beta FROM curve CROSS JOIN beta
        |ORDER BY bucket""".stripMargin,
    "q_url_dedup" ->
      """WITH d AS (
        |  SELECT source,
        |         ('0x' || substr(md5('u1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS h1,
        |         ('0x' || substr(md5('u2:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS h2,
        |         ('0x' || substr(md5('u3:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 3 AS h3,
        |         doc_id % 50 AS p
        |  FROM documents),
        |u AS (SELECT source,
        |             (CASE WHEN h1 = 0 THEN 'http' ELSE 'HTTPS' END) || '://' ||
        |             (CASE WHEN h2 = 0 THEN 'www.' ELSE '' END) ||
        |             source || '.Example.com/p/' || CAST(p AS VARCHAR) ||
        |             (CASE WHEN h3 = 1 THEN '?utm_source=x'
        |                   WHEN h3 = 2 THEN '/index.html#frag' ELSE '' END) AS raw_url
        |      FROM d),
        |c AS (SELECT source,
        |             regexp_replace(
        |               regexp_replace(
        |                 regexp_replace(
        |                   regexp_replace(
        |                     regexp_replace(lower(raw_url), '#.*$', ''),
        |                     '\?utm_[^#]*$', ''),
        |                   '/index\.html$', ''),
        |                 '^http://', 'https://'),
        |               '://www\.', '://') AS canon
        |      FROM u)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
        |       (count(*) - count(DISTINCT canon)) * 1000000 // count(*) AS dup_ppm
        |FROM c GROUP BY 1 ORDER BY source""".stripMargin,
    "q_source_lift" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
        |st AS (SELECT source, term, CAST(count(*) AS BIGINT) AS tf_src
        |       FROM tok WHERE len(term) > 0 GROUP BY 1, 2),
        |srct AS (SELECT source, CAST(sum(tf_src) AS BIGINT) AS total_src FROM st GROUP BY 1),
        |tt AS (SELECT term, CAST(sum(tf_src) AS BIGINT) AS tf_corpus FROM st GROUP BY 1),
        |ct AS (SELECT CAST(sum(tf_src) AS BIGINT) AS total_corpus FROM st),
        |l AS (SELECT st.source, st.term, st.tf_src,
        |             st.tf_src * total_corpus * 1000000 // (total_src * tf_corpus) AS lift_x1e6
        |      FROM st JOIN srct USING (source) JOIN tt USING (term) CROSS JOIN ct),
        |r AS (SELECT source, term, tf_src, lift_x1e6,
        |             row_number() OVER (PARTITION BY source
        |               ORDER BY lift_x1e6 DESC, tf_src DESC, term) AS rk
        |      FROM l)
        |SELECT source, rk, term, tf_src, lift_x1e6
        |FROM r WHERE rk <= 3 ORDER BY source, rk""".stripMargin,
    // LOO from totals; symmetric truncating division for the signed delta
    "q_source_ablation" ->
      """WITH ps AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_src
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
        |               CAST(sum(t_src) AS BIGINT) AS t_all FROM ps),
        |m AS (SELECT source, n_docs,
        |             t_all * 1000 // n_all AS metric_all_milli,
        |             (t_all - t_src) * 1000 // (n_all - n_docs) AS metric_without_milli
        |      FROM ps CROSS JOIN tot)
        |SELECT source, n_docs, metric_all_milli, metric_without_milli,
        |       CASE WHEN metric_without_milli >= metric_all_milli
        |         THEN (metric_without_milli - metric_all_milli) * 1000000 // metric_all_milli
        |         ELSE -((metric_all_milli - metric_without_milli) * 1000000 // metric_all_milli)
        |       END AS delta_ppm
        |FROM m ORDER BY source""".stripMargin
  )
}
