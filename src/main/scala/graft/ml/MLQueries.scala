package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.kmeans.{KmeansQueries, Lloyd, VecMeanAgg}

/** The composite K-Means entries (SURVEY.md §2.10-2.11) + MLlib cross-check.
  */
object MLQueries {

  // (context incarnation, sfDir) -> 64-row (pos, mu, v, nrm) top-component
  // frame. At 100 TB the fitted component is a persisted model artifact
  // that every whitening/monitoring consumer reads — the memo is that
  // store's in-session stand-in (the dedup-artifact story, ArtifactMemo).
  private val pcaCache =
    new java.util.concurrent.ConcurrentHashMap[graft.text.ArtifactMemo.Key, DataFrame]()

  /** Memoized grid-snapped top principal component of the embedding table:
    * two unrolled power steps on the centered covariance, every stage
    * rounded to the 1e-7 grid (see q_pca_power's comment). Returns
    * (pos, mu, v, nrm) — the snapped mean, unit component, and |C·v| of
    * the last iterate. Shared by q_pca_power and q_embed_whiten.
    */
  def pcaTopFor(s: SparkSession, dir: String): DataFrame =
    graft.text.ArtifactMemo.memo(pcaCache, "pca_top", s, dir) {
      val emb = Tables.embeddings(s, dir)
      val xl = emb.select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      val nv = emb.agg(count(lit(1)).cast("double").as("nv"))
      val mu = xl.groupBy("pos").agg(round(avg("x"), 7).as("mu"))
      val xc = xl.join(mu, "pos")
        .select(col("vec_id"), col("pos"), (col("x") - col("mu")).as("xc"))
      def step(v: DataFrame): DataFrame = {
        val dot = xc.join(v, "pos")
          .groupBy("vec_id").agg(round(sum(col("xc") * col("v")), 7).as("dot"))
        val w = xc.join(dot, "vec_id")
          .crossJoin(broadcast(nv))
          .groupBy("pos").agg(sum(col("xc") * col("dot") / col("nv")).as("w"))
        val nrm = w.agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
        w.crossJoin(broadcast(nrm))
          .select(col("pos"), round(col("w") / col("nrm"), 7).as("v"), col("nrm"))
      }
      val v0 = mu.select(col("pos"), lit(0.125).as("v"))
      val v2 = step(step(v0).select("pos", "v"))
      v2.join(mu, "pos").select("pos", "mu", "v", "nrm").localCheckpoint(eager = false)
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NS: top principal component of the embedding table by POWER ITERATION
    // expressed as pure dataflow — the anisotropy/collapse monitor an
    // embedding pipeline publishes (a dominant component swallowing most
    // variance = collapsed representations; its loadings say which dims).
    // Two unrolled iterations on the CENTERED second-moment matrix, working
    // entirely in long form (vec_id, pos, value): each iteration is one
    // pos-join + vec_id-aggregate (the dot products) and one vec_id-join +
    // pos-aggregate (the matrix-vector product) — at any scale the only
    // row-scale shuffles are on those two keys, and the d-sized vector
    // frames ride along broadcast-free (d is bounded). Cross-engine float
    // discipline = the Lloyd grid snap: every stage output (mean, dots,
    // normalized vector) is rounded to the 1e-7 grid BEFORE the next stage
    // consumes it, so both engines feed bit-identical inputs forward and
    // sum-order wobble (~1e-12 over row-scale sums) can never compound
    // across iterations. lambda = |C·v| of the last iterate (variance
    // units, pre-normalization norm).
    "q_pca_power" -> { (s, dir) =>
      val nvecs = Tables.embeddings(s, dir).agg(count(lit(1)).as("n_vecs"))
      // v is already on the 1e-7 grid: re-rounding to 6 dp would create
      // exact-half ties where the two engines' round modes diverge, so the
      // snapped loading is emitted verbatim (lambda is a RAW double -> one
      // 6 dp round is boundary-safe)
      pcaTopFor(s, dir).crossJoin(broadcast(nvecs))
        .select(col("pos"), col("mu"), col("v").as("loading"),
          round(col("nrm"), 6).as("lambda"), col("n_vecs"))
        .orderBy("pos")
    },

    // NS: all-but-the-top whitening census (the ABTT postprocess): remove
    // the mean and the top component's projection from every embedding and
    // report the variance ledger — total, along-top, residual — plus the
    // top component's variance share. Rides the memoized pca_top artifact
    // (at 100 TB the fitted component is a persisted model artifact; the
    // whitening pass is one scan + a d-row join). ss_top and ss_resid are
    // computed INDEPENDENTLY (not derived), so the Pythagoras identity
    // ss_total ≈ ss_top + ss_resid is a live cross-check, spec-pinned.
    "q_embed_whiten" -> { (s, dir) =>
      val top = pcaTopFor(s, dir)
      val emb = Tables.embeddings(s, dir)
      val nv = emb.agg(count(lit(1)).cast("double").as("nv"),
        count(lit(1)).as("n_vecs"))
      val xc = emb.select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .join(top.select("pos", "mu", "v"), "pos")
        .select(col("vec_id"), (col("x") - col("mu")).as("xc"), col("v"))
      val proj = xc.groupBy("vec_id")
        .agg(round(sum(col("xc") * col("v")), 7).as("proj"))
      val ssTotal = xc.agg(sum(col("xc") * col("xc")).as("ss_total"))
      val ssTop = proj.agg(sum(col("proj") * col("proj")).as("ss_top"))
      val r = col("xc") - col("proj") * col("v")
      val ssResid = xc.join(proj, "vec_id").agg(sum(r * r).as("ss_resid"))
      nv.crossJoin(broadcast(ssTotal)).crossJoin(broadcast(ssTop))
        .crossJoin(broadcast(ssResid))
        .select(col("n_vecs"),
          round(col("ss_total") / col("nv"), 6).as("var_total"),
          round(col("ss_top") / col("nv"), 6).as("var_top"),
          round(col("ss_resid") / col("nv"), 6).as("var_resid"),
          round(col("ss_top") / col("ss_total") * 1e6).cast("long").as("top_share_ppm"))
    },

    // NS: farthest-point sampling (k-center greedy) — the diversity
    // coreset selector modern data-pruning pipelines run over embeddings
    // (pick the point farthest from everything chosen so far; after k
    // picks the max remaining distance IS the k-center coverage radius,
    // reported alongside). Five picks unrolled as pure dataflow: per pick
    // one pos-join + vec-aggregate (distances to the new center, snapped
    // to the 1e-7 grid so the cross-engine argmax can only tie on
    // EQUAL-after-snap distances, which the (d2 desc, vec_id asc) order
    // then breaks identically — exact duplicates land here by design) and
    // one least() combine into the running min-distance frame. The chosen
    // set is k rows; the only row-scale state is the (vec_id, d2) frame —
    // the same shape a 1000-executor k-center run keeps partitioned.
    // r13: AQE-off-if-compact was tried here (the 5 unrolled FPS rounds
    // each pay an AQE stage barrier over a 2000-row frame; interleaved
    // probe said x0.84) and REJECTED by the paired full-bench map
    // (x1.26 normalized — in-bench the AQE coalescing it loses matters
    // more than the barriers it saves). Full-bench maps outrank isolated
    // probes per the round-12/13 decision protocol.
    "q_coreset_fps" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      // localCheckpoint x2 (the Lloyd-loop discipline): xl feeds every
      // round's distance pass (~9 references), and each round's `mind`
      // is referenced twice (the argmax pick AND the next least() fold) —
      // without the cuts the lazy plan re-evaluates the round r-1 subtree
      // twice per level (~2^4 replay; measured 6.6 -> 2.2 s warm,
      // 11.4 -> 2.7 s cold at sf0.1). Values are snapped BEFORE each cut, so
      // materialization cannot move the hash.
      val xl = emb.select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .localCheckpoint(eager = false)
      def coordsOf(pid: DataFrame): DataFrame =
        xl.join(broadcast(pid), xl("vec_id") === pid("pid"))
          .select(col("pos"), col("x").as("c"))
      def d2To(cv: DataFrame): DataFrame =
        xl.join(cv, "pos").groupBy("vec_id")
          .agg(round(sum((col("x") - col("c")) * (col("x") - col("c"))), 7).as("d2"))
      val seed = emb.agg(min("vec_id").as("pid"))
      var mind = d2To(coordsOf(seed)).localCheckpoint(eager = false)
      var picks = seed.select(lit(0L).as("rank"), col("pid").as("vec_id"),
        lit(null).cast("double").as("picked_d2"))
      for (r <- 1 to 4) {
        val pick = mind
          .agg(max(struct(col("d2"), (-col("vec_id")).as("nid"))).as("m"))
          .select((-col("m.nid")).as("pid"), col("m.d2").as("picked_d2"))
        picks = picks.union(pick.select(lit(r.toLong).as("rank"),
          col("pid").as("vec_id"), col("picked_d2")))
        val dNew = d2To(coordsOf(pick.select("pid")))
          .withColumnRenamed("d2", "d2_new")
        mind = mind.join(dNew, "vec_id")
          .select(col("vec_id"), least(col("d2"), col("d2_new")).as("d2"))
          .localCheckpoint(eager = false)
      }
      // NOTE: picked_d2/coverage are ALREADY on the 1e-7 grid — a second
      // round to 6 dp would hit exact-half ties where Spark (HALF_UP on
      // decimal digits) and DuckDB (float-representation based) disagree,
      // so snapped values are emitted verbatim
      val cov = mind.agg(max("d2").as("coverage_d2"))
      picks.crossJoin(broadcast(cov))
        .select(col("rank"), col("vec_id"), col("picked_d2"), col("coverage_d2"))
        .orderBy("rank")
    },

    // NS: per-dimension mutual information with the label — the supervised
    // feature-relevance census (which embedding dims carry label signal;
    // the ranking that drives feature selection / probe design). Each dim
    // is sign-quantized against its grid-snapped mean, then MI(bit; label)
    // is computed per dim from EXACT integer cell counts: the row-scale
    // work is one (pos, bit, label) aggregate whose output is bounded by
    // d x 2 x |labels| cells — after that everything (marginals, the <=
    // 2|L|-term log sum) runs on the tiny cell table, so the float
    // arithmetic never sees a row-scale sum (deterministic modulo ln ulp,
    // absorbed by the 9 dp round).
    "q_mutual_info" -> { (s, dir) =>
      val xl = Tables.embeddings(s, dir).select(
        col("label").cast("long").as("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      val mu = xl.groupBy("pos").agg(round(avg("x"), 7).as("mu"))
      val bits = xl.join(mu, "pos")
        .select(col("label"), col("pos"), (col("x") > col("mu")).cast("long").as("b"))
      val cells = bits.groupBy("pos", "b", "label").agg(count(lit(1)).as("n_bl"))
      val margB = cells.groupBy("pos", "b").agg(sum("n_bl").as("n_b"))
      val margL = cells.groupBy("pos", "label").agg(sum("n_bl").as("n_l"))
      val tot = Tables.embeddings(s, dir).agg(count(lit(1)).as("n"))
      val term = col("n_bl").cast("double") / col("n").cast("double") *
        log(col("n_bl").cast("double") * col("n").cast("double") /
          (col("n_b").cast("double") * col("n_l").cast("double")))
      cells.join(margB, Seq("pos", "b")).join(margL, Seq("pos", "label"))
        .crossJoin(broadcast(tot))
        .groupBy("pos")
        .agg(count(lit(1)).as("n_cells"), round(sum(term), 9).as("mi_nats"))
        .orderBy("pos")
    },

    // The VecMeanAgg Aggregator (§2.10) against the same oracle as the
    // posexplode mean: per-label vector means, exploded back to scalars.
    // Proves the distributive (sum, count) buffer — the 100 TB path that
    // shuffles K buffers instead of N·D rows — computes the identical result.
    // NS: Mahalanobis outlier census over the embedding table (diagonal
    // covariance) — the multivariate companion of q_anomaly_zscore and the
    // standard embedding-space junk detector (d² ~ χ²_d for well-behaved
    // representations; a fat right tail = corrupt/degenerate vectors). The
    // per-dim model (snapped mean + variance, the pca-prelude grid
    // discipline: round 7 so cross-engine agg wobble sits decades under
    // the quantum) is a d-row frame COLLECTED to the driver — the Lloyd
    // K-row precedent, d=64 — and scored as literal arrays in one
    // zero-shuffle narrow pass over the vectors; per-vector d² rounds at 6
    // (64-term fold, wobble ~1e-13) so the χ²_{0.99,64}=93.2169 threshold
    // compare is decided on identical values. Output is the one-row
    // census: count, outliers, ppm, max/mean d².
    // NS: one Weiszfeld step toward the GEOMETRIC median of the embedding
    // cloud — the robust centroid (the mean chases outliers; the geometric
    // median is the L1-optimal prototype, and Weiszfeld is its classic
    // fixed-point iteration m' = Σx/d / Σ1/d). Numerics: the start point
    // is the per-dim mean rounded at 7 (the q_mahalanobis prototype
    // discipline — rounding sits 9 decades above avg's reorder wobble),
    // each row's distance is the deterministic in-row fold, and the two
    // reweighted sums quantize PER ROW to micro units so the corpus-scale
    // sums are exact integers with no float order anywhere. The d-row
    // result is a combinable aggregate; nothing row-scale after.
    "q_weiszfeld_step" -> { (s, dir) =>
      val pts = Tables.points(s, dir)
      val mean = pts.select(posexplode(col("coordinates")).as(Seq("pos", "v")))
        .groupBy("pos").agg(round(avg("v"), 7).as("m"))
        .orderBy("pos").collect().map(_.getDouble(1)) // 64 values, Lloyd-init-style
      val mArr = array(mean.map(lit).toSeq: _*)
      pts
        .withColumn("d",
          greatest(graft.core.Vec.dist(col("coordinates"), mArr), lit(1e-9)))
        .select(posexplode(col("coordinates")).as(Seq("pos", "xv")), col("d"))
        .select(col("pos").cast("long").as("pos"),
          expr("CAST(round(xv / d * 1000000) AS BIGINT)").as("t_micro"),
          expr("CAST(round(1.0e0 / d * 1000000) AS BIGINT)").as("w_micro"))
        .groupBy("pos").agg(sum("t_micro").as("st"), sum("w_micro").as("sw"))
        .select(col("pos"), col("st"), col("sw"),
          expr("CAST(floor(CAST(st AS DOUBLE) * 1000.0e0 / CAST(sw AS DOUBLE)) AS BIGINT)")
            .as("new_center_milli"))
        .orderBy("pos")
    },

    "q_mahalanobis" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val xl = emb.select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      val stats = xl.groupBy("pos")
        .agg(round(avg("x"), 7).as("mu"), round(avg(col("x") * col("x")), 7).as("m2"))
        .select(col("pos"), col("mu"),
          greatest(round(col("m2") - col("mu") * col("mu"), 7), lit(1e-7)).as("s2"))
      val st = stats.orderBy("pos").collect()
      val terms = st.map { r =>
        val i = r.getAs[Int]("pos")
        val diff = element_at(col("embedding"), i + 1).cast("double") -
          lit(r.getAs[Double]("mu"))
        diff * diff / lit(r.getAs[Double]("s2"))
      }
      val d2 = round(terms.reduce(_ + _), 6)
      emb.select(d2.as("d2"))
        .agg(count(lit(1)).as("n_vectors"),
          sum((col("d2") > lit(93.21685966023841)).cast("long")).as("n_outliers"),
          round(max("d2"), 6).as("max_d2"),
          round(avg("d2"), 4).as("mean_d2"))
        .select(col("n_vectors"), col("n_outliers"),
          expr("n_outliers * 1000000 DIV n_vectors").as("outlier_ppm"),
          col("max_d2"), col("mean_d2"))
    },

    "q_udaf_vecmean" -> { (s, dir) =>
      Tables.embeddings(s, dir)
        .groupBy(col("label").cast("long").as("label"))
        .agg(VecMeanAgg(col("embedding")).as("mean_vec"))
        .select(col("label"), posexplode(col("mean_vec")).as(Seq("pos", "m")))
        .select(col("label"), col("pos"), round(col("m"), 7).as("m"))
        .orderBy("label", "pos")
    },
    // Text -> words table (UDTF shape, §2.10): built-in explode covers the
    // reference-free generator case; grouped to (doc, word, n).
    "q_udtf_tokens" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
        .orderBy("doc_id", "word")
    },
    // Typed cogroup (§2.10 family; KeyValueGroupedDataset.cogroup): the
    // reference's reducer is exactly this shape — all records for a key
    // from BOTH inputs handed to one function (reducer.py:58-67 holds one
    // dict of grouped points). Per customer key: order stats cogrouped
    // with event stats in a single co-partitioned shuffle (both sides
    // hash-partition on k; no join materialization of the pair product).
    // Sums are rounded AFTER the typed fold, in the same select style as
    // every other sum aggregate.
    "q_cogroup" -> { (s, dir) =>
      val s2 = s
      import s2.implicits._
      val orders = Tables.orders(s, dir)
        .select(col("o_custkey").as("k"), col("o_totalprice").as("v")).as[(Long, Double)]
      val events = Tables.events(s, dir)
        .select(col("user_id").as("k"), col("value").as("v")).as[(Long, Double)]
      orders.groupByKey(_._1).cogroup(events.groupByKey(_._1)) { (k, os, es) =>
        var no = 0L; var so = 0.0
        os.foreach { o => no += 1; so += o._2 }
        var ne = 0L; var se = 0.0
        es.foreach { e => ne += 1; se += e._2 }
        Iterator((k, no, so, ne, se))
      }.toDF("k", "n_orders", "sum_orders", "n_events", "sum_events")
        .select(col("k"), col("n_orders"), round(col("sum_orders"), 2).as("sum_orders"),
          col("n_events"), round(col("sum_events"), 6).as("sum_events"))
        .orderBy("k")
    },
    // Full Lloyd loop (§2.11): iterate to convergence (<=10 iters, eps 1e-6)
    // with the Aggregator path, emit final centroids as scalar rows.
    // Means are snapped to the 1e-7 grid between iterations (the
    // q_kmeans_iter2 determinism discipline applied to the whole loop), so
    // the DuckDB oracle replays the ENTIRE iteration as a recursive CTE —
    // the flagship query gets a real hash check, not rows>0
    // (reference semantics: master.py:95-151).
    "q_kmeans_full" -> { (s, dir) =>
      val (cents, iters) = Lloyd.runFor(s, dir, KmeansQueries.K,
        maxIter = 10, eps = 1e-6, useAgg = true, grid = Some(7))
      val s2 = s
      import s2.implicits._
      cents.flatMap(c => c.coordinates.zipWithIndex.map {
        case (v, pos) => (c.cid, pos, v + 0.0, iters.toLong)
      }).toDF("cid", "pos", "m", "n_iters").orderBy("cid", "pos")
    },
    // MLlib K-Means over the same vectors (north-star approach line:
    // "MLlib K-Means clustering over RDD/DataFrame"): fixed seed, k=5,
    // registered as a fused self-eval (the q_distinct_approx pattern —
    // cluster ids and kmeans|| init are engine-private, so the MODEL can't
    // hash-match a SQL oracle, but its acceptance claims can): emits the
    // SQL-exact frame (k, n_points) plus the partition verdict (cluster
    // sizes are a partition of the input: sum == n, all nonempty). The
    // SSE-vs-Lloyd quality band deliberately lives in SemDedupSpec as a
    // toleranced assertion, NOT here: seeded kmeans|| training cost varies
    // with input partitioning/core count, so pinning it to the driver's
    // byte-hash gate would flake on environment changes with no code
    // regression (the round-7 lesson).
    "q_kmeans_mllib" -> { (s, dir) =>
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val pts = Tables.points(s, dir)
      val data = pts.select(array_to_vector(col("coordinates")).as("features"))
      val model = new KMeans().setK(KmeansQueries.K).setSeed(42L)
        .setMaxIter(10).setTol(1e-6).fit(data)
      val sizes = model.summary.clusterSizes
      val n = pts.count()
      val s2 = s
      import s2.implicits._
      Seq((KmeansQueries.K.toLong, n,
        if (sizes.sum == n && sizes.forall(_ > 0)) 1L else 0L))
        .toDF("k", "n_points", "sizes_ok")
    },

    // NS: deterministic negative sampling for contrastive/retrieval
    // training — each document draws 4 negatives as a pure md5 function of
    // (doc_id, k) mod corpus size (no RNG: re-running never moves a pair,
    // the q_stratified_split discipline), self-draws bumped to the next id.
    // No join generates the candidates — the corpus size is a 1-row
    // broadcast and the draw is per-row arithmetic, so the op is one
    // narrow pass + a 4-row census: pair counts, self-collisions avoided,
    // distinct-negative coverage in exact ppm (a skewed sampler would show
    // coverage collapse here before training ever sees it).
    "q_negative_sampling" -> { (s, dir) =>
      val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
      val pairs = Tables.documents(s, dir).select(col("doc_id"))
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("n_docs"),
          explode(sequence(lit(1L), lit(4L))).as("k"))
        .withColumn("cand", pmod(graft.text.TextQueries.h32(
          concat(lit("neg:"), col("doc_id").cast("string"),
            lit(":"), col("k").cast("string"))), col("n_docs")))
        .withColumn("bumped", (col("cand") === col("doc_id")).cast("long"))
        .withColumn("neg_id",
          when(col("cand") === col("doc_id"),
            pmod(col("cand") + 1, col("n_docs"))).otherwise(col("cand")))
      pairs.groupBy("k").agg(
          count(lit(1)).as("n_pairs"),
          sum("bumped").as("n_self_avoided"),
          countDistinct("neg_id").as("distinct_negs"))
        .select(col("k"), col("n_pairs"), col("n_self_avoided"),
          col("distinct_negs"),
          expr("distinct_negs * 1000000 DIV n_pairs").as("coverage_ppm"))
        .orderBy("k")
    },

    // NS: the hashing trick — 16-dim signed hashed bag-of-words per doc
    // (HashingTF's collision-tolerant shape, md5-derived so both engines
    // agree bit-for-bit). The (doc, dim) shuffle is map-side combined to
    // <=16 rows per doc regardless of document length — the fixed-width
    // feature encoding that never needs a vocabulary broadcast at 100 TB.
    "q_feature_hash" -> { (s, dir) =>
      val word = col("word")
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .select(col("doc_id"),
          pmod(graft.text.TextQueries.h32(concat(lit("fh:"), word)), lit(16L)).as("dim"),
          (pmod(graft.text.TextQueries.h32(concat(lit("sg:"), word)), lit(2L)) * 2 - 1)
            .as("sign"))
        .groupBy("doc_id", "dim")
        .agg(sum("sign").as("val"))
        .orderBy("doc_id", "dim")
    }
  )

  /** Recursive-CTE replay of the full Lloyd loop (Lloyd.run with grid=7):
    * the working table `it` holds one iteration's centroids; each recursive
    * step re-assigns all points against them (same (d2, cid) tie-break as
    * the prelude), takes per-dim means rounded to the same 1e-7 grid the
    * Spark loop snaps to, and stops on convergence (all moved < eps AND no
    * cluster vanished — master.py:149-151 semantics) or at 10 iterations.
    * Shared by q_kmeans_full (emits the final centroids) and q_semdedup
    * (clusters by them).
    */
  val lloydRecursiveCte: String =
    s"""WITH RECURSIVE
       |pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS c FROM embeddings),
       |init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid, c
       |         FROM (SELECT vec_id, c FROM pts ORDER BY vec_id LIMIT ${KmeansQueries.K}) t),
       |it AS (
       |  SELECT 0 AS iter, FALSE AS stop, cid, c FROM init
       |  UNION ALL
       |  SELECT nxt.iter, nxt.stop, nxt.cid, nxt.c FROM (
       |    WITH prev AS (SELECT iter, stop, cid, c FROM it WHERE NOT stop),
       |    asg AS (SELECT vec_id, cid FROM (
       |        SELECT p.vec_id, pr.cid,
       |               row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |                 list_sum(list_transform(list_zip(p.c, pr.c),
       |                   z -> (z[1]-z[2])*(z[1]-z[2]))), pr.cid) AS rn
       |        FROM pts p CROSS JOIN prev pr) r WHERE rn = 1),
       |    means AS (SELECT a.cid, CAST(u.i AS INT) AS i, round(avg(p.c[u.i]), 7) + 0.0 AS m
       |              FROM asg a JOIN pts p USING (vec_id),
       |                   UNNEST(generate_series(1, len(p.c))) AS u(i)
       |              GROUP BY a.cid, u.i),
       |    newc AS (SELECT cid, list(m ORDER BY i) AS c FROM means GROUP BY cid),
       |    conv AS (SELECT coalesce(
       |               (SELECT count(*) FROM newc) = (SELECT count(*) FROM prev)
       |               AND bool_and(sqrt(list_sum(list_transform(list_zip(n.c, pr.c),
       |                     z -> (z[1]-z[2])*(z[1]-z[2])))) < 1e-6), FALSE) AS ok
       |             FROM newc n JOIN prev pr USING (cid)),
       |    meta AS (SELECT max(iter) + 1 AS iter FROM prev)
       |    SELECT meta.iter AS iter, (conv.ok OR meta.iter >= 10) AS stop, newc.cid, newc.c
       |    FROM newc CROSS JOIN conv CROSS JOIN meta
       |  ) nxt
       |),
       |fin AS (SELECT cid, c FROM it WHERE iter = (SELECT max(iter) FROM it))""".stripMargin

  /** Shared DuckDB prelude replaying [[pcaTopFor]]'s grid-snapped power
    * steps; ends with v2(pos, v) + n2(nrm) + mu/xc/nv in scope.
    */
  private val pcaPreludeSql: String =
    """WITH x AS (SELECT vec_id, CAST(u.i - 1 AS INT) AS pos,
      |                  CAST(embedding AS DOUBLE[])[u.i] AS x
      |           FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
      |nv AS (SELECT CAST(count(*) AS DOUBLE) AS nv, count(*) AS n_vecs FROM embeddings),
      |mu AS (SELECT pos, round(avg(x), 7) + 0.0 AS mu FROM x GROUP BY 1),
      |xc AS (SELECT vec_id, x.pos, x.x - mu.mu AS xc FROM x JOIN mu ON x.pos = mu.pos),
      |d1 AS (SELECT vec_id, round(sum(xc * 0.125), 7) AS dot FROM xc GROUP BY 1),
      |w1 AS (SELECT pos, sum(xc * dot / nv) AS w
      |       FROM xc JOIN d1 USING (vec_id) CROSS JOIN nv GROUP BY pos),
      |n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w1),
      |v1 AS (SELECT pos, round(w / nrm, 7) AS v FROM w1 CROSS JOIN n1),
      |d2 AS (SELECT vec_id, round(sum(xc * v), 7) AS dot
      |       FROM xc JOIN v1 ON xc.pos = v1.pos GROUP BY vec_id),
      |w2 AS (SELECT xc.pos, sum(xc * dot / nv) AS w
      |       FROM xc JOIN d2 USING (vec_id) CROSS JOIN nv GROUP BY xc.pos),
      |n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w2),
      |v2 AS (SELECT pos, round(w / nrm, 7) AS v FROM w2 CROSS JOIN n2)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // identical rounded-mean start, in-row distance fold, per-row micro
    // quantization, exact integer sums
    "q_weiszfeld_step" ->
      """WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS c FROM embeddings),
        |mean AS (SELECT CAST(u.i - 1 AS BIGINT) AS pos, round(avg(c[u.i]), 7) AS m
        |         FROM pts, UNNEST(generate_series(1, len(c))) AS u(i)
        |         GROUP BY 1),
        |marr AS (SELECT list(m ORDER BY pos) AS m FROM mean),
        |dd AS (SELECT vec_id, c,
        |              greatest(sqrt(list_sum(list_transform(list_zip(c, marr.m),
        |                z -> (z[1]-z[2])*(z[1]-z[2])))), 1e-9) AS d
        |       FROM pts CROSS JOIN marr),
        |t AS (SELECT CAST(u.i - 1 AS BIGINT) AS pos,
        |             CAST(round(c[u.i] / d * 1000000) AS BIGINT) AS t_micro,
        |             CAST(round(1.0e0 / d * 1000000) AS BIGINT) AS w_micro
        |      FROM dd, UNNEST(generate_series(1, len(c))) AS u(i)),
        |a AS (SELECT pos, CAST(sum(t_micro) AS BIGINT) AS st,
        |             CAST(sum(w_micro) AS BIGINT) AS sw
        |      FROM t GROUP BY 1)
        |SELECT pos, st, sw,
        |       CAST(floor(CAST(st AS DOUBLE) * 1000.0e0 / CAST(sw AS DOUBLE)) AS BIGINT)
        |         AS new_center_milli
        |FROM a ORDER BY pos""".stripMargin,
    "q_negative_sampling" ->
      """WITH n AS (SELECT count(*) AS n_docs FROM documents),
        |p AS (SELECT doc_id, k, n_docs,
        |             ('0x' || substr(md5('neg:' || CAST(doc_id AS VARCHAR) || ':'
        |                || CAST(k AS VARCHAR)), 1, 8))::BIGINT % n_docs AS cand
        |      FROM documents CROSS JOIN n CROSS JOIN (VALUES (1), (2), (3), (4)) ks(k)),
        |q AS (SELECT CAST(k AS BIGINT) AS k,
        |             CAST(cand = doc_id AS BIGINT) AS bumped,
        |             CASE WHEN cand = doc_id THEN (cand + 1) % n_docs ELSE cand END AS neg_id
        |      FROM p)
        |SELECT k, count(*) AS n_pairs,
        |       CAST(sum(bumped) AS BIGINT) AS n_self_avoided,
        |       count(DISTINCT neg_id) AS distinct_negs,
        |       CAST(count(DISTINCT neg_id) * 1000000 // count(*) AS BIGINT) AS coverage_ppm
        |FROM q GROUP BY k ORDER BY k""".stripMargin,
    // Final-centroid emit over the shared recursive replay (comment on
    // [[lloydRecursiveCte]]).
    "q_kmeans_full" ->
      s"""$lloydRecursiveCte
         |SELECT cid, CAST(u.i - 1 AS INT) AS pos, c[u.i] + 0.0 AS m,
         |       CAST((SELECT max(iter) FROM it) AS BIGINT) AS n_iters
         |FROM fin, UNNEST(generate_series(1, len(c))) AS u(i)
         |ORDER BY cid, pos""".stripMargin,
    // Self-eval oracle (q_distinct_approx pattern): n_points is SQL-exact;
    // the partition verdict is pinned to literal 1, so a drifting MLlib
    // fit goes hash-red. The SSE-vs-Lloyd band is NOT pinned here — it
    // depends on seeded kmeans|| training cost, which varies with input
    // partitioning/core count; it lives as a toleranced assertion in
    // SemDedupSpec instead (the round-7 de-flake).
    "q_kmeans_mllib" ->
      s"""SELECT CAST(${KmeansQueries.K} AS BIGINT) AS k,
         |       count(*) AS n_points,
         |       CAST(1 AS BIGINT) AS sizes_ok
         |FROM embeddings""".stripMargin,
    // cogroup == full outer join of the two per-key aggregates (absent
    // side contributes (0, 0.0))
    "q_cogroup" ->
      """WITH o AS (SELECT o_custkey AS k, count(*) AS n_orders, sum(o_totalprice) AS sum_orders
        |           FROM orders GROUP BY k),
        |e AS (SELECT user_id AS k, count(*) AS n_events, sum(value) AS sum_events
        |      FROM events GROUP BY k)
        |SELECT coalesce(o.k, e.k) AS k,
        |       coalesce(n_orders, 0) AS n_orders,
        |       round(coalesce(sum_orders, 0.0), 2) AS sum_orders,
        |       coalesce(n_events, 0) AS n_events,
        |       round(coalesce(sum_events, 0.0), 6) AS sum_events
        |FROM o FULL OUTER JOIN e ON o.k = e.k
        |ORDER BY k""".stripMargin,
    // Same oracle as q_centroid_mean, with BIGINT label to match the cast.
    // same snapped per-dim model; the per-vector sum groups by vec_id (the
    // 64-term order differs from Spark's literal fold — wobble decades
    // under the shared round-6 quantum)
    "q_mahalanobis" ->
      """WITH x AS (SELECT vec_id, CAST(u.i - 1 AS INT) AS pos,
        |                  CAST(embedding AS DOUBLE[])[u.i] AS x
        |           FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
        |st AS (SELECT pos, round(avg(x), 7) + 0.0 AS mu, round(avg(x * x), 7) + 0.0 AS m2
        |       FROM x GROUP BY 1),
        |s2 AS (SELECT pos, mu, greatest(round(m2 - mu * mu, 7), 1e-7) AS s2 FROM st),
        |d2 AS (SELECT vec_id, round(sum((x - mu) * (x - mu) / s2), 6) AS d2
        |       FROM x JOIN s2 USING (pos) GROUP BY 1)
        |SELECT count(*) AS n_vectors,
        |       CAST(sum(CASE WHEN d2 > 93.21685966023841 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       CAST(sum(CASE WHEN d2 > 93.21685966023841 THEN 1 ELSE 0 END) * 1000000
        |            // count(*) AS BIGINT) AS outlier_ppm,
        |       round(max(d2), 6) AS max_d2,
        |       round(avg(d2), 4) AS mean_d2
        |FROM d2""".stripMargin,
    "q_udaf_vecmean" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(u.i - 1 AS INT) AS pos,
        |       round(avg(CAST(embedding AS DOUBLE[])[u.i]), 7) + 0.0 AS m
        |FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
        |GROUP BY label, pos
        |ORDER BY label, pos""".stripMargin,
    // unrolled greedy replay: per pick, ORDER BY (d2 DESC, vec_id) LIMIT 1
    // is the same argmax + tie-break as the Spark struct max
    "q_coreset_fps" ->
      """WITH x AS (SELECT vec_id, CAST(u.i - 1 AS INT) AS pos,
        |                  CAST(embedding AS DOUBLE[])[u.i] AS x
        |           FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
        |s0 AS (SELECT min(vec_id) AS pid FROM embeddings),
        |c0 AS (SELECT pos, x.x AS c FROM x JOIN s0 ON x.vec_id = s0.pid),
        |m0 AS (SELECT vec_id, round(sum((x - c) * (x - c)), 7) AS d2
        |       FROM x JOIN c0 USING (pos) GROUP BY 1),
        |p1 AS (SELECT vec_id AS pid, d2 FROM m0 ORDER BY d2 DESC, vec_id ASC LIMIT 1),
        |c1 AS (SELECT pos, x.x AS c FROM x JOIN p1 ON x.vec_id = p1.pid),
        |d1 AS (SELECT vec_id, round(sum((x - c) * (x - c)), 7) AS d2
        |       FROM x JOIN c1 USING (pos) GROUP BY 1),
        |m1 AS (SELECT m0.vec_id, least(m0.d2, d1.d2) AS d2 FROM m0 JOIN d1 USING (vec_id)),
        |p2 AS (SELECT vec_id AS pid, d2 FROM m1 ORDER BY d2 DESC, vec_id ASC LIMIT 1),
        |c2 AS (SELECT pos, x.x AS c FROM x JOIN p2 ON x.vec_id = p2.pid),
        |d2t AS (SELECT vec_id, round(sum((x - c) * (x - c)), 7) AS d2
        |        FROM x JOIN c2 USING (pos) GROUP BY 1),
        |m2 AS (SELECT m1.vec_id, least(m1.d2, d2t.d2) AS d2 FROM m1 JOIN d2t USING (vec_id)),
        |p3 AS (SELECT vec_id AS pid, d2 FROM m2 ORDER BY d2 DESC, vec_id ASC LIMIT 1),
        |c3 AS (SELECT pos, x.x AS c FROM x JOIN p3 ON x.vec_id = p3.pid),
        |d3 AS (SELECT vec_id, round(sum((x - c) * (x - c)), 7) AS d2
        |       FROM x JOIN c3 USING (pos) GROUP BY 1),
        |m3 AS (SELECT m2.vec_id, least(m2.d2, d3.d2) AS d2 FROM m2 JOIN d3 USING (vec_id)),
        |p4 AS (SELECT vec_id AS pid, d2 FROM m3 ORDER BY d2 DESC, vec_id ASC LIMIT 1),
        |c4 AS (SELECT pos, x.x AS c FROM x JOIN p4 ON x.vec_id = p4.pid),
        |d4 AS (SELECT vec_id, round(sum((x - c) * (x - c)), 7) AS d2
        |       FROM x JOIN c4 USING (pos) GROUP BY 1),
        |m4 AS (SELECT m3.vec_id, least(m3.d2, d4.d2) AS d2 FROM m3 JOIN d4 USING (vec_id)),
        |cov AS (SELECT max(d2) AS coverage_d2 FROM m4),
        |picks AS (
        |  SELECT CAST(0 AS BIGINT) AS rank, pid AS vec_id, CAST(NULL AS DOUBLE) AS picked_d2 FROM s0
        |  UNION ALL SELECT 1, pid, d2 FROM p1
        |  UNION ALL SELECT 2, pid, d2 FROM p2
        |  UNION ALL SELECT 3, pid, d2 FROM p3
        |  UNION ALL SELECT 4, pid, d2 FROM p4)
        |SELECT rank, vec_id, picked_d2 + 0.0 AS picked_d2, coverage_d2
        |FROM picks CROSS JOIN cov ORDER BY rank""".stripMargin,
    // exact integer cells; the log sum runs over <= 2|L| tiny terms
    "q_mutual_info" ->
      """WITH x AS (SELECT CAST(label AS BIGINT) AS label, CAST(u.i - 1 AS INT) AS pos,
        |                  CAST(embedding AS DOUBLE[])[u.i] AS x
        |           FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
        |mu AS (SELECT pos, round(avg(x), 7) + 0.0 AS mu FROM x GROUP BY 1),
        |b AS (SELECT label, x.pos, CAST(x.x > mu.mu AS BIGINT) AS b
        |      FROM x JOIN mu ON x.pos = mu.pos),
        |cells AS (SELECT pos, b, label, count(*) AS n_bl FROM b GROUP BY 1, 2, 3),
        |mb AS (SELECT pos, b, CAST(sum(n_bl) AS BIGINT) AS n_b FROM cells GROUP BY 1, 2),
        |ml AS (SELECT pos, label, CAST(sum(n_bl) AS BIGINT) AS n_l FROM cells GROUP BY 1, 2),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
        |SELECT pos, count(*) AS n_cells,
        |       round(sum(CAST(n_bl AS DOUBLE) / n *
        |                 ln(CAST(n_bl AS DOUBLE) * n / (CAST(n_b AS DOUBLE) * n_l))), 9) AS mi_nats
        |FROM cells JOIN mb USING (pos, b) JOIN ml USING (pos, label) CROSS JOIN tot
        |GROUP BY pos ORDER BY pos""".stripMargin,
    // identical grid-snapped power steps in long form; every rounded stage
    // matches the Spark side exactly, so drift cannot compound
    "q_pca_power" ->
      s"""$pcaPreludeSql
        |SELECT v2.pos, mu.mu, v + 0.0 AS loading,
        |       round(nrm, 6) + 0.0 AS lambda, n_vecs
        |FROM v2 JOIN mu ON v2.pos = mu.pos CROSS JOIN n2 CROSS JOIN nv
        |ORDER BY v2.pos""".stripMargin,
    // same prelude; the whitening pass is one more snapped projection
    "q_embed_whiten" ->
      s"""$pcaPreludeSql,
        |xcv AS (SELECT xc.vec_id, xc.xc, v2.v FROM xc JOIN v2 ON xc.pos = v2.pos),
        |proj AS (SELECT vec_id, round(sum(xc * v), 7) AS proj FROM xcv GROUP BY 1),
        |st AS (SELECT sum(xc * xc) AS ss_total FROM xcv),
        |sp AS (SELECT sum(proj * proj) AS ss_top FROM proj),
        |sr AS (SELECT sum((xc - proj * v) * (xc - proj * v)) AS ss_resid
        |       FROM xcv JOIN proj USING (vec_id))
        |SELECT n_vecs,
        |       round(ss_total / nv, 6) + 0.0 AS var_total,
        |       round(ss_top / nv, 6) + 0.0 AS var_top,
        |       round(ss_resid / nv, 6) + 0.0 AS var_resid,
        |       CAST(round(ss_top / ss_total * 1e6) AS BIGINT) AS top_share_ppm
        |FROM nv CROSS JOIN st CROSS JOIN sp CROSS JOIN sr""".stripMargin,
    "q_udtf_tokens" ->
      """SELECT doc_id, u.word, count(*) AS n
        |FROM documents, UNNEST(string_split(text, ' ')) AS u(word)
        |GROUP BY doc_id, u.word
        |ORDER BY doc_id, u.word""".stripMargin,
    "q_feature_hash" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |h AS (SELECT doc_id,
        |             ('0x' || substr(md5('fh:' || word), 1, 8))::BIGINT % 16 AS dim,
        |             (('0x' || substr(md5('sg:' || word), 1, 8))::BIGINT % 2) * 2 - 1 AS sign
        |      FROM w)
        |SELECT doc_id, dim, CAST(sum(sign) AS BIGINT) AS val
        |FROM h GROUP BY doc_id, dim ORDER BY doc_id, dim""".stripMargin
  )
}
