package graft.streaming

import graft.Fns.cents
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch operators (SURVEY.md §2,
  * "Streaming"). These take an unbounded DataFrame/Dataset (from
  * `readStream` in production, MemoryStream in specs) and return the
  * transformed stream — the Spark-native re-expression of the
  * reference's producer/consumer pipelining
  * (reference test_pipeline_stream.py, test_pipeline_thread.py):
  * watermarks + incremental state replace manual queues/threads.
  */
object Streams {

  /** stream_window — tumbling 1-day window agg with 1-hour watermark.
    * Batch twin: q13_time_window.
    */
  def windowed(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .select(col("window.start").as("day"), col("event_type"), col("n"),
        col("sum_value"))

  /** stream_session — gap-based sessions via the built-in
    * `session_window` (30-min gap). Batch twin: q14_sessionize.
    */
  def sessionized(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** stream_dedup — streaming exact dedup by content hash, bounded
    * state via watermark (batch twin: dedup_exact). Late duplicates
    * beyond the watermark age out of state, which is the only way
    * dedup state stays bounded on an unbounded 100 TB/day stream.
    */
  def deduped(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_hash")

  /** stream_contam — streaming ingest gated by benchmark
    * decontamination (batch twin: contam_ngram). The eval-set shingle
    * vocabulary is STATIC and small by nature (benchmark suites), so it
    * rides along as a literal array and the whole gate is a stateless
    * per-row computation — append mode, no watermark, no state store.
    * (An explode + re-aggregate would turn this into an unbounded
    * streaming aggregation; a per-doc score must never need
    * cross-batch state.) Docs at or above `maxRatio` contamination are
    * dropped.
    */
  def contamFiltered(docs: DataFrame, evalShingles: Seq[String],
      maxRatio: Double): DataFrame = {
    val evalArr = array(evalShingles.map(lit): _*)
    val toks = col("toks")
    val shings = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
          element_at(toks, i + 3))))
      .otherwise(array(array_join(toks, " ")))
    // incoming columns ride through (drop only the internal temps) so
    // the gate COMPOSES — stream_curate chains it between the quality
    // and mix gates without re-deriving source/ts
    docs
      .withColumn("toks", graft.functions.TextFns.tokens(col("text")))
      .withColumn("shings", shings)
      .withColumn("n_shingles", size(col("shings")).cast("long"))
      .withColumn("n_contam",
        size(filter(col("shings"), x => array_contains(evalArr, x))).cast("long"))
      .withColumn("contam_ratio",
        round(col("n_contam") / col("n_shingles"), 6))
      .filter(col("contam_ratio") < maxRatio)
      .drop("toks", "shings")
  }

  /** stream_quality — stateless quality gate on ingest (batch twin:
    * text_quality + text_repetition thresholds). Like stream_contam,
    * every signal is a per-row column expression — append mode, no
    * state store, no watermark — because a quality gate that needed
    * cross-batch state would bottleneck ingest at 100 TB/day. Docs
    * outside the [minDistinct, maxDigit] band are dropped, the
    * Gopher-style rule of thumb.
    */
  def qualityGated(docs: DataFrame, minDistinctRatio: Double,
      maxDigitRatio: Double): DataFrame = {
    val toks = graft.functions.TextFns.tokens(col("text"))
    // incoming columns ride through so the gate composes (see
    // contamFiltered's note)
    docs
      .withColumn("n_toks", size(toks).cast("long"))
      .withColumn("distinct_ratio",
        round(size(array_distinct(toks)).cast("double") / col("n_toks"), 6))
      .withColumn("digit_ratio",
        round(regexp_count(col("text"), lit("[0-9]")).cast("double")
          / length(col("text")), 6))
      .filter(col("distinct_ratio") >= minDistinctRatio &&
        col("digit_ratio") <= maxDigitRatio)
  }

  /** stream_gopher — the PUBLISHED Gopher rule set (Rae et al. 2021
    * Table A1, quality_gopher's full signal table incl. all nine
    * repetition ceilings) as a stateless ingest gate. The r11
    * row-local repetition kernel is what makes this gate possible at
    * all: the previous shape counted grams through a shuffle + join
    * back — not expressible as a per-row streaming decision without
    * state — whereas now every signal is a per-row column expression
    * (TextAnalysis.gopherSignals, the SAME kernel the batch operator
    * selects from), so the full named rule set gates arriving docs in
    * append mode with no state store, no watermark, and verdicts
    * equal to the batch operator's row-for-row (spec). Rejected docs
    * are dropped; kept docs carry the signal columns for audit and
    * incoming columns ride through so the gate composes
    * (contamFiltered's note).
    */
  def gopherGated(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.gopherSignals(docs)
      .filter(col("pass_gopher") === 1L)

  /** stream_code — code-vs-prose ROUTING on ingest (batch twin:
    * code_detect). Unlike the drop gates above, a code detector
    * routes: code and prose flow to different tokenizers, dedup
    * granularities and mixture buckets (the StarCoder/The-Stack
    * practice), so arriving docs keep flowing with the feature
    * columns and the is_code verdict attached. Every signal is a
    * per-row integer expression (TextAnalysis.codeSignals — the SAME
    * kernel the batch operator selects from): append mode, no state
    * store, no watermark, verdicts equal the batch operator's
    * row-for-row (spec). Incoming columns ride through so the router
    * composes.
    */
  def codeRouted(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.codeSignals(docs)

  /** stream_extract — crawl-entry HTML→text extraction live (r18;
    * batch twin: html_extract). The FIRST stage of a streaming crawl
    * ingest: raw pages arrive, the extraction verdict (lengths, ratio,
    * content digest) leaves, and every downstream gate in this file
    * (quality, gopher, contam, the fingerprint firewall) consumes the
    * extracted text — so the crawl tier composes with the standing
    * ingest loop instead of assuming pre-cleaned documents. The clean
    * chain is one per-row regex/string kernel (Html.extract — the
    * SAME expressions the batch operator runs), so this is append
    * mode, no state store, no watermark: a stateless map can never
    * bottleneck ingest, and batch == stream row-for-row under any
    * batch cut (spec splits the corpus three ways).
    */
  def extractStream(pages: DataFrame): DataFrame =
    graft.operators.Html.extract(pages)

  /** stream_url_dedup — canonical-URL dedup on the crawl frontier
    * live (r18; batch twin: url_canon's dup groups). The cheapest
    * dedup rung of all needs no content, so it runs FIRST in a
    * streaming crawl: arriving URLs canonicalize (the SAME
    * Crawl.canonicalize chain the batch op runs — fragment, case,
    * www., default port, trailing slash, tracking params) and
    * duplicates of a canonical form already seen inside the watermark
    * drop before anything is fetched. Watermark-bounded state is the
    * stream_dedup contract: re-crawls arrive clustered in time (a
    * snapshot's spellings land together), so the horizon is where the
    * dedup value lives, and unbounded per-URL state on a 100 TB/day
    * frontier is not an option — the STANDING exact gate is the
    * fingerprint firewall's job (ingest_e2e), not this stage's.
    */
  def urlDeduped(urls: DataFrame): DataFrame =
    graft.operators.Crawl.canonicalize(urls)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("canon")

  /** stream_doremi — running mixture-drift monitor under the FROZEN
    * proxy LM (batch twin: mix_doremi; model source: the batch op's
    * unigram distribution, the dsir/stream_dsir frozen-fence
    * convention). The batch op derives weights from per-source
    * cross-entropy under the corpus unigram LM; this monitor keeps
    * that cross-entropy RUNNING per source as the stream flows — the
    * signal that tells an operator the mixture has drifted and the
    * plan needs re-deriving. With the LM frozen, per-source xent is a
    * ratio of two ADDITIVE sums (Σ cnt·(−ln p) and Σ cnt), so the
    * streaming aggregation is plain built-in sum state — constant per
    * source, exact across any batch split (no sketch needed; the spec
    * asserts streamed == an independent mirror, not just
    * batch-equality). OOV tokens read the floor log-prob the caller
    * passes (unseen-token smoothing is model policy, not stream
    * policy). Output per source: running n_toks, xent, excess vs the
    * FROZEN mixture mean, and reweight_hint once |excess| crosses the
    * threshold — re-deriving the weights themselves stays batch-side
    * (mix_doremi), where the EG closed form needs cross-source
    * normalization a single streaming aggregation cannot express.
    */
  def doremiMonitored(docs: DataFrame, lm: DataFrame,
      floorLnp: Double, meanXent: Double,
      hintThreshold: Double): DataFrame = {
    import graft.functions.TextFns
    // the frozen LM's row count is the corpus's distinct vocabulary —
    // it grows with the corpus, so it rides the counted broadcast
    // guard shared with the batch mining path (broadcast only while
    // the MEASURED count fits, shuffled hash above), not a bare
    // broadcast(); the lm side is static, so the count runs once at
    // plan construction, never per micro-batch
    val (_, lmSide) =
      graft.operators.Search.guarded(lm, graft.operators.Dedup.SpanBroadcastMaxRows)
    docs
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .join(lmSide, Seq("token"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_toks"),
        sum(-coalesce(col("lnp"), lit(floorLnp))).as("xent_sum"))
      .select(col("source"), col("n_toks"),
        round(col("xent_sum") / col("n_toks"), 6).as("xent"),
        round(col("xent_sum") / col("n_toks") - meanXent, 6).as("excess"),
        (abs(col("xent_sum") / col("n_toks") - meanXent) > hintThreshold)
          .cast("long").as("reweight_hint"))
  }

  /** stream_classifier — FROZEN-model quality scoring on ingest
    * (batch twin: quality_classifier; model source: sink_classifier).
    * Training cannot live in the stream (LBFGS iterates over the full
    * sample; an unbounded stream has no "full"), so the model is
    * trained batch-side on the previous corpus snapshot, persisted
    * through [[graft.sources.ClassifierStore]], and applied here as
    * what it already is at serving time: ONE narrow per-row fold with
    * the weights riding the plan as an array literal — append mode,
    * no state store, no watermark, scores equal to the batch serving
    * path row-for-row (spec). Between model refreshes a grown corpus
    * scores under slightly stale weights — the same documented drift
    * contract as sink_lm's cuts and ann_upsert's frozen centroids.
    * Incoming columns ride through so the gate composes.
    */
  def classifierScored(docs: DataFrame,
      m: graft.operators.QualityClassifier.Model): DataFrame =
    graft.operators.QualityClassifier.served(docs, m)

  /** The classifier as a GATE (the stream_curate stage shape): score
    * with the frozen model, drop below `minProb`, kept docs carry
    * `prob` for audit; incoming columns ride through so the gate
    * composes. Same rounding as the batch serving path, so the kept
    * set equals batch serving's row-for-row. */
  def classifierGated(docs: DataFrame,
      m: graft.operators.QualityClassifier.Model,
      minProb: Double): DataFrame =
    classifierScored(docs, m).filter(col("prob") >= minProb)

  /** stream_embed_pca — FROZEN-basis projection of arriving
    * embeddings (batch twin: embed_pca): the PCA basis, like the
    * classifier's weights and the upsert index's centroids, is fit
    * batch-side on the previous snapshot (fitting needs the corpus
    * covariance; an unbounded stream has no covariance to converge
    * to) and the stream applies what projection already is — a
    * narrow per-row fold with mean and components as plan literals —
    * append mode, no state store, no watermark, projections equal to
    * the batch operator's row-for-row (spec). Basis staleness under
    * distribution drift is the documented ann_upsert frozen-model
    * contract; incoming columns ride through so the step composes
    * (project-then-index at ingest).
    */
  def pcaProjected(embs: DataFrame, mean: Array[Double],
      comps: Array[Array[Double]]): DataFrame =
    embs.withColumn(s"pca${comps.length}",
      graft.operators.EmbedPca.projectCol(col("embedding"), mean, comps))

  /** stream_calibrate — FROZEN per-source percentile gating of
    * arriving docs (batch twin: score_calibrate_sketch, model source:
    * sink_calibration). The percentile of a score is a property of the
    * source's DISTRIBUTION, which a stream does not have — profiling
    * it incrementally would make a fixed score's percentile drift
    * micro-batch to micro-batch, so the same doc could pass today and
    * fail tomorrow. The model therefore derives batch-side (one KLL
    * sketch per source, persisted), and the gate is the SAME serving
    * kernel the batch sketch mode runs — [[graft.operators.Calibrate
    * .calibrateFrom]]: score each arriving doc, stream-static
    * broadcast join against the tiny sketch frame, graft_kll_rank →
    * keep at the global floor. Append mode, no state store, no
    * watermark; keep bits equal the batch path's row-for-row (spec).
    * Percentile staleness between store refreshes is the documented
    * sink_lm-cuts drift contract. A doc from a source absent from the
    * model is dropped by the inner join — the stream_mix convention
    * for unprofiled keys.
    */
  def calibrateGated(docs: DataFrame, model: DataFrame): DataFrame =
    graft.operators.Calibrate.calibrateFrom(docs, model)

  /** stream_tok — FROZEN-tokenizer segmentation of arriving docs
    * (batch twin: tok_unigram_encode; table source: sink_tokenizer).
    * Training cannot live in the stream (the EM loop iterates over the
    * corpus word-count table; an unbounded stream has no final counts)
    * — and MUST not: piece boundaries shifting batch-to-batch would
    * silently change every downstream chunk digest. The table is
    * trained batch-side, persisted through
    * [[graft.sources.TokenizerStore]], and applied here as what
    * serving already is: the narrow graft_unigram Viterbi kernel with
    * the table riding as two plan literals — append mode, no state
    * store, no watermark, piece streams equal to the batch encode path
    * row-for-row (spec). Staleness between table refreshes is the
    * documented sink_lm/ann_upsert frozen-model contract. Incoming
    * columns ride through so the step composes (segment-then-pack at
    * ingest).
    */
  def tokSegmented(docs: DataFrame, table: Seq[(String, Double)]): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("_toks", graft.functions.TextFns.tokens(col("text")))
      .withColumn("_pieces",
        graft.operators.Unigram.segmentPieces(col("_toks"), table))
      .withColumn("n_words", size(col("_toks")).cast("long"))
      .withColumn("n_pieces", size(col("_pieces")).cast("long"))
      .withColumn("piece_digest", md5(array_join(col("_pieces"), " ")))
      .drop("_toks", "_pieces")
  }

  /** stream_cluster — FROZEN-centroid cluster assignment of arriving
    * embeddings (batch twin: embed_cluster/cluster_prune's assign).
    * Centroids, like the classifier's weights and the PCA basis, are
    * fit batch-side on the previous snapshot (Lloyd needs the corpus;
    * an unbounded stream has no stable cell structure to converge to)
    * and the stream applies what assignment already is — a per-row
    * argmax over the centroid set, expressed as ONE narrow
    * array_max(transform(...)) fold so no join, no TopK exchange and
    * no state store exist on the streaming side: append mode, the
    * SAME code as the batch path ([[graft.operators.Cluster
    * .assignFold]] — the fold was proven bit-identical to the old
    * join+TopK ranking here first, then the batch side adopted it),
    * so row-for-row equality including the exact-tie rule (ties to
    * the SMALLER centroid id, carried by maximizing struct(ccos,
    * -id)) is structural. The centroid literal is bounded
    * by [[graft.operators.Similarity.KmeansMaxK]] = 4096 × dim floats
    * (~1 MB worst case in the plan); an index past literal size is
    * the AnnServe broadcast-handle territory. Staleness under drift
    * is the documented ann_upsert frozen-model contract; incoming
    * columns ride through so the gate composes (assign-then-route at
    * ingest).
    */
  def clusterAssigned(embs: DataFrame,
      cents: Array[(Int, Array[Float])]): DataFrame =
    graft.operators.Cluster.assignFold(embs, cents)

  /** stream_prune — the [[clusterAssigned]] gate extended with FROZEN
    * per-cluster prune fences (batch twin: cluster_prune; fence
    * source: sink_centroids). The fence histogram needs the corpus
    * (an unbounded stream has no per-cluster population to budget
    * against), so thresholds are derived batch-side
    * (operators.Cluster.pruneThresholds), persisted through
    * [[graft.sources.CentroidStore]], and applied here as what a
    * fence already is: one map-literal lookup + an integer bin
    * compare per row — append mode, no state store, keep bits equal
    * to the batch operator's row-for-row when the fences were
    * profiled over the same rows (spec). A cluster absent from the
    * fence map prunes nothing — the batch left-join contract.
    */
  def clusterPruneGated(embs: DataFrame,
      cents: Array[(Int, Array[Float])],
      thresholds: Map[Long, Long]): DataFrame = {
    val assigned = clusterAssigned(embs, cents)
      .withColumn("__bin", graft.operators.Cluster.binOf(col("ccos")))
    val gated =
      if (thresholds.isEmpty) assigned.withColumn("keep", lit(1L))
      else assigned
        .withColumn("__thr", typedLit(thresholds))
        .withColumn("keep",
          when(element_at(col("__thr"), col("cluster")).isNotNull &&
            col("__bin") >= element_at(col("__thr"), col("cluster")),
            0L).otherwise(1L))
    gated.drop("__thr", "__bin")
  }

  /** stream_outlier — FROZEN-fence robust outlier flags on the event
    * stream (batch twin: outlier_mad). Medians need the corpus (an
    * unbounded stream has no stable median without an ever-growing
    * state), so the per-type (med, mad) fences come from OFFLINE
    * profiling of the previous snapshot — the stream_mix literal-
    * profile pattern — and the gate is the SAME exact dyadic compare
    * the batch operator ends with: append mode, no state store, no
    * watermark, flags equal to the batch path's row-for-row when the
    * profile covers the same rows (spec). Events of types absent
    * from the profile are dropped (no fence — the stream_mix
    * convention); fence staleness under drift is the documented
    * frozen-model contract, and profile_drift is the monitor that
    * says when to re-profile.
    */
  def outlierGated(events: DataFrame,
      fences: Map[String, (Double, Double)]): DataFrame = {
    require(fences.nonEmpty, "fence profile must be non-empty")
    val med = fences.foldLeft(lit(null).cast("double")) {
      case (acc, (t, (m, _))) => when(col("event_type") === t, m).otherwise(acc)
    }
    val mad = fences.foldLeft(lit(null).cast("double")) {
      case (acc, (t, (_, d))) => when(col("event_type") === t, d).otherwise(acc)
    }
    events
      .withColumn("cents", cents(col("value")))
      .withColumn("med", med)
      .withColumn("mad", mad)
      .filter(col("med").isNotNull)
      .withColumn("dev", abs(col("cents") - col("med")))
      .withColumn("is_outlier",
        (col("dev") > col("mad") * 3.0).cast("long"))
  }

  /** stream_mix — stateless temperature-mix gate on ingest (batch
    * twin: sample_temperature). Per-source totals cannot be counted
    * inside an unbounded stream without an ever-growing aggregation,
    * so they come from OFFLINE profiling (the previous corpus
    * snapshot), baked in as a literal source → n_s table; the α = 1/2
    * keep test is then the SAME pure per-row decimal(38,0) expression
    * the batch operator uses — append mode, no state store, no
    * watermark. With counts profiled over the same rows, the kept set
    * equals the batch operator's exactly (spec-asserted). Docs from
    * sources absent in the profile are dropped (no mass budget).
    */
  def tempMixGated(docs: DataFrame,
      sourceCounts: Map[String, Long]): DataFrame = {
    require(sourceCounts.nonEmpty, "source profile must be non-empty")
    val nmin = sourceCounts.values.min
    val ns = sourceCounts.foldLeft(lit(null).cast("long")) {
      case (acc, (s, n)) => when(col("source") === s, n).otherwise(acc)
    }
    docs
      .withColumn("h", (col("doc_id") * graft.operators.Sampling.TempMul)
        % graft.operators.Sampling.MixMod)
      .withColumn("ns", ns)
      .filter(col("ns").isNotNull &&
        graft.operators.Sampling.tempKeep(col("h"), col("ns"), lit(nmin)))
      .select(col("doc_id"), col("source"), col("h").as("temp_hash"))
  }

  /** stream_split — content-keyed split assignment on ingest (batch
    * twin: split_safe): the split is a pure function of md5(text)
    * (Splits.splitOf), so an arriving doc is routed train/eval the
    * moment it arrives, identically to the batch op, with NO state —
    * and identically to any exact copy of it that arrived before or
    * arrives after, which is the leakage guarantee (a doc-id-keyed
    * split cannot make that promise on a stream where ids are
    * assigned at ingest). The batch op's n_copies column is corpus
    * bookkeeping that needs a corpus; the gate emits the assignment.
    * Incoming columns ride through so the gate composes.
    */
  def splitAssigned(docs: DataFrame): DataFrame =
    docs.withColumn("content_hash", md5(col("text")))
      .withColumn("split",
        expr(graft.operators.Splits.splitOf("content_hash")))

  /** stream_score — stateless scoring gate on (prediction, reference)
    * pairs as they arrive (batch twin: score_f1): per-row SQuAD-style
    * token F1 through the SAME graft_f1_common kernel the batch
    * operator uses — O(n+m) per row, whole-stage codegen, append mode,
    * no watermark, no state store. The live-eval shape: model outputs
    * stream in, pairs below `minF1` are surfaced/dropped at ingest,
    * and scores for a given pair equal the batch operator's exactly.
    */
  def scoreGated(pairs: DataFrame, minF1: Double): DataFrame = {
    graft.plans.GraftFunctions.register(pairs.sparkSession)
    val prec = col("n_common") / col("n_pred")
    val rec = col("n_common") / col("n_gold")
    pairs
      .withColumn("pt", graft.functions.TextFns.tokens(col("pred")))
      .withColumn("gtt", graft.functions.TextFns.tokens(col("gt")))
      .select(col("doc_id"),
        size(col("pt")).cast("long").as("n_pred"),
        size(col("gtt")).cast("long").as("n_gold"),
        expr("graft_f1_common(pt, gtt)").as("n_common"))
      .withColumn("f1",
        when(col("n_common") === 0, lit(0.0))
          .otherwise(round(lit(2.0) * prec * rec / (prec + rec), 6)))
      .filter(col("f1") >= minF1)
  }

  /** stream_curate — the composed stateless ingest firewall (batch
    * twin: the quality → classifier → mix prefix of curate_e2e, plus
    * benchmark decontamination): quality gate, then decontamination,
    * then the FROZEN-model trained filter, then the α = 1/2
    * temperature mix, chained as ONE append-mode stream — every stage
    * is a per-row decision (the gates were built to carry incoming
    * columns through precisely so they compose; the classifier's
    * weights ride the plan as a literal), so the whole firewall has NO
    * state store, no watermark, and batch boundaries cannot change any
    * decision. The near-dup stage stays OUTSIDE this chain by design:
    * exact dedup needs watermarked state (stream_dedup) and MinHash
    * banding needs cross-doc joins — at 100 TB/day those run as the
    * batch backfill, while this chain is the cheap gate that keeps
    * obvious rejects from ever reaching storage.
    */
  /** stream_file_source — the production batch→stream bridge every
    * other streaming row abstracts behind MemoryStream: parquet shard
    * FILES landing in a directory ARE the stream (the drop-folder /
    * landing-zone shape a 100 TB ingest actually has), and Structured
    * Streaming's file source gives exactly-once PER FILE — the
    * checkpoint records which files each micro-batch committed, so a
    * restart neither re-emits a committed shard nor misses one that
    * landed while the query was down (spec kills the query between
    * shards and proves both). `maxFilesPerTrigger=1` bounds a
    * micro-batch to one shard — the backpressure dial that keeps a
    * backlog of landed files from becoming one giant batch. The
    * returned frame is an ordinary streaming DataFrame: every gate in
    * this file composes downstream unchanged (the spec runs the
    * blocklist gate on it).
    */
  def fileSource(spark: org.apache.spark.sql.SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  /** The blocklist as a GATE (batch core: blocklist_filter's probe —
    * the bounded term list rides as a plan literal, so the gate is one
    * narrow per-row set membership): real pipelines run it FIRST, it
    * is the cheapest stage and its drops are categorical. Incoming
    * columns ride through so the gate composes. */
  def blocklistGated(docs: DataFrame): DataFrame = {
    import graft.functions.TextFns
    docs.filter(size(array_intersect(TextFns.tokens(col("text")),
      array(graft.operators.TextAnalysis.Blocklist.map(lit): _*))) === 0)
  }

  def curateGated(docs: DataFrame, evalShingles: Seq[String],
      maxRatio: Double, minDistinctRatio: Double, maxDigitRatio: Double,
      m: graft.operators.QualityClassifier.Model, minProb: Double,
      sourceCounts: Map[String, Long]): DataFrame =
    tempMixGated(
      classifierGated(
        contamFiltered(
          qualityGated(blocklistGated(docs),
            minDistinctRatio, maxDigitRatio),
          evalShingles, maxRatio),
        m, minProb),
      sourceCounts)

  /** stream_search — stateless standing-query (percolation) gate on
    * ingest (batch twin: search_bm25): each arriving doc is BM25-
    * scored against the standing query and routed/dropped by
    * `minScore` the moment it arrives — the alerting shape: "surface
    * documents matching this query as they stream in". Corpus-global
    * statistics (per-term df, N, T) cannot be maintained exactly
    * inside an unbounded stream without an ever-growing aggregation,
    * so they come from OFFLINE profiling of the previous corpus
    * snapshot (the stream_mix pattern), baked in as driver constants —
    * idf_bits per term is then a LITERAL, and the whole score is the
    * same integer-exact decimal(38,0) formula the batch operator
    * uses over per-row tf/dl columns: append mode, no watermark, no
    * state store. With stats profiled over the same rows, scores
    * equal the batch operator's exactly (spec-asserted).
    */
  def searchGated(docs: DataFrame, dfCounts: Map[String, Long],
      n: Long, t: Long, minScore: Long): DataFrame = {
    import graft.operators.Search.{IdfScale, IdfScaleBits, QueryTerms}
    require(n > 0 && t > 0, "corpus profile must be non-empty")
    val toks = graft.functions.TextFns.tokens(col("text"))
    val terms = QueryTerms.filter(term => dfCounts.getOrElse(term, 0L) > 0L)
    require(terms.nonEmpty, "no query term appears in the profile")
    // per-term tf columns (cheap-body filter lambdas over the token
    // array — the allowed narrow shape); a zero tf zeroes its term's
    // contribution through the numerator, no guard needed
    val withCols = terms.zipWithIndex.foldLeft(
        docs.withColumn("__dl", size(toks).cast("long"))) {
      case (acc, (term, i)) =>
        acc.withColumn(s"__tf_$i",
          size(filter(toks, x => x === lit(term))).cast("long"))
    }
    val contribs = terms.zipWithIndex.map { case (term, i) =>
      val df = dfCounts(term)
      // driver-side constant — same surrogate the batch plan computes
      val idfBits = java.lang.Long.toBinaryString(
        ((2 * n + 2) * IdfScale) / (2 * df + 1)).length - 1 - IdfScaleBits
      expr(
        s"CAST((CAST($idfBits AS DECIMAL(38,0)) * 44 * CAST($t AS DECIMAL(38,0))" +
          s" * __tf_$i * 1000) DIV (CAST(20 AS DECIMAL(38,0)) * $t * __tf_$i" +
          s" + CAST(6 AS DECIMAL(38,0)) * $t" +
          s" + CAST(18 AS DECIMAL(38,0)) * __dl * $n) AS BIGINT)")
    }
    withCols
      .withColumn("score", contribs.reduce(_ + _))
      .withColumn("n_terms",
        terms.indices.map(i => when(col(s"__tf_$i") > 0, 1L).otherwise(0L))
          .reduce(_ + _))
      .filter(col("n_terms") > 0 && col("score") >= minScore)
      .select(col("doc_id"), col("score"), col("n_terms"))
  }

  /** stream_ann — streaming ANN serving (batch twin: ann_quantized):
    * each arriving query vector is answered with its top-k neighbors
    * within its own micro-batch. The int8 code index is STATIC serving
    * state — exactly what the quantized family exists for: at 10⁹+
    * vectors the 64 B/vector codes (8 B under PQ) are what fits in
    * executor RAM — shipped as a SPARK BROADCAST VARIABLE referenced
    * from the graft_ann_serve kernel (plans.AnnServe): the plan carries
    * only the broadcast handle, executors fetch the flat primitive
    * index (one long[] + one int[]) once per JVM, refreshed per index
    * build. At [[AnnIndexCap]] codes a plan-literal index would put
    * ~256 MB into every serialized task; the broadcast costs bytes
    * (spec-asserted by a plan-size bound). The gate stays a stateless
    * per-row computation — the kernel scores all codes with the same
    * asymmetric cosine + HALF_UP 6-decimal round the batch path uses
    * and keeps top-k by bounded insertion — append mode, no watermark,
    * no state store, and results for a given query are identical to
    * the batch operator's (spec-asserted). Beyond [[AnnIndexCap]]
    * codes the index no longer rides whole — that is the batch path's
    * shard-queries-×-index-partitions territory.
    */
  val AnnIndexCap: Int = 1 << 20

  /** Lifecycle handle for one served index: dropping the per-call temp
    * function and destroying the broadcast when the serving stream
    * terminates. In the documented production pattern (long-lived
    * session, periodic index refresh) broadcasts otherwise accumulate
    * on executors indefinitely.
    */
  final class AnnServeHandle private[streaming] (
      val functionName: String,
      bc: org.apache.spark.broadcast.Broadcast[graft.plans.AnnServe.Index],
      ss: org.apache.spark.sql.SparkSession) extends AutoCloseable {
    override def close(): Unit = {
      ss.sessionState.functionRegistry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(functionName))
      bc.destroy()
    }
  }

  private val annServeSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private val annServeLegacy =
    new java.util.concurrent.atomic.AtomicReference[AnnServeHandle](null)

  /** Legacy no-handle overload: each call RELEASES the previous legacy
    * call's temp function + broadcast (so a refresh loop on this API
    * holds one live index, not an unbounded accumulation), at the cost
    * of breaking any still-running stream served by that older index.
    * Refresh loops that overlap streams must use [[annServedWith]] and
    * close() each handle on its own stream's termination.
    */
  def annServed(queries: DataFrame, index: Seq[(Long, Seq[Int])],
      k: Int): DataFrame = {
    val (out, handle) = annServedWith(queries, index, k)
    val prev = annServeLegacy.getAndSet(handle)
    if (prev != null) {
      // the previous index may still be serving a running stream — warn
      // so concurrent users know to migrate to annServedWith + close()
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "annServed: releasing the previous legacy serving index; any " +
          "stream still using it will fail — use annServedWith for " +
          "overlapping streams")
      prev.close()
    }
    out
  }

  /** As [[annServed]], plus the [[AnnServeHandle]] the caller closes
    * when the stream stops (e.g. from a StreamingQueryListener's
    * onQueryTerminated) to release the index broadcast.
    */
  def annServedWith(queries: DataFrame, index: Seq[(Long, Seq[Int])],
      k: Int): (DataFrame, AnnServeHandle) = {
    require(index.nonEmpty && index.size <= AnnIndexCap,
      s"serving index must hold 1..$AnnIndexCap codes, got ${index.size}")
    val ss = queries.sparkSession
    graft.plans.GraftFunctions.register(ss)
    val dim = index.head._2.length
    require(index.forall(_._2.length == dim), "ragged index codes")
    val ids = new Array[Long](index.size)
    val codes = new Array[Int](index.size * dim)
    var i = 0
    index.foreach { case (id, c) =>
      ids(i) = id
      var j = 0
      c.foreach { v => codes(i * dim + j) = v; j += 1 }
      i += 1
    }
    val bc = ss.sparkContext.broadcast(graft.plans.AnnServe.Index(ids, codes, dim))
    // registered under a PER-CALL unique name so the builder closes
    // over THIS index's broadcast and later annServed calls can never
    // rebind a plan analyzed against an earlier index — two served
    // indices coexisting in one session stay isolated.
    val fn = s"graft_ann_serve_${annServeSeq.incrementAndGet()}"
    ss.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn,
      exprs => graft.plans.AnnServeExpr(exprs.head, exprs(1), bc, k),
      "built-in")
    val out = queries
      .withColumn("hits", expr(s"$fn(q_emb, q_id)"))
      .select(col("q_id"), posexplode(col("hits")).as(Seq("p", "hit")))
      .select(col("q_id"), col("hit.c_id").as("c_id"),
        col("hit.cos").as("cos"), (col("p") + 1).cast("long").as("rk"))
    (out, new AnnServeHandle(fn, bc, ss))
  }

  /** stream_join — the WATERMARKED STREAM-STREAM interval join (batch
    * twin: q27_range_join's pair set): each purchase matched to the
    * same user's views from the hour before it, with BOTH sides
    * arriving as streams. This is the one streaming archetype the
    * rest of the section does not exercise — stream-static joins
    * broadcast a frozen side, fMGWS keeps hand-rolled state; here
    * Spark's own symmetric join state buffers BOTH streams and the
    * time-range condition is what makes it bounded: the watermark
    * plus `v_ts >= p_ts - 1h` lets the engine EVICT views older than
    * watermark − 1h and purchases older than the watermark, so state
    * is O(events in the window + lateness), not O(stream). Without
    * the range bound the same join would buffer both streams forever
    * — the condition is not a filter, it is the state-eviction
    * contract. Append mode emits each matched pair exactly once, when
    * the watermark proves no earlier match can still arrive; events
    * later than `lateness` are dropped by contract (the batch twin is
    * the ground-truth backfill, the stream_asof convention).
    */
  def intervalJoined(views: DataFrame, purchases: DataFrame,
      lateness: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"),
        col("event_id").as("v_id"), col("ts").as("v_ts"),
        round(col("value") * 100, 0).cast("long").as("v_cents"))
      .withWatermark("v_ts", lateness)
    val p = purchases.select(col("user_id"),
        col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", lateness)
    p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("p_id"), col("p_ts"),
        col("v_id"), col("v_ts"), col("v_cents"))
  }

  // ---- stream_asof: per-user as-of enrichment on an event stream ----

  case class AsofEv(user_id: Long, event_type: String, event_id: Long,
      value: Double, ts: java.sql.Timestamp)

  case class AsofState(vId: Long, vValue: Double, vTsMs: Long)

  case class AsofOut(user_id: Long, p_id: Long, p_value: Double,
      v_id: Option[Long], v_value: Option[Double], gap_ms: Option[Long])

  /** stream_asof — the streaming twin of q26_asof_join: each purchase
    * is enriched with the user's latest view at or before it, the
    * moment the purchase arrives. State per user is ONE row (the
    * newest view by (ts, event_id)), so the store is O(active users)
    * regardless of stream length; idle users age out one
    * [[AsofStateTtlMs]] past their own event time (anchored to the
    * group's own max ts — the global watermark jumps from epoch on the
    * first batch and would fire every timeout spuriously).
    *
    * Within a micro-batch the group's events are replayed in event-time
    * order (views before purchases at a tie), so intra-batch ordering
    * matches the batch twin exactly. A view that arrives LATER than an
    * already-emitted purchase cannot retroactively re-enrich it —
    * append mode emits once; the event-time watermark bounds how late
    * such views can be, and the batch q26 is the ground-truth backfill.
    */
  val AsofStateTtlMs: Long = 60L * 60 * 1000

  def asofEnriched(events: Dataset[AsofEv]): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, in: Iterator[AsofEv], state: GroupState[AsofState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val evs = in.toSeq.sortBy(e =>
              (e.ts.getTime, if (e.event_type == "view") 0 else 1, e.event_id))
            var st = state.getOption.orNull
            var maxTs = if (st == null) 0L else st.vTsMs
            val out = Seq.newBuilder[AsofOut]
            evs.foreach { e =>
              maxTs = math.max(maxTs, e.ts.getTime)
              e.event_type match {
                case "view" =>
                  if (st == null || e.ts.getTime > st.vTsMs ||
                      (e.ts.getTime == st.vTsMs && e.event_id >= st.vId))
                    st = AsofState(e.event_id, e.value, e.ts.getTime)
                case "purchase" =>
                  out += (if (st == null)
                    AsofOut(uid, e.event_id, e.value, None, None, None)
                  else
                    AsofOut(uid, e.event_id, e.value, Some(st.vId),
                      Some(st.vValue), Some(e.ts.getTime - st.vTsMs)))
                case _ => () // other event types pass through stateless-ly
              }
            }
            if (st != null) state.update(st)
            if (st != null || state.exists)
              state.setTimeoutTimestamp(maxTs + AsofStateTtlMs)
            out.result().iterator
          }
      }
  }

  // ---- stream_pack: per-shard training-sequence packing ----

  case class PackIn(shard: String, doc_id: Long, n_tokens: Long,
      ts: java.sql.Timestamp)

  case class PackState(tokOffset: Long)

  case class PackFrag(shard: String, doc_id: Long, seq_id: Long,
      doc_off: Long, seq_off: Long, frag_len: Long)

  /** stream_pack — the streaming twin of seq_pack: docs are packed into
    * fixed-[[graft.operators.Sampling.SeqLen]]-token training sequences
    * AS THEY ARRIVE, keyed by shard. Batch seq_pack orders the corpus
    * by a deterministic hash; a stream's honest order IS arrival order
    * (ties within a micro-batch replayed by (ts, doc_id) so replays are
    * deterministic), and packing is inherently sequential — so the
    * scalable shape is the one real shard writers use: each shard packs
    * independently with its own running token offset, sequences are
    * addressed (shard, seq_id), and parallelism comes from sharding,
    * not from splitting one pack stream. State per shard is ONE long
    * (the token offset) — O(shards) total, a deployment constant, so
    * unlike per-doc state no TTL/eviction is needed; fragments emit in
    * append mode the moment their doc arrives, with the same
    * (doc_off, seq_off, frag_len) coordinate semantics the batch
    * manifest carries (token conservation and sequence-slot packing
    * are spec-asserted across micro-batch boundaries).
    */
  def packStream(docs: Dataset[PackIn], seqLen: Long): Dataset[PackFrag] = {
    import docs.sparkSession.implicits._
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    docs
      .groupByKey(_.shard)
      .flatMapGroupsWithState[PackState, PackFrag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: String, in: Iterator[PackIn], state: GroupState[PackState]) =>
          var off = state.getOption.map(_.tokOffset).getOrElse(0L)
          val out = Seq.newBuilder[PackFrag]
          in.toSeq.sortBy(e => (e.ts.getTime, e.doc_id)).foreach { e =>
            if (e.n_tokens > 0) {
              var s = off / seqLen
              val last = (off + e.n_tokens - 1) / seqLen
              while (s <= last) {
                val fragStart = math.max(off, s * seqLen)
                val fragEnd = math.min(off + e.n_tokens, (s + 1) * seqLen)
                out += PackFrag(shard, e.doc_id, s,
                  fragStart - off, fragStart - s * seqLen,
                  fragEnd - fragStart)
                s += 1
              }
              off += e.n_tokens
            }
          }
          state.update(PackState(off))
          out.result().iterator
      }
  }

  /** stream_profile — incremental NDV statistics over an unbounded
    * stream (batch twins: q29_sketch_merge / profile_sketch): a
    * streaming aggregation whose buffer is the mergeable DataSketches
    * HLL — each micro-batch's partial sketches union into the state
    * store's per-group sketch, so the running estimate is maintained
    * in O(sketch) state per group with NO replay of past batches (the
    * continuous-profiling shape: exact distinct over a stream needs
    * O(distinct) state; the sketch caps it at ~KBs per group at any
    * cardinality). Because HLL register state is a max, the streamed
    * estimate after any batch split is BIT-IDENTICAL to the one-shot
    * batch sketch over the same rows (spec-asserted).
    */
  def ndvProfiled(events: DataFrame, lgK: Int): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        expr(s"hll_sketch_estimate(hll_sketch_agg(user_id, $lgK))")
          .as("est_users"))

  /** stream_quantile — incremental quantile statistics over an
    * unbounded stream (batch twin: score_stats_sketch): the
    * stream_profile move applied to quantiles — a streaming
    * aggregation whose state-store buffer IS the mergeable KLL
    * sketch (graft_kll_agg's TypedImperativeAggregate buffer
    * serializes into per-group state), so each micro-batch's partial
    * sketches merge into the running one with NO replay of past rows
    * and O(sketch ≈ KBs) state per group at ANY row count — exact
    * streaming percentiles would hold O(distinct) state. Estimates
    * carry the same ±~1.65 % rank-error contract as the batch sketch
    * (KLL compaction draws the published algorithm's random bits, so
    * the bound — not bit-stability — is the contract, unlike the HLL
    * twin whose register-max state is bit-identical to batch).
    */
  def quantileProfiled(events: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(events.sparkSession)
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        expr("graft_kll_agg(CAST(CAST(ROUND(value * 100) AS BIGINT) AS DOUBLE))")
          .as("sk"))
      .select(col("event_type"), col("n_rows"),
        round(expr("graft_kll_quantile(sk, 0.5D)") / 100.0, 6).as("p50_approx"),
        round(expr("graft_kll_quantile(sk, 0.95D)") / 100.0, 6).as("p95_approx"))
  }

  /** stream_vocab — running per-language heavy-hitter vocabulary over
    * an unbounded document stream (batch twin: vocab_topk_sketch): the
    * stream_quantile move applied to frequent items — a streaming
    * aggregation whose state-store buffer IS the mergeable Misra–Gries
    * sketch (graft_freq_agg's TypedImperativeAggregate buffer
    * serializes into the per-group state row), so each micro-batch's
    * partial maps merge into the running one with NO replay of past
    * tokens and constant (≤ map-size entries) state per language at
    * ANY stream length — exact running vocabulary counts would hold
    * O(distinct tokens) state, unbounded the moment the domain is
    * open. Read-out carries the batch op's contract: top-V with
    * [lb, ub] intervals plus the sketch-wide max_err; purge order is
    * an implementation detail, so the published bound — not
    * bit-stability — is the spec'd contract (the KLL convention).
    */
  def vocabProfiled(docs: DataFrame, topV: Int): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    import graft.functions.TextFns
    docs
      .select(col("lang"),
        explode(TextFns.tokens(col("text"))).as("token"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_toks"),
        expr(s"graft_freq_agg(token, ${graft.plans.FreqItems.DefaultMapSize})")
          .as("sk"))
      .select(col("lang"), col("n_toks"),
        posexplode(expr(s"graft_freq_topk(sk, $topV)")).as(Seq("pos", "r")),
        expr("graft_freq_maxerr(sk)").as("max_err"))
      .select(col("lang"), col("n_toks"),
        col("r.token").as("token"), col("r.est").as("n_occ_est"),
        col("r.lb").as("n_occ_lb"), col("r.ub").as("n_occ_ub"),
        (col("pos") + 1).cast("long").as("rank"), col("max_err"))
  }

  /** stream_cms — running per-language point-frequency counts over an
    * unbounded document stream (batch twin: vocab_cms): the
    * stream_quantile/stream_vocab/stream_novelty move applied to the
    * count-min sketch — a streaming aggregation whose state-store
    * buffer IS the mergeable CMS counter array (graft_cms_agg's
    * TypedImperativeAggregate buffer, the FOURTH serializer in the
    * state-round-trip archetype after KLL, Misra–Gries and theta), so
    * each micro-batch's partials ADD into the running counters with no
    * replay of past tokens and constant (~320 KB) state per language
    * at any stream length. CMS merge is exact counter addition — no
    * purge order, no random draws — so streamed point estimates equal
    * the batch one-shot's EXACTLY (the spec asserts equality,
    * including across a kill/resume restart), and the one-sided bound
    * (est ≥ true, overcount ≤ ε·N w.h.p.) holds at every read. The
    * probe list is the serving contract: production asks the running
    * sketch about a FIXED set of tokens (blocklist terms, benchmark
    * vocabulary, competitor brands) — the frozen-fence convention,
    * with vocab_cms as the full-corpus audit.
    */
  def cmsProfiled(docs: DataFrame, probes: Seq[String]): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    import graft.functions.TextFns
    val probeCol = array(probes.map(lit): _*)
    docs
      .select(col("lang"), explode(TextFns.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_toks"),
        expr(s"graft_cms_agg(token, ${graft.plans.CountMin.DefaultWidth})")
          .as("sk"))
      .select(col("lang"), col("n_toks"),
        explode(probeCol).as("token"), col("sk"))
      .select(col("lang"), col("n_toks"), col("token"),
        expr("graft_cms_est(sk, token)").as("n_est"),
        expr("graft_cms_total(sk)").as("n_total"))
  }

  private[streaming] case class DsirProbe(doc_id: Long, llr: Long)

  /** stream_novelty — running vocabulary-NOVELTY monitor per source
    * (batch twin: overlap_sketch's set algebra; baseline source:
    * [[graft.operators.Overlap.vocabSketches]] on the standing
    * corpus): the ingest-health question "is this stream still adding
    * vocabulary, or re-sending what the corpus already has?" answered
    * as theta set expressions between the RUNNING per-source sketch
    * and a FROZEN baseline sketch. The streaming aggregation's
    * state-store buffer IS the mergeable theta Union
    * (graft_theta_agg's TypedImperativeAggregate buffer — the THIRD
    * serializer in the KLL/Misra-Gries state-round-trip archetype), so
    * state is constant (≤ 2^lgK retained hashes) per source at any
    * stream length, and — unlike the KLL twin — theta keeps the k
    * SMALLEST hashes with no random coin, so streamed estimates equal
    * the batch one-shot's EXACTLY (spec asserts equality, not a band).
    * The baseline rides as a binary map literal (the stream_mix /
    * stream_outlier frozen-fence convention — a few KB per source,
    * bounded by the sketch size; a source absent from the baseline
    * reads as all-novel via the coalesce). Complete output mode;
    * baseline staleness under corpus growth is the frozen-model
    * contract with overlap_sketch as the re-profile.
    */
  def noveltyProfiled(docs: DataFrame,
      baseline: Seq[(String, Array[Byte])]): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    import graft.functions.TextFns
    // empty-baseline guard: map() with zero args types as
    // map<string,string>, which would feed a STRING into
    // graft_theta_inter_est (expects binary) and fail analysis — an
    // empty baseline must instead read as all-novel via the coalesce
    val baseCol =
      if (baseline.isEmpty) lit(null).cast("binary")
      else element_at(map(baseline.flatMap { case (s, b) =>
        Seq(lit(s), lit(b)) }: _*), col("source"))
    docs
      .select(col("source"),
        explode(TextFns.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_toks"),
        expr("graft_theta_agg(token)").as("sk"))
      .withColumn("base_sk", baseCol)
      .select(col("source"), col("n_toks"),
        round(expr("graft_theta_est(sk)"), 2).as("vocab_est"),
        coalesce(round(expr("graft_theta_inter_est(sk, base_sk)"), 2),
          lit(0.0)).as("known_est"))
      // the two estimates are independent theta reads, so estimate
      // noise can push known_est a hair past vocab_est — clamp instead
      // of emitting a (slightly) negative novelty count
      .withColumn("novel_est",
        round(greatest(lit(0.0), col("vocab_est") - col("known_est")), 2))
  }

  case class DsirGateOut(doc_id: Long, n_toks: Long, llr_bits: Long,
      accept: Long)

  /** stream_dsir — FROZEN-model importance gating on ingest (batch
    * twin: dsir_select; model source: sources.DsirStore). The model —
    * target/raw unigram counts, totals, the selection cut — derives
    * batch-side (counting both corpora needs a corpus; an unbounded
    * stream has none), and the stream applies it per arriving doc:
    * token rows probe the RELOADED vocab via a stream-static LEFT
    * join (unseen tokens take the smoothing floor, the LmModel
    * unseen-key rule; llr stays the exact integer bit-surprisal
    * kernel, so streamed weights equal batch weights row-for-row),
    * and the per-doc roll-up runs in a zero-state
    * flatMapGroupsWithState — a doc's token rows arrive in ONE
    * micro-batch from one explode, so the group iterator sees them
    * all and nothing needs the state store (the ingestMinhashGate
    * contract; state rows stay 0, spec-asserted). Append mode: each
    * doc leaves with its weight and accept bit the moment it arrives.
    * Cut staleness between [[graft.sources.DsirStore.refreshCut]]
    * calls is the documented sink_lm-cuts drift contract.
    *
    * `docs` must carry `source`: the gate applies the SAME curated /
    * raw split as the batch twin (Dsir.isTarget) and scores only the
    * raw pool — a curated-slice doc arriving on ingest is passed over
    * silently, exactly as `Dsir.weights` / `DsirStore.weightsFrom`
    * would never produce a row for it (row-for-row parity needs the
    * filter INSIDE the gate, not a caller convention).
    */
  def dsirGate(docs: DataFrame, vocab: DataFrame, nt: Long, nr: Long,
      v: Long, cut: Double): Dataset[DsirGateOut] = {
    import docs.sparkSession.implicits._
    val s = graft.operators.Dsir.DsirScale
    val probes = docs
      .filter(!expr(graft.operators.Dsir.isTarget))
      .select(col("doc_id"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
      .join(vocab, Seq("tok"), "left")
      .select(col("doc_id"),
        (length(bin(expr(
          s"((coalesce(ct, 0L) + 1L) * $s) DIV ${nt + v}L")))
          - length(bin(expr(
            s"((coalesce(cr, 0L) + 1L) * $s) DIV ${nr + v}L"))))
          .cast("long").as("llr"))
      .as[DsirProbe]
    probes.groupByKey(_.doc_id)
      .flatMapGroupsWithState[ZeroState, DsirGateOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, in: Iterator[DsirProbe],
            state: GroupState[ZeroState]) =>
          var n = 0L
          var sum = 0L
          in.foreach { p => n += 1; sum += p.llr }
          Iterator.single(DsirGateOut(id, n, sum,
            if (sum.toDouble >= cut) 1L else 0L))
      }
  }

  /** Shared state type for every ZERO-STATE flatMapGroupsWithState
    * gate in this file (index, minhash, phash, audio, clip, bitext,
    * perplexity, dsir): these ops need the group iterator — all of a
    * key's rows in one batch — but never persist anything, so the
    * state parameter is a type-level formality (never `update`d;
    * state-store rows stay 0, spec-asserted per gate). One named type
    * makes that contract grep-able instead of implied. */
  case class ZeroState(unused: Long)

  // ---- stream_index: incremental inverted-index maintenance ----

  case class IndexEntry(token: String, doc_id: Long, entry: String)

  case class IndexFrag(token: String, n_postings_delta: Long,
      n_docs_delta: Long, posting_frag: String)

  /** stream_index — the retrieval family's streaming twin: maintain
    * index_build's posting lists INCREMENTALLY as documents arrive.
    * Each micro-batch emits one DELTA row per touched token —
    * (n_postings_delta, n_docs_delta, posting_frag) — in append mode;
    * a reader folds fragments per token (sum the deltas, merge-sort
    * the fragments, keep the bottom [[operators.TextAnalysis
    * .PostingCap]]) and holds exactly the batch index — the same
    * changelog-fold contract stream_compact carries, with compaction
    * the q31 latest/fold pattern (spec-asserted across batch splits).
    *
    * Why the fold is EXACT: a document's tokens arrive in one batch,
    * so per-batch distinct-doc counts add disjointly; and any entry in
    * the corpus-wide bottom-cap is necessarily within its own batch's
    * bottom-cap for that token, so no fragment ever drops a globally
    * surviving entry. The cap is enforced per micro-batch by a BOUNDED
    * insertion buffer (≤ PostingCap entries per token in memory, the
    * index_build TopK move applied inside the group iterator), and the
    * operator keeps ZERO state-store rows — fragments are pure
    * functions of the batch, so there is nothing to checkpoint and no
    * state to grow with the vocabulary (spec-asserted).
    */
  def indexDeltas(docs: DataFrame): Dataset[IndexFrag] = {
    import docs.sparkSession.implicits._
    val cap = graft.operators.TextAnalysis.PostingCap
    val entries = docs.select(col("doc_id"),
        posexplode(graft.functions.TextFns.tokens(col("text")))
          .as(Seq("pos", "token")))
      .select(col("token"), col("doc_id"),
        concat_ws(":", lpad(col("doc_id").cast("string"), 8, "0"),
          lpad(col("pos").cast("string"), 6, "0")).as("entry"))
      .as[IndexEntry]
    entries.groupByKey(_.token)
      .flatMapGroupsWithState[ZeroState, IndexFrag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (token: String, in: Iterator[IndexEntry],
            state: GroupState[ZeroState]) =>
          // bottom-cap under lexicographic order (the zero-padded
          // entry makes it numeric order): bounded insertion, never
          // more than cap entries buffered even for a stopword token
          val keep = new java.util.TreeSet[String]()
          val seenDocs = new java.util.HashSet[java.lang.Long]()
          var n = 0L
          in.foreach { e =>
            n += 1
            seenDocs.add(e.doc_id)
            if (keep.size < cap) keep.add(e.entry)
            else if (e.entry < keep.last) { keep.pollLast(); keep.add(e.entry) }
          }
          // state is never updated: fragments are stateless per-batch
          // functions; the reader's fold is the materialized view
          Iterator.single(IndexFrag(token, n, seenDocs.size.toLong,
            String.join(",", keep)))
      }
  }

  // ---- stream_ingest: exact-dup gate vs the standing corpus ----

  /** stream_ingest — the deployment shape of dedup_incremental: docs
    * arrive as a stream and are flagged against the STANDING corpus's
    * content hashes via a STREAM-STATIC join (the static side is a
    * bounded-size fingerprint frame Spark re-plans per micro-batch —
    * no state store, no watermark; history itself never streams).
    * Append mode, stateless: each arriving doc leaves with its
    * is_exact_dup flag the moment it arrives, and the flags equal the
    * batch dedup_incremental's exactly (spec across batch splits).
    * In deployment `historyHashes` is the PERSISTED
    * sources.Fingerprints `content/` frame (spec-verified) — the
    * static side is a parquet scan of the skinny store, never a
    * re-derivation over history text. Near-dup banding is
    * [[ingestMinhashGate]] below on the `bands/` frame; containment
    * needs the span frame — batch backfill territory when the store
    * outgrows a replanned join side.
    */
  def ingestGate(docs: DataFrame, historyHashes: DataFrame): DataFrame =
    docs
      .withColumn("th", md5(col("text")))
      // DISTINCT: an appended store can carry the same th across shard
      // files (Fingerprints.append) — a dup would fan the left join
      // out and emit a doc twice
      .join(historyHashes.select(col("th")).distinct()
          .withColumn("is_exact_dup", lit(1L)),
        Seq("th"), "left")
      .select(col("doc_id"),
        coalesce(col("is_exact_dup"), lit(0L)).as("is_exact_dup"),
        md5(col("text")).as("content_hash"))

  // ---- stream_ingest_minhash: near-dup gate vs the persisted store ----

  private[streaming] case class BandProbe(doc_id: Long, sig_digest: String,
      band_val: Long, hit: Long)

  case class MinhashGateOut(doc_id: Long, sig_digest: String,
      n_hist_bands: Long, near_hist: Long)

  /** stream_ingest_minhash — the NEAR-dup half of the ingest firewall
    * as an actual stream (batch twin: dedup_incr_minhash): each
    * arriving doc's 8 LSH band values probe the PERSISTED band store
    * (sources.Fingerprints `bands/`) via a stream-static left join —
    * an (edited) copy of any historical doc collides on ≥ 1 band
    * w.h.p. The per-doc roll-up (distinct matched bands) runs inside a
    * zero-state flatMapGroupsWithState — a doc's 8 band rows arrive in
    * ONE micro-batch, so the group iterator sees them all and nothing
    * needs the state store (the stream_index contract; state rows stay
    * 0, spec-asserted). Append mode, stateless: each doc leaves with
    * its n_hist_bands the moment it arrives, equal to the batch
    * dedup_incr_minhash's against the same store (spec across uneven
    * batch splits with a planted edited copy). The static side is the
    * RELOADED store parquet — at no point does ingest re-run the
    * minhash kernel over history.
    */
  def ingestMinhashGate(docs: DataFrame, bandStore: DataFrame):
      Dataset[MinhashGateOut] = {
    import docs.sparkSession.implicits._
    val probes = graft.operators.Dedup.minhashSigs(docs)
      .select(col("doc_id"), col("sig_digest"),
        explode(col("bands")).as("band_val"))
      .join(bandStore.select(col("band_val")).distinct()
          .withColumn("hit", lit(1L)),
        Seq("band_val"), "left")
      .select(col("doc_id"), col("sig_digest"), col("band_val"),
        coalesce(col("hit"), lit(0L)).as("hit"))
      .as[BandProbe]
    probes.groupByKey(_.doc_id)
      .flatMapGroupsWithState[ZeroState, MinhashGateOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, in: Iterator[BandProbe],
            state: GroupState[ZeroState]) =>
          // distinct matched band values — mirrors the batch
          // countDistinct; 8 entries max, bounded by construction
          val matched = new java.util.HashSet[java.lang.Long]()
          var digest = ""
          in.foreach { p =>
            digest = p.sig_digest
            if (p.hit == 1L) matched.add(p.band_val)
          }
          val n = matched.size.toLong
          Iterator.single(MinhashGateOut(id, digest, n,
            if (n >= 1L) 1L else 0L))
      }
  }

  /** stream_frames — frame-sampling on ingest (batch twin: mm_frames):
    * arriving video-shaped rows (clip = array of opaque frame
    * payloads) are stride-sampled and only the SURVIVING frames reach
    * the pixel kernel — the decode-after-sample ordering is what
    * bounds ingest cost to |frames|/stride of the wire volume, and
    * every step (generate, index predicate, hash projection) is a
    * per-row expression: append mode, no state store, no watermark,
    * hashes equal the batch operator's row-for-row (spec). The
    * sampled hashes land in the same dHash space the phash band gate
    * probes, so a frame-level ingest firewall composes downstream.
    */
  def framesSampled(clips: DataFrame,
      stride: Int = graft.operators.Multimodal.FrameStride): DataFrame =
    graft.operators.Multimodal.sampleFrames(clips, stride)

  /** stream_scenes — shot-cut detection on arriving clips (batch twin:
    * mm_scenes): a clip's frames live in ONE array cell, so the whole
    * detector is per-row HOFs with zero cross-row dependence — the
    * stream side IS the batch function, stateless, append mode, no
    * watermark (the framesSampled convention; spec pins row-for-row
    * equality across a mid-stream split and zero state rows). At
    * ingest this is the per-shot index a video pipeline cuts BEFORE
    * sampling or deduping, so the step composes with stream_frames
    * and the phash gate downstream.
    */
  def sceneCut(clips: DataFrame): DataFrame =
    graft.operators.Multimodal.sceneCuts(clips)

  // ---- stream_ingest_phash: perceptual near-dup gate (multimodal) ----

  private[streaming] case class PhashProbeRow(doc_id: Long, phash: Long,
      band_id: Long, hit: Long)

  case class PhashGateOut(doc_id: Long, phash: Long,
      n_hist_bands: Long, near_hist: Long)

  /** stream_ingest_phash — the ingest firewall extended to the
    * MULTIMODAL tier (batch core: operators.Multimodal.phashProbe):
    * each arriving image payload is pixel-decoded to its 64-bit dHash
    * by the graft_dhash kernel (narrow, per-row), its 4 hamming-band
    * keys probe the PERSISTED phash band store stream-static, and the
    * per-doc roll-up runs in the same zero-state
    * flatMapGroupsWithState shape as ingestMinhashGate. A re-encoded
    * or slightly-edited copy of any historical image flags on arrival
    * (a one-pixel edit moves ≤ 2 hash bits → ≥ 2 bands intact);
    * non-PNG payloads pass through untested (no phash row). History
    * pixels are decoded ONCE at store build — never per micro-batch.
    */
  def ingestPhashGate(docs: DataFrame, bandStore: DataFrame):
      Dataset[PhashGateOut] = {
    import docs.sparkSession.implicits._
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val hashed = docs
      .withColumn("phash", expr("graft_dhash(payload)"))
      .filter(col("phash").isNotNull)
    val probes = graft.operators.Multimodal.phashBandRows(hashed)
      .join(bandStore.select(col("band_id"), col("band_key")).distinct()
          .withColumn("hit", lit(1L)),
        Seq("band_id", "band_key"), "left")
      .select(col("doc_id"), col("phash"), col("band_id"),
        coalesce(col("hit"), lit(0L)).as("hit"))
      .as[PhashProbeRow]
    probes.groupByKey(_.doc_id)
      .flatMapGroupsWithState[ZeroState, PhashGateOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, in: Iterator[PhashProbeRow],
            state: GroupState[ZeroState]) =>
          val matched = new java.util.HashSet[java.lang.Long]()
          var ph = 0L
          in.foreach { p =>
            ph = p.phash
            if (p.hit == 1L) matched.add(p.band_id)
          }
          val n = matched.size.toLong
          Iterator.single(PhashGateOut(id, ph, n, if (n >= 1L) 1L else 0L))
      }
  }

  // ---- stream_ingest_audio: the firewall's audio tier ----

  case class AudioGateOut(doc_id: Long, ahash: Long,
    n_audio_bands: Long, audio_hist: Long)

  /** stream_ingest_audio (r13) — the ingest firewall's AUDIO tier
    * (batch core: graft_ahash + Multimodal.phashProbe over
    * `ahash_bands/`, wired into Ingest.gateAndRemember): each
    * arriving WAV payload's PCM samples decode to the 64-bit
    * energy-envelope hash (plans.AudioHash — narrow, per-row, no
    * codec), its 4 hamming-band keys probe the persisted
    * `ahash_bands/` store stream-static, and the per-doc roll-up runs
    * in the same zero-state flatMapGroupsWithState shape as
    * [[ingestPhashGate]]. A re-containered or re-GAINED copy of any
    * historical audio flags on arrival (the envelope hash is
    * gain-invariant); non-audio payloads pass through untested.
    * History samples are decoded ONCE at store build — never per
    * micro-batch.
    */
  def ingestAudioGate(docs: DataFrame, bandStore: DataFrame):
      Dataset[AudioGateOut] = {
    import docs.sparkSession.implicits._
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val hashed = docs
      .withColumn("phash", expr("graft_ahash(payload)"))
      .filter(col("phash").isNotNull)
    val probes = graft.operators.Multimodal.phashBandRows(hashed)
      .join(bandStore.select(col("band_id"), col("band_key")).distinct()
          .withColumn("hit", lit(1L)),
        Seq("band_id", "band_key"), "left")
      .select(col("doc_id"), col("phash"), col("band_id"),
        coalesce(col("hit"), lit(0L)).as("hit"))
      .as[PhashProbeRow]
    probes.groupByKey(_.doc_id)
      .flatMapGroupsWithState[ZeroState, AudioGateOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, in: Iterator[PhashProbeRow],
            state: GroupState[ZeroState]) =>
          val matched = new java.util.HashSet[java.lang.Long]()
          var ah = 0L
          in.foreach { p =>
            ah = p.phash
            if (p.hit == 1L) matched.add(p.band_id)
          }
          val n = matched.size.toLong
          Iterator.single(AudioGateOut(id, ah, n, if (n >= 1L) 1L else 0L))
      }
  }

  // ---- stream_ingest_clip: the firewall lifted to video-shaped rows ----

  private[streaming] case class ClipProbeRow(doc_id: Long, slot: Long,
    hit: Long)

  case class ClipGateOut(doc_id: Long, n_clip_bands: Long, clip_hist: Long)

  /** stream_ingest_clip — the clip tier of the ingest firewall (batch
    * core: operators.Multimodal.clipProbe, wired into
    * Ingest.gateAndRemember): arriving video-shaped rows
    * stride-sample BEFORE decode ([[framesSampled]] — the per-clip
    * pixel cost stays |frames|/stride), each SAMPLED frame's 4
    * hamming bands probe the persisted `phash_bands/` store
    * stream-static, and the per-clip roll-up (distinct
    * (frame_idx, band) collisions, flag at ≥ 1) runs in the same
    * zero-state flatMapGroupsWithState shape as [[ingestPhashGate]]
    * — every derived row of one clip lands in the same micro-batch
    * as the clip itself, so no watermark and no state rows. A clip sharing ≥ 1 sampled
    * frame (exact or one-pixel-edited) with any accepted historical
    * clip or image — one shared dHash band space — flags on arrival;
    * clips whose sampled frames are all undecodable emit no row
    * (pass through untested), matching the batch gate's left-join 0.
    */
  def ingestClipGate(clips: DataFrame, bandStore: DataFrame):
      Dataset[ClipGateOut] = {
    import clips.sparkSession.implicits._
    val sampled = framesSampled(clips).filter(col("frame_hash").isNotNull)
    val probes = graft.operators.Multimodal.phashBandRows(
        sampled.select(col("doc_id"), col("frame_idx"),
          col("frame_hash").as("phash")))
      .join(bandStore.select(col("band_id"), col("band_key")).distinct()
          .withColumn("hit", lit(1L)),
        Seq("band_id", "band_key"), "left")
      // slot = the (frame_idx, band_id) pair packed to one key: the
      // batch probe's countDistinct(frame_idx, band_id), streamable
      .select(col("doc_id"),
        (col("frame_idx") * 4L + col("band_id")).as("slot"),
        coalesce(col("hit"), lit(0L)).as("hit"))
      .as[ClipProbeRow]
    probes.groupByKey(_.doc_id)
      .flatMapGroupsWithState[ZeroState, ClipGateOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, in: Iterator[ClipProbeRow],
            state: GroupState[ZeroState]) =>
          val matched = new java.util.HashSet[java.lang.Long]()
          in.foreach(p => if (p.hit == 1L) matched.add(p.slot))
          val n = matched.size.toLong
          Iterator.single(ClipGateOut(id, n, if (n >= 1L) 1L else 0L))
      }
  }

  // ---- stream_bitext: online mining vs the persisted target index ----

  private[streaming] case class BitextProbe(s_id: Long,
    t_id: Option[Long], cos: Option[Double], t_avg: Option[Double])

  case class BitextOut(s_id: Long, t_id: Long, cos: Double,
    margin: Double, accepted: Long)

  /** stream_bitext — the serving shape of mine_bitext: source
    * sentences arrive as a stream and mine against the PERSISTED
    * target index (sources.BitextIndex): band rows generate NARROW per
    * arriving vector, probe the store's `bands/` stream-static, score
    * against `vecs/`, and take the hub-correction denominator from the
    * BUILD-time `stats/` pools — the standing target corpus is never
    * re-banded, re-scored or re-pooled per batch. The forward pool
    * (mean of the source's own top-k) is complete the moment the
    * source arrives — its candidate set is a pure function of its own
    * bands × the store — so stream == batch EXACTLY across any batch
    * split when the stats come from the same corpus (spec); a target
    * whose true pool drifts as new sources accumulate keeps its
    * build-time denominator — the documented staleness, rebuild is
    * the trigger (ann_upsert contract). LEFT joins keep sources with
    * zero collisions flowing to the roll-up, which emits the batch
    * op's (-1, margin 0) no-candidate row. Zero state rows: per-doc
    * roll-up only (the stream_index contract); per-group buffering is
    * one source's candidate list (bucket volume, bounded by the
    * adaptive bit count — the hub risk lives on the target side,
    * which is exactly what the persisted pools price in).
    */
  def bitextGate(src: DataFrame, bands: DataFrame, vecs: DataFrame,
      stats: DataFrame, bits: Int): Dataset[BitextOut] = {
    import src.sparkSession.implicits._
    graft.plans.GraftFunctions.register(src.sparkSession)
    val S = graft.operators.Similarity
    val sb = src
      .withColumn("keys", expr(
        s"graft_lsh_keys(embedding, ${S.EmbBands}, ${S.EmbMaxBits}, $bits)"))
      .select(col("vec_id").as("s_id"), col("embedding").as("q_emb"),
        posexplode(col("keys")).as(Seq("j", "band_key")))
    val probes = sb
      .join(bands.select(col("j"), col("band_key"), col("t_id")).distinct(),
        Seq("j", "band_key"), "left")
      .join(vecs.select(col("t_id"), col("embedding").as("c_emb")),
        Seq("t_id"), "left")
      .join(stats, Seq("t_id"), "left")
      .select(col("s_id"), col("t_id"),
        round(expr("graft_cosine(q_emb, c_emb)"), 6).as("cos"),
        col("t_avg"))
      .as[BitextProbe]
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // plain locals: the executor closure must not drag the Similarity
    // module (not serializable) along
    val mineK = S.MineK
    val threshold = S.MineThreshold
    probes.groupByKey(_.s_id)
      .flatMapGroupsWithState[ZeroState, BitextOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, in: Iterator[BitextProbe],
            state: GroupState[ZeroState]) =>
          // dedupe band collisions by t_id (the batch .distinct())
          val seen = new java.util.HashSet[java.lang.Long]()
          val cands = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Double, Double)]
          // candidates need BOTH a store hit and a scorable cosine —
          // graft_cosine nulls on dimension mismatch (corrupt arriving
          // vector / vecs-bands drift); tolerate like the batch path
          // instead of killing the query on Option.get
          in.foreach { p =>
            for (t <- p.t_id; c <- p.cos)
              if (seen.add(t)) cands += ((t, c, p.t_avg.getOrElse(0.0)))
          }
          if (cands.isEmpty) Iterator.single(BitextOut(id, -1L, -1.0, 0.0, 0L))
          else {
            val sorted = cands.sortBy { case (t, c, _) => (-c, t) }
            val top = sorted.take(mineK)
            val sAvg = top.map(_._2).sum / top.size
            val best = cands.iterator.map { case (t, c, tAvg) =>
              val m = if (sAvg + tAvg > 0) round6(c * 2.0 / (sAvg + tAvg))
                else 0.0
              (t, c, m)
            }.minBy { case (t, _, m) => (-m, t) }
            Iterator.single(BitextOut(id, best._1, best._2, best._3,
              if (best._3 > threshold) 1L else 0L))
          }
      }
  }

  // ---- stream_upsert: streaming index maintenance sink ----

  /** stream_upsert — ann_upsert as a streaming sink: arriving vectors
    * are encoded with the bundle's FROZEN model (persisted centroids,
    * PQ codebook, int8 scale — sources.AnnIndex.upsertFrame) and
    * appended as new `upserts/` shards, one foreachBatch call per
    * micro-batch. Because the encode is a per-vector deterministic
    * function of the frozen model, the result is BATCH-INDEPENDENT:
    * streaming the deltas in any split yields byte-identical servable
    * codes to a single batch upsert (spec), and serving from the
    * grown bundle equals a full rebuild on the union corpus (the
    * ann_upsert equality, inherited). History is never re-read or
    * re-encoded per batch; model drift remains the explicit offline
    * rebuild trigger. Caller `.start()`s the returned writer and owns
    * the checkpoint dir; exactly-once across restarts holds because
    * each batch writes to its OWN `upserts/bid=<batchId>/` dir with
    * overwrite semantics (AnnIndex.upsertBatch) — a replayed
    * micro-batch rewrites its directory instead of appending
    * duplicates.
    */
  def upsertSink(newVecs: DataFrame, path: String, nShards: Int = 1):
      org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    newVecs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.sources.AnnIndex.upsertBatch(batch, path, batchId, nShards)
    }

  // ---- stream_ingest tick: the full firewall loop as a sink ----

  /** The COMPLETE ingest firewall (gate → durable decision → remember)
    * as a streaming sink — one [[graft.sources.Ingest.tick]] per
    * micro-batch. Caller `.start()`s the returned writer and owns the
    * checkpoint dir. Restart contract (the fourth state archetype,
    * VERDICT r13 #5): decisions are exactly-once (each batch's
    * decision frame lands in its own `bid=` dir before the store
    * mutates, and a replayed batch reloads it instead of re-gating —
    * re-gating would see its own pre-crash fingerprints and flip its
    * accepts to rejects); fingerprint appends are at-least-once with
    * duplicate files absorbed by the consumers'-DISTINCT contract and
    * folded by compact(). Spec: StreamingSpec "ingest tick restart".
    */
  def ingestTickSink(docs: DataFrame, storePath: String,
      decisionsPath: String, nShards: Int = 1):
      org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.sources.Ingest.tick(batch, storePath, decisionsPath,
            batchId, nShards)
          ()
        }
    }

  // ---- stream_graph: incremental navigation-edge maintenance ----

  private[streaming] case class EdgeEvent(user_id: Long, event_id: Long,
    it: Int)

  case class LastItem(it: Int)

  case class EdgeDelta(src: Int, dst: Int, w_delta: Long)

  /** stream_graph — incremental maintenance of graph_pagerank's input
    * (batch twin: Graph.transitionEdges): events arrive as a stream
    * and each micro-batch emits one DELTA row per touched (src, dst)
    * transition edge. Unlike the per-doc gates, a user's session SPANS
    * batches, so this is the stream_pack state discipline, not the
    * zero-state one: exactly ONE item of state per user (their last
    * seen item) bridges consecutive batches — state is O(users),
    * independent of event volume. Within a batch a user's events sort
    * by event_id (the engine-portable order the batch op windows by);
    * ACROSS batches the contract is in-order arrival per user (the
    * log-shipping assumption — lateness belongs to the watermarked
    * ops). The reader folds w_delta by plain sums and holds EXACTLY
    * the batch edge list (spec across splits that cut sessions
    * mid-stride); PageRank then runs batch-side on the folded edges —
    * rank itself is a global fixpoint, not a per-row gate.
    */
  def transitionDeltas(events: DataFrame): Dataset[EdgeDelta] = {
    import events.sparkSession.implicits._
    val ev = events.select(col("user_id"), col("event_id"),
      expr("TRY_CAST(get_json_object(props, '$.k') AS INT)").as("it"))
      // a malformed props (no numeric $.k) casts to null, which cannot
      // encode into the primitive Int field — drop it BEFORE the chain,
      // the rule the batch twin (Graph.transitionEdges) shares: both
      // sides bridge transitions over a malformed event, so the folded
      // deltas == batch edges equality survives dirty input
      .filter(col("it").isNotNull)
      .as[EdgeEvent]
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastItem, EdgeDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (u: Long, in: Iterator[EdgeEvent], state: GroupState[LastItem]) =>
          val evs = in.toArray.sortBy(_.event_id)
          if (evs.isEmpty) Iterator.empty
          else {
            val items = state.getOption.map(_.it).toSeq ++ evs.map(_.it)
            state.update(LastItem(evs.last.it))
            items.zip(items.tail).groupBy(identity).iterator
              .map { case ((s, d), g) => EdgeDelta(s, d, g.size.toLong) }
          }
      }
  }

  // ---- stream_funnel: per-user funnel state machine ----

  private[streaming] case class TypedEvent(user_id: Long, event_id: Long,
    event_type: String)

  case class FunnelState(vId: Long, cId: Long, pId: Long, emitted: Boolean)

  case class FunnelOut(user_id: Long, v_id: Long, c_id: Long, p_id: Long,
    stage: Long)

  /** stream_funnel — the conversion funnel as a LIVE per-user state
    * machine (batch twin: Analytics.funnel): state is the funnel
    * progress so far — three step ids, O(1) per user regardless of
    * event volume (the stream_graph state discipline: a user's
    * journey SPANS batches; zero-state gates cannot express "click
    * after the first view" across a batch boundary). Each batch sorts
    * a user's arrivals by event_id (in-order arrival per user across
    * batches is the log-shipping contract, as stream_graph) and steps
    * the machine: first view → first later click → first later
    * purchase; a row is emitted ONLY when the user is first seen or
    * their stage advances — the funnel changelog — so the reader's
    * fold (last row per user, stage is monotone) holds exactly the
    * batch operator's per-user row (spec across splits that cut
    * journeys mid-step).
    */
  def funnelProgress(events: DataFrame): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val ev = events.select(col("user_id"), col("event_id"),
      col("event_type")).as[TypedEvent]
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (u: Long, in: Iterator[TypedEvent], state: GroupState[FunnelState]) =>
          val evs = in.toArray.sortBy(_.event_id)
          if (evs.isEmpty) Iterator.empty
          else {
            val st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L,
              emitted = false))
            var (v, c, p) = (st.vId, st.cId, st.pId)
            evs.foreach { e =>
              if (e.event_type == "view" && v < 0) v = e.event_id
              else if (e.event_type == "click" && c < 0 && v >= 0 &&
                e.event_id > v) c = e.event_id
              else if (e.event_type == "purchase" && p < 0 && c >= 0 &&
                e.event_id > c) p = e.event_id
            }
            val advanced = v != st.vId || c != st.cId || p != st.pId
            state.update(FunnelState(v, c, p, emitted = true))
            if (advanced || !st.emitted) {
              val stage = if (p >= 0) 3L else if (c >= 0) 2L
                else if (v >= 0) 1L else 0L
              Iterator.single(FunnelOut(u, v, c, p, stage))
            } else Iterator.empty
          }
      }
  }

  // ---- stream_scd2: live change-history changelog ----

  case class Scd2State(last: String)

  case class Scd2Change(user_id: Long, state: String, valid_from: Long)

  /** stream_scd2 — SCD2 history maintained LIVE (batch twin:
    * Analytics.scd2): one string of state per user (their last
    * emitted state) bridges batches; an arriving event emits a change
    * row (user, state, valid_from) iff its type differs from the last
    * state — the open-ended half of the batch op's row. valid_to is
    * unknowable at emission time on an unbounded stream BY
    * CONSTRUCTION (the next change hasn't happened), so the stream
    * emits the CHANGELOG and the reader folds intervals with lead()
    * over the collected change rows — the stream_index /
    * stream_compact changelog-fold contract; the folded view equals
    * the batch operator exactly (spec across splits that cut a
    * user's run of equal states mid-stride, where the state store is
    * precisely what stops a spurious change row at the boundary).
    */
  def scd2Changes(events: DataFrame): Dataset[Scd2Change] = {
    import events.sparkSession.implicits._
    val ev = events.select(col("user_id"), col("event_id"),
      col("event_type")).as[TypedEvent]
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Change](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (u: Long, in: Iterator[TypedEvent], state: GroupState[Scd2State]) =>
          val evs = in.toArray.sortBy(_.event_id)
          if (evs.isEmpty) Iterator.empty
          else {
            var last = state.getOption.map(_.last).orNull
            val out = Vector.newBuilder[Scd2Change]
            evs.foreach { e =>
              if (last == null || last != e.event_type) {
                out += Scd2Change(u, e.event_type, e.event_id)
                last = e.event_type
              }
            }
            state.update(Scd2State(last))
            out.result().iterator
          }
      }
  }

  // ---- stream_dpo: preference pairs maintained live ----

  private[streaming] case class ScoredCand(prompt_id: Long, doc_id: Long,
    score: Long)

  case class DpoState(cDoc: Long, cScore: Long, rDoc: Long, rScore: Long,
    rev: Long)

  case class DpoPair(prompt_id: Long, chosen_doc: Long, rejected_doc: Long,
    chosen_score: Long, rejected_score: Long, margin: Long, rev: Long)

  /** stream_dpo — preference-pair construction maintained LIVE (batch
    * twin: PostTrain.dpoPairs): per-prompt state is the running
    * argmax/argmin candidate — four longs plus a revision counter,
    * CONSTANT per prompt at any stream length (the stream never holds
    * the candidate set, only the current extremes). An arriving
    * candidate displaces chosen on (score DESC, doc_id ASC) and
    * rejected on (score ASC, doc_id DESC) — the batch op's exact
    * opposite-direction tie-breaks, so the running extremes equal the
    * batch window ranks REGARDLESS of arrival order (max/min over a
    * set is order-free; the tie rules make the argmax unique). Each
    * batch that changes a prompt's pair emits the CURRENT pair as an
    * append-mode changelog row with a bumped rev; the reader folds by
    * max-rev per prompt and drops margin-0 rows (degenerate groups) —
    * the stream_scd2 changelog-fold contract. Folded view == batch
    * dpoPairs exactly (spec across splits cutting a prompt's
    * candidates mid-group).
    */
  def dpoPairsStream(cands: DataFrame): Dataset[DpoPair] = {
    import cands.sparkSession.implicits._
    cands.select(col("prompt_id"), col("doc_id"), col("score"))
      .as[ScoredCand]
      .groupByKey(_.prompt_id)
      .flatMapGroupsWithState[DpoState, DpoPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (p: Long, in: Iterator[ScoredCand], state: GroupState[DpoState]) =>
          val cs = in.toArray
          if (cs.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse {
              val h = cs.head
              DpoState(h.doc_id, h.score, h.doc_id, h.score, 0L)
            }
            val before = (st.cDoc, st.cScore, st.rDoc, st.rScore)
            cs.foreach { c =>
              if (c.score > st.cScore ||
                  (c.score == st.cScore && c.doc_id < st.cDoc))
                st = st.copy(cDoc = c.doc_id, cScore = c.score)
              if (c.score < st.rScore ||
                  (c.score == st.rScore && c.doc_id > st.rDoc))
                st = st.copy(rDoc = c.doc_id, rScore = c.score)
            }
            val changed = state.getOption.isEmpty ||
              (st.cDoc, st.cScore, st.rDoc, st.rScore) != before
            if (changed) {
              st = st.copy(rev = st.rev + 1)
              state.update(st)
              Iterator.single(DpoPair(p, st.cDoc, st.rDoc, st.cScore,
                st.rScore, st.cScore - st.rScore, st.rev))
            } else {
              state.update(st)
              Iterator.empty
            }
          }
      }
  }

  // ---- stream_sft: conversation assembly maintained live ----

  private[streaming] case class TurnIn(conv_id: Long, turn_idx: Long,
    role: String, text: String)

  case class SftState(roles: Seq[String], texts: Seq[String],
    idxs: Seq[Long])

  case class SftTurnOut(conv_id: Long, turn_idx: Long, role: String,
    start_char: Long, end_char: Long, in_loss: Long, conv_digest: String,
    conv_len: Long)

  /** stream_sft — SFT chat-template assembly maintained LIVE (batch
    * twin: PostTrain.sftRender): per-conversation state is the turns
    * received so far, BOUNDED at TurnsPerConv by construction (a
    * conversation is complete at exactly that many turns — the cap is
    * the data model, not a tuning knob), and CLEARED on emission, so
    * standing state is only the in-flight incomplete conversations. A
    * conversation emits its per-turn offset rows (content spans,
    * assistant-only loss mask, md5 digest of the full render) the
    * moment its last turn arrives — whatever batches the turns were
    * split across; the render is a pure function of the turn set, so
    * streamed rows == batch sftRender rows exactly (spec cuts
    * conversations mid-turn across three splits). Incomplete
    * conversations never emit — on an unbounded stream "the rest of
    * the conversation hasn't happened yet" (the stream_scd2 valid_to
    * argument); a deployment would bolt a timeout onto the same state.
    */
  def sftRenderStream(turnsIn: DataFrame): Dataset[SftTurnOut] = {
    import turnsIn.sparkSession.implicits._
    turnsIn.select(col("conv_id"), col("turn_idx"), col("role"),
      col("text")).as[TurnIn]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[SftState, SftTurnOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (conv: Long, in: Iterator[TurnIn], state: GroupState[SftState]) =>
          val st = state.getOption.getOrElse(SftState(Nil, Nil, Nil))
          var roles = st.roles; var texts = st.texts; var idxs = st.idxs
          in.foreach { t =>
            if (!idxs.contains(t.turn_idx)) { // idempotent re-delivery
              roles :+= t.role; texts :+= t.text; idxs :+= t.turn_idx
            }
          }
          if (idxs.size < graft.operators.PostTrain.TurnsPerConv) {
            state.update(SftState(roles, texts, idxs))
            Iterator.empty
          } else {
            state.remove() // complete: emit and clear
            val order = idxs.zipWithIndex.sortBy(_._1).map(_._2)
            val pieces = order.map(i => s"<|${roles(i)}|>${texts(i)}<|end|>")
            val rendered = pieces.mkString
            val digest = java.security.MessageDigest.getInstance("MD5")
              .digest(rendered.getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            val out = Vector.newBuilder[SftTurnOut]
            var off = 0L
            order.zipWithIndex.foreach { case (i, k) =>
              val header = roles(i).length + 4L
              val start = off + header
              out += SftTurnOut(conv, idxs(i), roles(i), start,
                start + texts(i).length,
                if (roles(i) == "assistant") 1L else 0L, digest,
                rendered.length.toLong)
              off += pieces(k).length
            }
            out.result().iterator
          }
      }
  }

  // ---- stream_grpo: group advantages emitted on group completion ----

  private[streaming] case class RolloutIn(prompt_id: Long, doc_id: Long,
    score: Long)

  case class GrpoState(docs: Seq[Long], scores: Seq[Long])

  case class GrpoAdvOut(prompt_id: Long, doc_id: Long, score: Long,
    n_group: Long, adv_ppm: Long, adv_rloo_ppm: Long)

  /** stream_grpo — group-relative advantages maintained LIVE (batch
    * twin: RlEval.grpoAdv): an advantage is a function of the WHOLE
    * rollout group (the group mean is the baseline), so the stream
    * holds the rollouts received so far per prompt — BOUNDED at
    * CandidatesPerPrompt by the data model (a GRPO group is complete
    * at exactly that many rollouts; the cap is the sampler's n, not a
    * tuning knob) and CLEARED on emission, the stream_sft
    * complete-and-clear archetype: standing state is only the
    * in-flight incomplete groups. The moment a group's last rollout
    * arrives, every member's (adv_ppm, adv_rloo_ppm) row emits in the
    * batch op's exact integer arithmetic (JVM Long division truncates
    * toward zero, as Spark DIV and the DuckDB oracle do), whatever
    * batches the rollouts were split across — streamed rows == batch
    * rows exactly (spec cuts groups mid-rollout across three splits).
    * Re-delivered rollouts are idempotent (doc_id-keyed).
    */
  def grpoAdvStream(rollouts: DataFrame): Dataset[GrpoAdvOut] = {
    import rollouts.sparkSession.implicits._
    val full = graft.operators.RlEval.CandidatesPerPrompt
    rollouts.select(col("prompt_id"), col("doc_id"), col("score"))
      .as[RolloutIn]
      .groupByKey(_.prompt_id)
      .flatMapGroupsWithState[GrpoState, GrpoAdvOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (p: Long, in: Iterator[RolloutIn], state: GroupState[GrpoState]) =>
          val st = state.getOption.getOrElse(GrpoState(Nil, Nil))
          var docs = st.docs; var scores = st.scores
          in.foreach { r =>
            if (!docs.contains(r.doc_id)) { // idempotent re-delivery
              docs :+= r.doc_id; scores :+= r.score
            }
          }
          if (docs.size < full) {
            state.update(GrpoState(docs, scores))
            Iterator.empty
          } else {
            state.remove() // complete: emit and clear
            val n = docs.size.toLong
            val s = scores.sum
            docs.indices.iterator.map { i =>
              val r = scores(i)
              GrpoAdvOut(p, docs(i), r, n,
                ((n * r - s) * 1000000L) / n,
                ((r * (n - 1) - (s - r)) * 1000000L) / (n - 1))
            }
          }
      }
  }

  // ---- stream_passk: pass@k maintained live ----

  private[streaming] case class VerdictIn(task_id: Long, correct: Long)

  case class PasskState(n: Long, c: Long, rev: Long)

  case class PasskOut(task_id: Long, n_samples: Long, n_correct: Long,
    pass1_ppm: Long, passk_ppm: Long, rev: Long)

  /** stream_passk — the unbiased pass@k estimator maintained LIVE
    * (batch twin: RlEval.evalPassk): per-task state is the (samples,
    * passes) counter pair plus a revision — CONSTANT per task at any
    * stream length (the stream never holds the verdicts, only their
    * sufficient statistic; pass@k is a function of (n, c) alone, the
    * stream_dpo running-extremes argument applied to counters). Each
    * batch that grows a task's counters emits the CURRENT estimate as
    * an append-mode changelog row with a bumped rev once n ≥ k (the
    * estimator is undefined below k — those updates advance state
    * silently); the reader folds by max rev per task — the
    * stream_scd2 changelog-fold contract. Folded view == batch
    * evalPassk exactly on the same verdict set (spec across splits
    * cutting every task's samples mid-group). Counters are NOT
    * idempotent under re-delivery — exactly-once input is Structured
    * Streaming's own contract within a query.
    */
  def evalPasskStream(verdicts: DataFrame): Dataset[PasskOut] = {
    import verdicts.sparkSession.implicits._
    val k = graft.operators.RlEval.PassK
    verdicts.select(col("task_id"), col("correct")).as[VerdictIn]
      .groupByKey(_.task_id)
      .flatMapGroupsWithState[PasskState, PasskOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (t: Long, in: Iterator[VerdictIn], state: GroupState[PasskState]) =>
          val st = state.getOption.getOrElse(PasskState(0L, 0L, 0L))
          var n = st.n; var c = st.c
          in.foreach { v => n += 1; c += v.correct }
          if (n == st.n) Iterator.empty
          else {
            val rev = st.rev + 1
            state.update(PasskState(n, c, rev))
            if (n < k) Iterator.empty
            else {
              val miss = math.max(n - c, 0L) * math.max(n - c - 1, 0L)
              Iterator.single(PasskOut(t, n, c,
                (c * 1000000L) / n,
                1000000L - (miss * 1000000L) / (n * (n - 1)), rev))
            }
          }
      }
  }

  // ---- stream_contract: the expectations gate maintained live ----

  private[streaming] case class ContractIn(rule: String, violated: Long,
    doc_id: Long)

  case class ContractState(n: Long, v: Long, firstBad: Long, rev: Long)

  case class ContractOut(rule: String, n_checked: Long,
    n_violations: Long, violation_ppm: Long, first_bad_doc: Long,
    rev: Long)

  /** stream_contract — the data-contract gate maintained LIVE (batch
    * twin: DataOps.dataContract): per-rule state is (checked,
    * violations, lowest offending doc_id) plus a revision — CONSTANT
    * at any stream length, and the key space is the RULE SET (six
    * rows of state total, the smallest state surface in the engine):
    * counters are order-free sums and the first offender is a running
    * min, so the fold equals the batch gate under any batch cut. Each
    * batch that touches a rule's counters emits the current verdict
    * as an append-mode changelog row with a bumped rev; the reader
    * folds max-rev per rule (the stream_scd2 contract). This is the
    * live-ingest monitoring shape: the gate's verdict is always
    * current while documents stream in, instead of a scan-the-corpus
    * batch job. Input rows are pre-melted (rule, violated, doc_id)
    * verdicts — the narrow per-doc projection the batch op folds.
    */
  def contractStream(verdicts: DataFrame): Dataset[ContractOut] = {
    import verdicts.sparkSession.implicits._
    verdicts.select(col("rule"), col("violated"), col("doc_id"))
      .as[ContractIn]
      .groupByKey(_.rule)
      .flatMapGroupsWithState[ContractState, ContractOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (rule: String, in: Iterator[ContractIn],
            state: GroupState[ContractState]) =>
          val st = state.getOption.getOrElse(
            ContractState(0L, 0L, -1L, 0L))
          var n = st.n; var v = st.v; var fb = st.firstBad
          in.foreach { r =>
            n += 1
            if (r.violated != 0L) {
              v += 1
              fb = if (fb < 0L) r.doc_id else math.min(fb, r.doc_id)
            }
          }
          if (n == st.n) Iterator.empty
          else {
            val rev = st.rev + 1
            state.update(ContractState(n, v, fb, rev))
            Iterator.single(ContractOut(rule, n, v,
              (v * 1000000L) / n, fb, rev))
          }
      }
  }

  // ---- stream_manifest: shard integrity maintained live ----

  private[streaming] case class ShardRowIn(shard_id: Long, doc_id: Long,
    n_chars: Long, h40: Long)

  case class ManifestState(n: Long, chars: Long, minDoc: Long,
    maxDoc: Long, minH: Long, maxH: Long, fold: Long, rev: Long)

  case class ManifestOut(shard_id: Long, n_docs: Long, sum_chars: Long,
    min_doc: Long, max_doc: Long, min_h40: Long, max_h40: Long,
    digest_fold: Long, rev: Long)

  /** stream_manifest — the shard integrity manifest maintained LIVE
    * (batch twin: DataOps.shardManifest): per-shard state is the
    * eight manifest facts plus a revision — CONSTANT per shard at any
    * stream length, key space = the Shards assignment (16 state
    * rows); every fact is an order-free fold (sums, mins, maxes), so
    * the max-rev changelog equals the batch manifest under any batch
    * cut. This is what a streaming INGEST writer publishes alongside
    * its shards: the manifest is always current, a reader validates a
    * shard set against the latest revision without any content
    * re-read. Input = the shared DataOps.shardRows projection, so
    * stream and batch see the same assignment by construction.
    */
  def shardManifestStream(rows: DataFrame): Dataset[ManifestOut] = {
    import rows.sparkSession.implicits._
    rows.select(col("shard_id"), col("doc_id"), col("n_chars"),
      col("h40")).as[ShardRowIn]
      .groupByKey(_.shard_id)
      .flatMapGroupsWithState[ManifestState, ManifestOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: Long, in: Iterator[ShardRowIn],
            state: GroupState[ManifestState]) =>
          val st = state.getOption.getOrElse(ManifestState(0L, 0L,
            Long.MaxValue, Long.MinValue, Long.MaxValue, Long.MinValue,
            0L, 0L))
          var (n, ch, mnD, mxD, mnH, mxH, fo) = (st.n, st.chars,
            st.minDoc, st.maxDoc, st.minH, st.maxH, st.fold)
          in.foreach { r =>
            n += 1; ch += r.n_chars; fo += r.h40
            mnD = math.min(mnD, r.doc_id); mxD = math.max(mxD, r.doc_id)
            mnH = math.min(mnH, r.h40); mxH = math.max(mxH, r.h40)
          }
          if (n == st.n) Iterator.empty
          else {
            val rev = st.rev + 1
            state.update(ManifestState(n, ch, mnD, mxD, mnH, mxH, fo,
              rev))
            Iterator.single(ManifestOut(sid, n, ch, mnD, mxD, mnH, mxH,
              fo, rev))
          }
      }
  }

  // ---- stream_agent: tool-call trace integrity maintained live ----

  private[streaming] case class TraceEvIn(trace_id: Long, event_id: Long,
    ts_us: Long, action: String)

  case class AgentState(nEv: Long, nCall: Long, nRes: Long, nErr: Long,
    bal: Long, minBal: Long, maxBal: Long, rev: Long)

  case class AgentOut(trace_id: Long, n_events: Long, n_calls: Long,
    n_results: Long, n_errors: Long, max_depth: Long,
    unmatched_results: Long, dangling_calls: Long, is_wellformed: Long,
    rev: Long)

  /** stream_agent — tool-call trace integrity maintained LIVE (batch
    * twin: AgentTrace.agentTrace): per-trace state is the counter
    * tuple (events, calls, results, errors) plus the running balance
    * and its min/max — CONSTANT per trace at any stream length (the
    * stream never holds events, only the fold the pairing identities
    * need; the stream_passk sufficient-statistic argument, with the
    * balance extremes standing in for the prefix scan). The balance
    * is ORDER-sensitive, so events sort by (ts_us, event_id) within
    * each batch and in-order arrival per trace ACROSS batches is the
    * log-shipping contract (stream_retention's anchor argument; the
    * ingest tick delivers event logs in time order). Each batch that
    * touches a trace emits its current verdict as an append-mode
    * changelog row with a bumped rev; the reader folds max-rev per
    * trace (the stream_scd2 contract) — folded view == batch
    * agentTrace on the same prefix, exactly (spec cuts every trace
    * across splits). This is the agent-ingest gate live: a trace's
    * is_wellformed bit is current the moment its last event lands.
    */
  def agentTraceStream(trace: DataFrame): Dataset[AgentOut] = {
    import trace.sparkSession.implicits._
    trace.select(col("trace_id"), col("event_id"), col("ts_us"),
      col("action")).as[TraceEvIn]
      .groupByKey(_.trace_id)
      .flatMapGroupsWithState[AgentState, AgentOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tid: Long, in: Iterator[TraceEvIn],
            state: GroupState[AgentState]) =>
          val st = state.getOption.getOrElse(
            AgentState(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
          var (nEv, nCall, nRes, nErr) =
            (st.nEv, st.nCall, st.nRes, st.nErr)
          var (bal, minBal, maxBal) = (st.bal, st.minBal, st.maxBal)
          in.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            nEv += 1
            e.action match {
              case "call"   => nCall += 1; bal += 1
              case "result" => nRes += 1; bal -= 1
              case "error"  => nErr += 1
              case _        => ()
            }
            minBal = math.min(minBal, bal)
            maxBal = math.max(maxBal, bal)
          }
          if (nEv == st.nEv) Iterator.empty
          else {
            val rev = st.rev + 1
            state.update(AgentState(nEv, nCall, nRes, nErr, bal, minBal,
              maxBal, rev))
            val unmatched = math.max(-minBal, 0L)
            val dangling = bal + unmatched
            Iterator.single(AgentOut(tid, nEv, nCall, nRes, nErr,
              math.max(maxBal, 0L), unmatched, dangling,
              if (unmatched == 0L && dangling == 0L && nErr == 0L) 1L
              else 0L, rev))
          }
      }
  }

  // ---- stream_loop: stuck-loop quarantine maintained live ----

  case class LoopState(lastAction: String, curRun: Long, maxRun: Long,
    runAction: String, nEv: Long, nRuns: Long, rev: Long)

  case class LoopOut(trace_id: Long, n_events: Long, n_runs: Long,
    max_run: Long, run_action: String, is_looping: Long, rev: Long)

  /** stream_loop — the stuck-loop quarantine maintained LIVE (batch
    * twin: AgentTrace.traceLoop): per-trace state is (last action,
    * current run length, best run so far + its action, event/run
    * counters) — CONSTANT per trace at any stream length; the
    * gaps-and-islands scan folds to this because a run's length
    * passes through every prefix value, so comparing the running run
    * against the best AT EACH EVENT (tie → lexicographically smaller
    * action, the batch tie-break) reproduces the batch max exactly.
    * Run continuity is ORDER-sensitive (a batch boundary must not
    * split a run), so events sort by (ts_us, event_id) within each
    * batch and in-order per-trace arrival across batches is the
    * log-shipping contract (the stream_agent contract verbatim).
    * Changelog emission with rev, folded max-rev per trace == batch
    * traceLoop on the same prefix — the moment a trace crosses
    * LoopRunMin its is_looping bit flips live, which is the point:
    * an agent runtime kills the looping rollout NOW, not at the
    * nightly batch QC.
    */
  def traceLoopStream(trace: DataFrame): Dataset[LoopOut] = {
    import trace.sparkSession.implicits._
    val loopMin = graft.operators.AgentTrace.LoopRunMin
    trace.select(col("trace_id"), col("event_id"), col("ts_us"),
      col("action")).as[TraceEvIn]
      .groupByKey(_.trace_id)
      .flatMapGroupsWithState[LoopState, LoopOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tid: Long, in: Iterator[TraceEvIn],
            state: GroupState[LoopState]) =>
          val st = state.getOption.getOrElse(
            LoopState("", 0L, 0L, "", 0L, 0L, 0L))
          var (last, cur, mx, mxA) =
            (st.lastAction, st.curRun, st.maxRun, st.runAction)
          var (nEv, nRuns) = (st.nEv, st.nRuns)
          in.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            nEv += 1
            if (e.action == last) cur += 1
            else { nRuns += 1; cur = 1L; last = e.action }
            if (cur > mx || (cur == mx && e.action < mxA)) {
              mx = cur; mxA = e.action
            }
          }
          if (nEv == st.nEv) Iterator.empty
          else {
            val rev = st.rev + 1
            state.update(LoopState(last, cur, mx, mxA, nEv, nRuns, rev))
            Iterator.single(LoopOut(tid, nEv, nRuns, mx, mxA,
              if (mx >= loopMin) 1L else 0L, rev))
          }
      }
  }

  // ---- stream_lint: chat-format lint maintained live ----

  private[streaming] case class TurnLintIn(conv_id: Long, turn_idx: Long,
    role: String, text: String)

  case class LintState(nTurns: Long, nViol: Long, firstRole: String,
    lastRole: String, nEmpty: Long, rev: Long)

  case class LintOut(conv_id: Long, n_turns: Long, n_alternation_viol: Long,
    first_role: String, last_role: String, n_empty_turns: Long,
    is_clean: Long, rev: Long)

  /** stream_lint — the chat-format structural lint maintained LIVE
    * (batch twin: PostTrain.convLint): per-conversation state is the
    * counter tuple (turns, alternation violations, empty turns) plus
    * the first and last role seen — CONSTANT per conversation at any
    * stream length (the lint verdict is a function of this fold,
    * never of the turn list; the stream_agent sufficient-statistic
    * argument). Alternation is ORDER-sensitive, so turns sort by
    * turn_idx within each batch and in-order arrival per conversation
    * across batches is the log-shipping contract. Each batch that
    * touches a conversation emits its CURRENT verdict as an
    * append-mode changelog row with a bumped rev; the reader folds
    * max-rev per conversation — the SFT-entry gate live: a
    * conversation's clean bit is current the moment its latest turn
    * lands (a mid-flight conversation ending on a user turn reads
    * is_clean=0 and flips when the assistant reply arrives — exactly
    * the batch semantics applied to the prefix).
    */
  def convLintStream(turnsIn: DataFrame): Dataset[LintOut] = {
    import turnsIn.sparkSession.implicits._
    turnsIn.select(col("conv_id"), col("turn_idx"), col("role"),
      col("text")).as[TurnLintIn]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[LintState, LintOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (cid: Long, in: Iterator[TurnLintIn],
            state: GroupState[LintState]) =>
          val st = state.getOption.getOrElse(
            LintState(0L, 0L, null, null, 0L, 0L))
          var (nTurns, nViol, nEmpty) = (st.nTurns, st.nViol, st.nEmpty)
          var firstRole = st.firstRole; var lastRole = st.lastRole
          in.toArray.sortBy(_.turn_idx).foreach { t =>
            nTurns += 1
            if (t.role == lastRole) nViol += 1
            if (firstRole == null) firstRole = t.role
            lastRole = t.role
            if (t.text.isEmpty) nEmpty += 1
          }
          if (nTurns == st.nTurns) Iterator.empty
          else {
            val rev = st.rev + 1
            state.update(LintState(nTurns, nViol, firstRole, lastRole,
              nEmpty, rev))
            Iterator.single(LintOut(cid, nTurns, nViol, firstRole,
              lastRole, nEmpty,
              if (nViol == 0L && firstRole == "user" &&
                lastRole == "assistant" && nEmpty == 0L) 1L else 0L,
              rev))
          }
      }
  }

  // ---- stream_returns: discounted reward-to-go maintained live ----

  case class ReturnsState(evIds: Seq[Long], tss: Seq[Long],
    acts: Seq[String], rews: Seq[Long])

  case class ReturnOut(trace_id: Long, event_id: Long, ts_us: Long,
    action: String, reward: Long, return_ppm: Long)

  /** stream_returns — step-level discounted returns maintained LIVE
    * (batch twin: AgentTrace.traceReturns): per-trace state is the
    * PENDING HORIZON BUFFER — the most recent < Horizon events whose
    * discount window has not yet filled — so state is CONSTANT per
    * trace (≤ H−1 rows of four scalars) at any stream length. An
    * event's return is FINAL the moment its H−1st follower arrives
    * (every later event is outside the literal γ^k window), so each
    * event emits exactly once, append-only — no changelog fold needed.
    * The last H−1 events of a trace never emit on an unbounded stream:
    * "the rest of the horizon hasn't happened yet" (the stream_sft
    * incomplete-conversation argument — batch closes the trace and
    * zero-fills; a deployment bolts a close/timeout flush onto the
    * same state). In-batch (ts_us, event_id) sort + in-order arrival
    * per trace across batches is the log-shipping contract
    * (stream_agent's). Spec: emitted rows == batch traceReturns
    * restricted to events with ≥ H−1 followers, under adversarial
    * cuts with in-batch shuffling.
    */
  def traceReturnsStream(trace: DataFrame): Dataset[ReturnOut] = {
    import trace.sparkSession.implicits._
    val h = graft.operators.AgentTrace.ReturnHorizon
    val w = graft.operators.AgentTrace.GammaPpm
    trace.select(col("trace_id"), col("event_id"), col("ts_us"),
      col("action")).as[TraceEvIn]
      .groupByKey(_.trace_id)
      .flatMapGroupsWithState[ReturnsState, ReturnOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tid: Long, in: Iterator[TraceEvIn],
            state: GroupState[ReturnsState]) =>
          val st = state.getOption.getOrElse(
            ReturnsState(Nil, Nil, Nil, Nil))
          var ids = st.evIds; var tss = st.tss
          var acts = st.acts; var rews = st.rews
          val out = scala.collection.mutable.ArrayBuffer.empty[ReturnOut]
          in.toArray.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            val r = e.action match {
              case "assistant" => 1L
              case "error"     => -1L
              case _           => 0L
            }
            ids :+= e.event_id; tss :+= e.ts_us
            acts :+= e.action; rews :+= r
            if (ids.length == h) { // head's window is full → final
              val ret = w.indices.map(k => w(k) * rews(k)).sum
              out += ReturnOut(tid, ids.head, tss.head, acts.head,
                rews.head, ret)
              ids = ids.tail; tss = tss.tail
              acts = acts.tail; rews = rews.tail
            }
          }
          state.update(ReturnsState(ids, tss, acts, rews))
          out.iterator
      }
  }

  // ---- stream_retention: bounded-state cohort retention ----

  private[streaming] case class DayEvent(user_id: Long, epoch_day: Int)

  case class RetState(cohortDay: Int, seen: Long)

  case class RetDelta(cohort_day: Int, day_offset: Long)

  /** stream_retention — the cohort retention matrix maintained LIVE
    * (batch twin: q35_retention) with PROVABLY BOUNDED state: the
    * naive stream would hold each user's full set of active days
    * (unbounded on an unbounded stream); instead each user's state is
    * their cohort day plus a 64-day offset BITMASK in one long —
    * constant 12 bytes per user at any stream length, with the
    * retention horizon (the [[RetentionHorizonDays]] window every
    * real retention dashboard caps at anyway) made explicit instead
    * of implicit. A delta row (cohort_day, day_offset) is emitted the
    * FIRST time a user is active at an offset — the changelog — so
    * the reader's fold (count deltas per cell) IS the distinct-user
    * retention matrix, equal to the batch operator for offsets inside
    * the horizon (spec). Activity beyond the horizon is dropped by
    * contract, not by accident. In-order arrival per user across
    * batches is the log-shipping contract (the first-seen day anchors
    * the cohort, as stream_funnel's first view anchors the funnel).
    */
  val RetentionHorizonDays = 64

  def retentionDeltas(events: DataFrame): Dataset[RetDelta] = {
    import events.sparkSession.implicits._
    val ev = events.select(col("user_id"),
      (unix_timestamp(col("ts")) / 86400L).cast("int").as("epoch_day"))
      .as[DayEvent]
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[RetState, RetDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (u: Long, in: Iterator[DayEvent], state: GroupState[RetState]) =>
          val days = in.map(_.epoch_day).toArray.sorted
          if (days.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(RetState(days.head, 0L))
            val out = Vector.newBuilder[RetDelta]
            days.foreach { d =>
              val off = d - st.cohortDay
              if (off >= 0 && off < RetentionHorizonDays &&
                (st.seen & (1L << off)) == 0L) {
                st = st.copy(seen = st.seen | (1L << off))
                out += RetDelta(st.cohortDay, off.toLong)
              }
            }
            state.update(st)
            out.result().iterator
          }
      }
  }

  // ---- stream_perplexity: LM scoring against the persisted model ----

  private[streaming] case class PplxProbe(doc_id: Long, lang: String, s: Long)

  case class PplxScore(doc_id: Long, lang: String, n_bigrams: Long,
    sum_surprisal: Long)

  /** stream_perplexity — the deployment shape of perplexity_filter:
    * docs arrive as a stream and are scored against the FROZEN
    * reference LM from the persisted `sources.LmModel` bundle
    * (stream-static left joins to the skinny `bigrams/` + `contexts/`
    * frames — the reference corpus is never re-scanned, the
    * sink_fingerprints contract applied to the model tier). Bigram
    * rows are generated narrow (the shifted-zip trick); the per-doc
    * roll-up runs in the same zero-state flatMapGroupsWithState shape
    * as ingestMinhashGate (a doc's bigram rows arrive in one
    * micro-batch; state rows stay 0, spec'd). Bucketing applies the
    * persisted per-language cut VALUES (`cuts/`) — the CCNet
    * deployment rule: thresholds computed once on the reference run,
    * shipped as constants; a boundary tie goes to the earlier bucket,
    * and a language absent from the cuts frame scores 'tail'
    * (unknown-language caution). Bigram-less docs keep the batch
    * sentinel (-1.0 bits, 'tail') via a stateless union branch.
    * `v` is the bundle's one-row `meta/` scalar, read at stream BUILD
    * time (model-load, not per-batch — the annServed lifecycle).
    */
  def perplexityGate(docs: DataFrame, bigrams: DataFrame,
      contexts: DataFrame, v: Long, cuts: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // the SHARED zip-shift generator (LangModel.shiftedWith) — the
    // stream must tokenize exactly as the batch scorer or the
    // round-trip equality silently breaks
    val bg = graft.operators.LangModel.shiftedWith(docs, Seq("lang"))
      .filter(col("w2").isNotNull)
    val scored = bg.join(bigrams, Seq("w1", "w2"), "left")
      .join(contexts, Seq("w1"), "left")
      .withColumn("s", (length(bin(expr(
        s"""((coalesce(c1, 0L) + ${v}L) * ${graft.operators.LangModel.LmScale})
            DIV (coalesce(c12, 0L) + 1)"""))) - 1).cast("long"))
      .select(col("doc_id"), col("lang"), col("s")).as[PplxProbe]
    val perDoc = scored.groupByKey(_.doc_id)
      .flatMapGroupsWithState[ZeroState, PplxScore](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, in: Iterator[PplxProbe],
            state: GroupState[ZeroState]) =>
          var n = 0L; var sum = 0L; var lang = ""
          in.foreach { p => n += 1; sum += p.s; lang = p.lang }
          Iterator.single(PplxScore(id, lang, n, sum))
      }
    // bigram-less docs never reach the probe path — keep the batch
    // sentinel via a stateless side branch
    val lone = docs
      .filter(size(graft.functions.TextFns.tokens(col("text"))) < 2)
      .select(col("doc_id"), col("lang"),
        lit(0L).as("n_bigrams"), lit(0L).as("sum_surprisal"))
    perDoc.toDF().union(lone)
      .join(cuts, Seq("lang"), "left")
      .withColumn("ord", when(col("n_bigrams") === 0L, 0.0)
        .otherwise(col("sum_surprisal") / col("n_bigrams")))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("sum_surprisal"),
        graft.operators.LangModel.bptCol.as("bits_per_token"),
        when(col("n_bigrams") === 0L, "tail")
          .when(col("ord") <=
            coalesce(col("cut_head"), lit(Double.NegativeInfinity)), "head")
          .when(col("ord") <=
            coalesce(col("cut_mid"), lit(Double.NegativeInfinity)), "middle")
          .otherwise("tail").as("bucket"))
  }

  // ---- stream_skipgram: incremental co-occurrence maintenance ----

  case class SkipPair(center: String, context: String, d: Long)

  case class SkipFragState(unused: Long)

  case class SkipFrag(center: String, context: String,
      n_delta: Long, w_delta: Long)

  /** stream_skipgram — incremental co-occurrence maintenance (batch
    * twin: skipgram_pairs): each micro-batch emits one DELTA row per
    * touched (center, context) pair — count and Σ 12 DIV d weight
    * deltas — in append mode; the reader folds deltas per pair (plain
    * sums — a doc's pairs arrive in one batch, so deltas add
    * disjointly) and holds EXACTLY the batch co-occurrence matrix
    * (spec across batch splits). Same zero-state contract as
    * stream_index: fragments are pure per-batch functions, nothing in
    * the state store grows with the vocabulary; the continuously-
    * retrained-embeddings feed.
    */
  def skipgramDeltas(docs: DataFrame): Dataset[SkipFrag] = {
    import docs.sparkSession.implicits._
    graft.operators.LangModel.skipgramStacked(docs).as[SkipPair]
      .groupByKey(p => (p.center, p.context))
      .flatMapGroupsWithState[SkipFragState, SkipFrag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String), in: Iterator[SkipPair],
            state: GroupState[SkipFragState]) =>
          var n = 0L
          var w = 0L
          in.foreach { p => n += 1; w += 12L / p.d }
          Iterator.single(SkipFrag(key._1, key._2, n, w))
      }
  }

  // ---- stream_data_card: incremental corpus-datasheet maintenance ----

  private[streaming] case class CardIn(doc_id: Long, lang: String,
    source: String, n_toks: Long, n_chars: Long)

  case class CardDelta(lang: String, source: String, d_docs: Long,
    d_tokens: Long, d_chars: Long)

  /** stream_data_card — incremental maintenance of the data_card
    * datasheet (batch twin): each micro-batch emits one DELTA row per
    * touched (lang, source) slice — doc/token/char count deltas — in
    * the stream_skipgram zero-state shape (counts are pure per-batch
    * functions; nothing in the state store grows with the corpus).
    * The reader folds deltas by plain sums and derives the share
    * columns from the folded totals — identical to the batch op's
    * basis points, because shares are a pure function of the counts
    * (spec: fold across uneven splits == batch data_card row-for-row,
    * shares included). The continuously-published corpus datasheet:
    * ingest keeps the card current without ever re-scanning the
    * standing corpus.
    */
  def dataCardDeltas(docs: DataFrame): Dataset[CardDelta] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("lang"), col("source"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long")
          .as("n_toks"),
        // the table's n_chars column, matching the batch op's sum
        col("n_chars").cast("long").as("n_chars"))
      .as[CardIn]
      .groupByKey(c => (c.lang, c.source))
      .flatMapGroupsWithState[SkipFragState, CardDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String), in: Iterator[CardIn],
            state: GroupState[SkipFragState]) =>
          var d = 0L; var t = 0L; var c = 0L
          in.foreach { r => d += 1; t += r.n_toks; c += r.n_chars }
          Iterator.single(CardDelta(key._1, key._2, d, t, c))
      }
  }

  // ---- stream_compact: incremental latest-per-key materialized view ----

  case class CompactIn(user_id: Long, event_type: String, event_id: Long,
      value: Double, ts: java.sql.Timestamp)

  case class CompactState(eventId: Long, value: Double, tsUs: Long)

  case class CompactOut(user_id: Long, event_type: String, event_id: Long,
      ts_us: Long, value: Double)

  /** stream_compact — the streaming twin of q31_compact_latest:
    * maintain the newest record per (user, event_type) INCREMENTALLY
    * as the append log streams in, emitting a changelog row whenever a
    * key's latest changes (the CDC/materialized-view-maintenance
    * shape — a reader folding the changelog by key holds exactly the
    * batch compaction's answer, spec-asserted). Recency order matches
    * the batch twin: exact epoch-µs, ties to the larger event_id; an
    * out-of-order STALE arrival updates nothing and emits nothing.
    * State is ONE row per live key — the compacted view's own
    * cardinality, which is the floor for any exact implementation
    * (no TTL: evicting a key would forget its latest record; readers
    * needing bounded state shard by key range upstream).
    */
  def compactLatest(events: Dataset[CompactIn]): Dataset[CompactOut] = {
    import events.sparkSession.implicits._
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[CompactState, CompactOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), in: Iterator[CompactIn],
            state: GroupState[CompactState]) =>
          val prev = state.getOption.orNull
          var st = prev
          in.foreach { e =>
            val tsUs = micros(e.ts)
            if (st == null || tsUs > st.tsUs ||
                (tsUs == st.tsUs && e.event_id > st.eventId))
              st = CompactState(e.event_id, e.value, tsUs)
          }
          if (st != null && (st ne prev)) {
            state.update(st)
            Iterator.single(
              CompactOut(key._1, key._2, st.eventId, st.tsUs, st.value))
          } else Iterator.empty
      }
  }

  // ---- stream_mr: incremental map-reduce over chunk streams ----

  /** One mapped chunk arriving on the stream. `n_chunks_total` is known
    * at chunking time (the reference knows its chunk count up front —
    * test_proactive.py:207). `ts` is the chunk's event time, which
    * drives the incomplete-doc timeout watermark.
    */
  case class ChunkIn(doc_id: Long, chunk_id: Long, n_chunks_total: Int,
      summary: String, ts: java.sql.Timestamp)

  case class MrState(got: Map[Long, String], maxTsMs: Long)

  case class DocOut(doc_id: Long, n_chunks: Long, final_summary: String,
      complete: Boolean)

  /** stream_mr — the "proactive" reduce: per-doc state accumulates
    * chunk summaries AS THEY ARRIVE (any order) and emits the ordered
    * combine the moment the last chunk lands — no batch barrier, which
    * is exactly the overlap the reference's pipeline buys
    * (reference pipeline_70b_samsum.py).
    *
    * State is BOUNDED: docs whose chunks stop arriving time out one
    * [[IncompleteDocTimeoutMs]] past the event-time watermark and emit
    * a best-effort partial reduce (`complete = false`) — without this,
    * one lost chunk leaks its doc's state forever on an unbounded
    * stream.
    */
  val IncompleteDocTimeoutMs: Long = 60L * 60 * 1000

  def incrementalReduce(chunks: Dataset[ChunkIn]): Dataset[DocOut] = {
    import chunks.sparkSession.implicits._
    chunks
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[MrState, DocOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (docId: Long, in: Iterator[ChunkIn], state: GroupState[MrState]) =>
          def emit(got: Map[Long, String], complete: Boolean) = {
            state.remove()
            val ordered = got.toSeq.sortBy(_._1).map(_._2).mkString(" | ")
            Iterator.single(DocOut(docId, got.size.toLong, ordered, complete))
          }
          if (state.hasTimedOut) {
            emit(state.get.got, complete = false)
          } else {
            val prev = state.getOption.getOrElse(MrState(Map.empty, 0L))
            var got = prev.got
            var maxTs = prev.maxTsMs
            var total = -1
            in.foreach { c =>
              got += (c.chunk_id -> c.summary)
              maxTs = math.max(maxTs, c.ts.getTime)
              total = c.n_chunks_total
            }
            if (total > 0 && got.size >= total) emit(got, complete = true)
            else {
              state.update(MrState(got, maxTs))
              // anchored to the group's OWN event time, not the global
              // watermark — the watermark jumps from epoch 0 on the
              // first batch and would fire every timeout immediately
              state.setTimeoutTimestamp(maxTs + IncompleteDocTimeoutMs)
              Iterator.empty
            }
          }
      }
  }
}
