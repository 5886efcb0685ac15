package graft.operators

import graft.{Op, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Train/eval split discipline + mixing-budget planning — the
  * bookkeeping half of corpus curation that decides WHERE each curated
  * doc goes (which split, how many epochs), after the content ops
  * decide WHETHER it stays.
  *
  *   - split_safe: leakage-safe ratio split keyed on CONTENT, not
  *     doc_id. Splitting by doc-id hash (mr_ratio_split's shape, and
  *     the industry default) lets two exact copies straddle the
  *     train/eval boundary — the classic train-test leakage the dedup
  *     literature warns about (Lee et al. 2022 §6 measure exactly this
  *     overlap inflating eval scores). Keying the split on md5(text)
  *     makes straddling IMPOSSIBLE for exact copies, by construction,
  *     and makes the assignment reproducible across re-crawls and
  *     re-partitions (a doc's split never depends on what id a crawler
  *     happened to assign it).
  *   - split_leakage: the near-dup-aware escalation — assignment keyed
  *     on the dedup_pipeline CLUSTER (exact pre-pass → MinHash LSH →
  *     Jaccard verify → connected components), so near-duplicates
  *     cannot straddle the boundary either. Full oracle since r17
  *     (the pipeline replay); the planted spec pins the guarantee.
  *   - mix_epoch_plan: the per-source token-budget allocation table a
  *     training run consumes (the published sampling-weights tables of
  *     Gopher Table A3 / Llama: weights from a temperature over source
  *     sizes, with an epoch ceiling per source): α = 1/2 weights over
  *     per-source token mass, a total budget of one corpus-worth of
  *     tokens, and a [[MaxEpochs]] cap on small sources with the
  *     over-allocation REPORTED (excess_toks), not silently
  *     redistributed — a one-shot plan a caller can iterate.
  *
  * Scale shapes: split_safe is one skinny digest shuffle (the
  * dedup_exact groupBy — ids and 32-char hashes, text never leaves its
  * scan) plus a narrow per-row assignment; split_leakage rides
  * dedup_pipeline's proven bounded stages and adds one skinny
  * cluster-size fold; mix_epoch_plan is a per-source aggregate (rows =
  * sources, vanishing) under one broadcast totals row. All three are
  * 100 TB-safe by construction.
  */
object Splits {

  private def docs(s: SparkSession, dir: String) =
    Tables(s, dir, "documents")

  // ---- split_safe: content-keyed leakage-safe ratio split ----

  /** Eval tranche width in sixteenths of the md5 keyspace: first hex
    * nibble ∈ {0, 1} → eval, i.e. 2/16 = 12.5 % — the nibble keeps the
    * assignment expressible identically in Spark and DuckDB (both
    * engines agree on md5 hex and instr; neither shares a 64-bit
    * string hash). */
  val EvalSixteenths = 2

  /** Split assignment as one portable SQL expression over a hex-digest
    * column (shared by the batch op and the streaming gate). */
  private[graft] def splitOf(hashCol: String): String =
    s"CASE WHEN instr('0123456789abcdef', substr($hashCol, 1, 1)) " +
      s"<= $EvalSixteenths THEN 'eval' ELSE 'train' END"

  private[graft] def splitSafe(d: DataFrame): DataFrame = {
    // ids + digests only through the shuffle (the dedup_exact move).
    // Skew (r17, the twice-carried claim made load-bearing — and found
    // FALSE): a boilerplate text with millions of copies makes its
    // digest a hot probe-side join key, and this plan CANNOT ride
    // AQE's skew join — OptimizeSkewedJoin only matches a join whose
    // children are bare sorted shuffle stages, and the counts side
    // carries its FINAL HashAggregate between the Sort and the
    // shuffle read (verified empirically: the hot partition reads
    // `AQEShuffleRead coalesced`, never `skew=true`, at any
    // threshold). So the join routes through the q28 salt machinery
    // instead: Skew.saltedJoin spreads the hot digest across 16
    // deterministic (key, salt) reducers and replicates only the
    // SKINNY counts rows — bounded task input by construction, no
    // optimizer pattern-match in the loop. SplitsSpec pins both the
    // spread (hot rows land on ≥ 2 partitions) and exactness.
    val hashed = d.select(col("doc_id"), col("source"),
      md5(col("text")).as("content_hash"))
    val copies = hashed.groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"))
    Skew.saltedJoin(hashed, copies, "content_hash")
      .select(col("doc_id"), col("source"), col("content_hash"),
        col("n_copies"), expr(splitOf("content_hash")).as("split"))
  }

  private val opSplitSafe = Op(
    "split_safe",
    (s, dir) => splitSafe(docs(s, dir)),
    Some(s"""
      WITH d AS (SELECT doc_id, source, md5(text) AS content_hash
        FROM documents),
      c AS (SELECT content_hash, CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM d GROUP BY 1)
      SELECT d.doc_id, d.source, d.content_hash, c.n_copies,
        ${splitOf("d.content_hash")} AS split
      FROM d JOIN c USING (content_hash)"""))

  // ---- split_leakage: near-dup-cluster-keyed split ----

  /** Eval share for the cluster-keyed split, in tenths (Lehmer hash of
    * the cluster id — the mix_sample integer-exact keep machinery, so
    * every member of a cluster computes the identical bit). */
  val LeakEvalTenths = 1L

  private[graft] def splitLeakage(d: DataFrame): DataFrame = {
    val dd = Dedup.dedupPipeline(d.select(col("doc_id"), col("text")))
    val sizes = dd.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    dd.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("is_keeper"),
        when((col("cluster_id") * Sampling.MixMul % Sampling.MixMod)
            * 10L < Sampling.MixMod * LeakEvalTenths, "eval")
          .otherwise("train").as("split"))
  }

  private val opSplitLeakage = Op(
    "split_leakage",
    (s, dir) => {
      graft.plans.GraftFunctions.register(s)
      splitLeakage(docs(s, dir))
    },
    // Full oracle since r17: Dedup.pipelineOracleCtes replays the LSH
    // clustering (the spec still plants the near-dup pair pinning
    // same-cluster => same-split); on top ride cluster sizes and the
    // integer-exact Lehmer eval/train split.
    Some(s"""
      WITH RECURSIVE ${Dedup.pipelineOracleCtes},
      sizes AS (
        SELECT cluster_id, COUNT(*) AS cluster_size FROM pipe
        GROUP BY cluster_id
      )
      SELECT p.doc_id, p.cluster_id,
        CAST(s.cluster_size AS BIGINT) AS cluster_size, p.is_keeper,
        CASE WHEN (p.cluster_id * ${Sampling.MixMul} % ${Sampling.MixMod})
            * 10 < ${Sampling.MixMod} * $LeakEvalTenths
          THEN 'eval' ELSE 'train' END AS split
      FROM pipe p JOIN sizes s USING (cluster_id)"""))

  // ---- mix_epoch_plan: per-source budget/epoch allocation ----

  /** Epoch ceiling per source — the published small-source guard
    * (repeating a tiny curated source dozens of times memorizes it;
    * ~4 epochs is the commonly cited degradation knee). */
  val MaxEpochs = 4.0

  /** α = 1/2 source weights via integer isqrt so the weight
    * denominator is an EXACT integer sum (a float Σ√t would make the
    * oracle's rounding depend on source summation order): isqrt(t) =
    * floor(sqrt) is deterministic in both engines for t ≪ 2^52. */
  private def isq(c: org.apache.spark.sql.Column) =
    floor(sqrt(c.cast("double"))).cast("long")

  private[graft] def epochPlan(d: DataFrame): DataFrame = {
    // checkpointed: rows = #sources (vanishing) and the frame is read
    // twice (totals + the plan join) — without it both references
    // re-run the corpus token scan
    val perSource = d
      .select(col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_toks"))
      .withColumn("sq", isq(col("n_toks")))
      .localCheckpoint()
    val tot = perSource.agg(sum(col("n_toks")).as("b"),
      sum(col("sq")).as("sqsum"))
    // one-shot plan: planned = w·B; epochs capped, excess reported
    perSource.crossJoin(broadcast(tot))
      .withColumn("planned",
        col("sq") * lit(1.0) * col("b") / col("sqsum"))
      .select(col("source"), col("n_docs"), col("n_toks"),
        round(col("sq") * lit(1.0) / col("sqsum"), 6).as("weight"),
        round(least(col("planned") / col("n_toks"), lit(MaxEpochs)), 4)
          .as("epochs"),
        round(least(col("planned"), lit(MaxEpochs) * col("n_toks")), 4)
          .as("planned_toks"),
        round(greatest(col("planned") - lit(MaxEpochs) * col("n_toks"),
          lit(0.0)), 4).as("excess_toks"))
  }

  private val opEpochPlan = Op(
    "mix_epoch_plan",
    (s, dir) => epochPlan(docs(s, dir)),
    Some(s"""
      WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks
        FROM documents GROUP BY 1),
      q AS (SELECT *, CAST(FLOOR(SQRT(CAST(n_toks AS DOUBLE))) AS BIGINT)
          AS sq FROM s),
      t AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS b,
          CAST(SUM(sq) AS BIGINT) AS sqsum FROM q)
      SELECT source, n_docs, n_toks,
        ROUND(sq * 1.0 / sqsum, 6) AS weight,
        ROUND(LEAST(sq * 1.0 * b / sqsum / n_toks, $MaxEpochs), 4) AS epochs,
        ROUND(LEAST(sq * 1.0 * b / sqsum, $MaxEpochs * n_toks), 4)
          AS planned_toks,
        ROUND(GREATEST(sq * 1.0 * b / sqsum - $MaxEpochs * n_toks, 0.0), 4)
          AS excess_toks
      FROM q, t"""))

  // ---- mix_upsample: materialize the epoch plan per doc ----

  /** The step between mix_epoch_plan and a training run: the plan says
    * source S trains for e epochs (fractional, capped); the LOADER
    * needs that as a per-doc REPETITION COUNT. Every doc of S repeats
    * floor(e) times, and a deterministic hash tranche of width
    * frac(e) repeats once more — so Σ copies per source lands within
    * one doc of e·n_docs, the materialization is reproducible run to
    * run (the Lehmer tranche, mix_sample's machinery: no RNG, no
    * seed-order dependence), and BOTH directions fall out of one rule
    * (e < 1 is downsampling: floor 0, a frac-e tranche survives).
    *
    * Arithmetic is EXACT end to end — the oracle hashes it: epochs in
    * integer basis points via decimal(38) floor division (sq·10⁴·B may
    * exceed int64 at 10¹⁴-token corpora; decimal keeps the quotient
    * exact in both engines), tranche membership by cross-multiplied
    * integer comparison (key·10⁴ < frac_bp·M — no float ratio
    * anywhere). One per-source aggregate + a broadcast plan row joined
    * back to the skinny (doc_id, source) frame: scale-free.
    */
  private[graft] def mixUpsample(d: DataFrame): DataFrame = {
    import Sampling.{MixMod, MixMul}
    val perSource = d
      .select(col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_toks"))
      .withColumn("sq",
        floor(sqrt(col("n_toks").cast("double"))).cast("long"))
      .localCheckpoint()
    val tot = perSource.agg(sum(col("n_toks")).as("b"),
      sum(col("sq")).as("sqsum"))
    val plan = perSource.crossJoin(broadcast(tot))
      .withColumn("epochs_bp", least(
        expr("CAST(sq AS DECIMAL(38,0)) * 10000 * b" +
          " DIV (CAST(sqsum AS DECIMAL(38,0)) * n_toks)").cast("long"),
        lit((MaxEpochs * 10000).toLong)))
      .select(col("source"), col("epochs_bp"))
    d.select(col("doc_id"), col("source"))
      .join(broadcast(plan), Seq("source"))
      .withColumn("tranche_key", (col("doc_id") * MixMul) % MixMod)
      .select(col("doc_id"), col("source"), col("epochs_bp"),
        (expr("epochs_bp DIV 10000") +
          when(col("tranche_key") * 10000 <
            (col("epochs_bp") % 10000) * MixMod, 1L).otherwise(0L))
          .as("n_copies"))
  }

  private val opUpsample = Op(
    "mix_upsample",
    (s, dir) => mixUpsample(docs(s, dir)),
    Some(s"""
      WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks
        FROM documents GROUP BY 1),
      q AS (SELECT *, CAST(FLOOR(SQRT(CAST(n_toks AS DOUBLE))) AS BIGINT)
          AS sq FROM s),
      t AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS b,
          CAST(SUM(sq) AS BIGINT) AS sqsum FROM q),
      plan AS (SELECT source,
          LEAST(CAST(CAST(sq AS HUGEINT) * 10000 * b
              // (CAST(sqsum AS HUGEINT) * n_toks) AS BIGINT),
            ${(MaxEpochs * 10000).toLong}) AS epochs_bp
        FROM q, t)
      SELECT d.doc_id, d.source, p.epochs_bp,
        epochs_bp // 10000
          + CASE WHEN ((d.doc_id * ${Sampling.MixMul})
                % ${Sampling.MixMod}) * 10000
              < (epochs_bp % 10000) * ${Sampling.MixMod}
            THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN plan p ON d.source = p.source"""))

  // ---- contam_minhash: fuzzy benchmark decontamination ----

  /** Fuzzy decontamination against the SAME held-out benchmark slice
    * contam_ngram guards (doc_id % 97 = 0): instead of exact 3-gram
    * overlap, a pool doc is flagged when any of its 8 MinHash LSH
    * bands collides with any benchmark doc's band — the GPT-3 appendix
    * C / Llama fuzzy-dedup decontamination shape, catching lightly
    * edited benchmark copies exact n-grams miss. Same signature kernel
    * and band scheme as dedup_minhash, so a collision here means
    * exactly what a dedup candidate pair means (estimated Jaccard
    * ≳ 0.5 at the 8×4 banding). The benchmark band set is vanishing
    * (corpus/97 × 8 skinny rows) and joins under the counted broadcast
    * guard; corpus text never leaves its scan (the explode carries
    * (doc_id, band) longs only). Full oracle since r17: the minhash
    * kernel replays in DuckDB (plans.OracleSql).
    */
  /** The band-probe kernel shared by the inline driver framing and
    * the store-fed production mode ([[graft.sources.BenchmarkStore
    * .contamMinhashFrom]]): pool band rows (doc_id, band_val) probed
    * against the benchmark's DISTINCT band set under the counted
    * broadcast guard. Keeping the kernel single-sourced is what makes
    * the store-fed == inline row-for-row spec structural. */
  private[graft] def contamMinhashProbe(poolBands: DataFrame,
      evalBands: DataFrame): DataFrame = {
    val marked = evalBands.select(col("band_val")).distinct()
      .withColumn("hit", lit(true))
      .localCheckpoint(eager = false)
    val evalSide =
      if (marked.count() <= Dedup.SpanBroadcastMaxRows)
        broadcast(marked)
      else marked.hint("shuffle_hash")
    poolBands
      .join(evalSide, Seq("band_val"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bands"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_hit_bands"))
      .withColumn("contaminated", (col("n_hit_bands") >= 1L).cast("long"))
  }

  /** Per-doc exploded band rows — the probe kernel's pool-side input,
    * shared with the store writer so persisted benchmark bands use
    * the exact signature scheme the probe hashes with. */
  private[graft] def bandRows(d: DataFrame): DataFrame =
    Dedup.minhashSigs(d.select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(col("bands")).as("band_val"))

  private[graft] def contamMinhash(d: DataFrame): DataFrame = {
    // signatures materialized ONCE (lazy; the eval-band guard count
    // inside the probe runs the job): the benchmark side and the pool
    // side both read the skinny blocks instead of each re-running the
    // minhash kernel over the full corpus
    val bands = bandRows(d).localCheckpoint(eager = false)
    contamMinhashProbe(
      bands.filter(col("doc_id") % 97 =!= 0),
      bands.filter(col("doc_id") % 97 === 0))
  }

  private val opContamMinhash = Op(
    "contam_minhash",
    (s, dir) => {
      graft.plans.GraftFunctions.register(s)
      contamMinhash(docs(s, dir))
    },
    // Full oracle since r17: per-doc band values via the shared
    // OracleSql.sigCtes minhash replay, then the probe is one LEFT
    // JOIN against the benchmark slice's distinct band set — each of
    // a pool doc's 8 band rows counts its own hit, exactly the Spark
    // aggregation.
    Some(s"""
      WITH ${graft.plans.OracleSql.sigCtes("documents", "doc_id", "sg")},
      evalb AS (
        SELECT DISTINCT band_val FROM sg_bandvals WHERE doc_id % 97 = 0
      ), pool AS (
        SELECT doc_id, band_val FROM sg_bandvals WHERE doc_id % 97 <> 0
      )
      SELECT p.doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_bands,
        CAST(SUM(CASE WHEN e.band_val IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_hit_bands,
        CAST(SUM(CASE WHEN e.band_val IS NOT NULL THEN 1 ELSE 0 END) >= 1
          AS BIGINT) AS contaminated
      FROM pool p LEFT JOIN evalb e ON e.band_val = p.band_val
      GROUP BY p.doc_id"""))

  // ---- contam_embed: semantic benchmark decontamination ----

  /** Flag a pool vector as contaminated when its cosine to the nearest
    * benchmark vector reaches [[ContamEmbTau]] — the embedding tier of
    * the decontamination ladder (exact n-grams → MinHash fuzzy →
    * semantic), catching PARAPHRASED benchmark material that shares no
    * surface n-grams at all (the SemDeDup observation applied to
    * train/eval hygiene: overlap lives in representation space, not
    * token space). Same [[graft.operators.Similarity.SemTau]]-family
    * threshold discipline. */
  val ContamEmbTau = 0.8

  /** Semantic decontamination against the SAME held-out benchmark
    * slice the other contam tiers guard (vec_id % 97 = 0 — the
    * embeddings-table mirror of the doc_id convention): every pool
    * vector gets its max cosine over the benchmark set and the nearest
    * benchmark id, flagged at [[ContamEmbTau]].
    *
    * Scale shape — the asymmetric broadcast-index scan, NOT a join: a
    * benchmark suite is bounded by nature (10^4-ish rows, enforced
    * hard by annServedWith's AnnIndexCap require), so the eval side
    * quantizes to the int8 code store (4× smaller, scale cancels in
    * cosine — embed_quantize's audited trade) and rides a Spark
    * broadcast as the [[graft.plans.AnnServe]] serving index; the pool
    * side is ONE narrow codegen'd pass (per row: |eval|·d multiply-adds
    * + a k=1 running max inside the expression — no pool×eval row
    * explosion, no shuffle, no state). This is exactly the stream_ann
    * serving kernel pointed at a frozen benchmark instead of a frozen
    * corpus index; the bounded eval-side collect is the k-means/BPE
    * bounded-driver-table discipline. Scores match ann_quantized's
    * asymmetric float×int8 cosine bit-for-bit (shared round6 +
    * tie-break). Full oracle since r17 (the ann_quantized template
    * applied to the serving kernel's math);
    * the spec mirrors the kernel brute-force in Scala on the full
    * sf0.001 slice and plants copy/orthogonal fixtures.
    *
    * Scaling note (BENCH_sf1's 12× decade ratio, read it right): the
    * DRIVER framing grows both sides — the %97 slice is 10× larger at
    * 10× data, so per-row scan work grows with the corpus (a 100×
    * compute bound). The production contract is the opposite shape: a
    * benchmark suite is FIXED, so the op is strictly LINEAR in pool
    * rows at any corpus size — the dsir_select audit-vs-deployment
    * asymmetry, stated here so nobody reads the synthetic ratio as the
    * operator's scaling law.
    */
  /** Driver-collect the benchmark side's int8 codes with the bounded-
    * collect guard BEFORE the collect: annServedWith's AnnIndexCap
    * require would fire only after the rows are already on the driver
    * — an oversized "benchmark" slice must fail the count check
    * loudly, not OOM the driver first. Shared by the inline framing
    * and [[graft.sources.BenchmarkStore]]'s code reader. */
  private[graft] def boundedEvalCodes(
      evalCodes: DataFrame): Seq[(Long, Seq[Int])] = {
    val m = evalCodes.localCheckpoint(eager = false)
    val evalRows = m.count()
    require(evalRows > 0 && evalRows <= graft.streaming.Streams.AnnIndexCap,
      s"benchmark side must hold 1..${graft.streaming.Streams.AnnIndexCap} " +
        s"rows to serve as a driver-collected index, got $evalRows")
    m.collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
  }

  /** The serve kernel shared by the inline driver framing and the
    * store-fed production mode ([[graft.sources.BenchmarkStore
    * .contamEmbedFrom]]): pool embeddings scanned ONCE against the
    * driver-bounded benchmark code index. */
  private[graft] def contamEmbedServe(pool: DataFrame,
      evalCodes: Seq[(Long, Seq[Int])]): DataFrame = {
    // the handle (broadcast + temp function) lives for the session —
    // the returned frame is lazy and may execute repeatedly (Bench
    // medians); annServedWith's per-call unique name keeps invocations
    // isolated
    val (hits, _) = graft.streaming.Streams.annServedWith(
      pool.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      evalCodes, k = 1)
    hits.select(col("q_id").as("vec_id"),
        col("c_id").as("near_eval_id"), col("cos").as("max_cos"))
      .withColumn("contaminated",
        (col("max_cos") >= ContamEmbTau).cast("long"))
  }

  /** Inline pseudo-benchmark bound (r18). A REAL benchmark is fixed
    * and small; the inline framing derives one from the corpus's %97
    * slice, which GROWS with the corpus — so the pool × benchmark
    * serve scan was quadratic in sf (measured: sf10 full-sweep read
    * ~80× sf1 — both sides grew 10×). Capping the derived benchmark
    * at the slice's first 256 members by vec_id (deterministic,
    * oracle-replayable) restores the production shape — pool scan ×
    * bounded broadcast, linear forever. The cap binds only at sf10+
    * (slice sizes: sf0.01 → 20, sf1 → 206, sf10 → 2061), so driver
    * correctness results are unchanged. boundedEvalCodes' AnnIndexCap
    * guard stays as the driver-memory backstop.
    */
  val ContamEvalCap = 256

  private[graft] def contamEmbed(e: DataFrame): DataFrame =
    contamEmbedServe(
      e.filter(col("vec_id") % 97 =!= 0),
      boundedEvalCodes(
        Similarity.int8Codes(e.filter(col("vec_id") % 97 === 0)
          .orderBy(col("vec_id")).limit(ContamEvalCap))))

  private val opContamEmbed = Op(
    "contam_embed",
    (s, dir) => contamEmbed(
      Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))),
    // Full oracle since r17 (the ann_quantized template): the serving
    // kernel's math is portable SQL end-to-end — the benchmark side's
    // int8 codes are the embed_quantize max-abs formula, the
    // asymmetric float×int8 cosine is a plain dot product (per-vector
    // scale cancels), round6 BEFORE ranking, and k=1 selection with
    // the kernel's (cos desc, c_id asc) tie-break is one ROW_NUMBER
    // window. Pool and benchmark ids are disjoint by construction
    // (%97 split), so the kernel's cid != qId self-exclusion never
    // fires and the oracle needs no mirror of it.
    Some(s"""
      WITH e AS (
        SELECT vec_id, embedding,
          list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS maxabs
        FROM embeddings),
      evalc AS (
        SELECT vec_id AS c_id,
          CASE WHEN maxabs = 0 THEN [0 for x in embedding]
            ELSE [CAST(ROUND(CAST(x AS DOUBLE) / (maxabs / 127.0)) AS INT)
                  for x in embedding] END AS cq
        FROM e WHERE vec_id % 97 = 0
        ORDER BY vec_id LIMIT $ContamEvalCap),
      s AS (
        SELECT p.vec_id, c.c_id,
          ROUND(list_sum([CAST(p.embedding[i] AS DOUBLE)
                          * CAST(c.cq[i] AS DOUBLE)
                          for i in generate_series(1, len(p.embedding))])
            / (sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              for x in p.embedding]))
               * sqrt(list_sum([CAST(y AS DOUBLE) * CAST(y AS DOUBLE)
                                for y in c.cq]))), 6) AS cos
        FROM (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id % 97 <> 0) p, evalc c)
      SELECT vec_id, c_id AS near_eval_id, cos AS max_cos,
        CAST(cos >= $ContamEmbTau AS BIGINT) AS contaminated
      FROM (
        SELECT vec_id, c_id, cos, ROW_NUMBER() OVER
          (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
        FROM s) WHERE rn = 1"""))

  // ---- mix_doremi: excess-loss domain reweighting ----

  /** EG step size η and smoothing λ — DoReMi's two dials (Xie 2023
    * §3: exponentiated-gradient rate; final weights smoothed toward
    * the reference distribution so no domain collapses to zero). */
  val DoremiEta = 1.0
  val DoremiLambda = 0.5

  /** DoReMi-style domain reweighting from a PROXY loss (Xie 2023,
    * "Doremi: Optimizing data mixtures speeds up language model
    * pretraining"): upweight domains whose proxy loss is above the
    * mixture average — they carry signal the current mixture
    * under-trains — and smooth toward the reference (token-share)
    * weights. The published recipe alternates Group-DRO proxy
    * training with EG weight updates; with a FIXED proxy (here: the
    * corpus unigram LM's per-source cross-entropy, the same
    * model-free proxy dsir/perplexity_filter use) the per-domain loss
    * is static, the EG iteration telescopes, and the fixed point is
    * the closed-form softmax materialized here — one reweighting
    * step, honestly scoped: swapping in a trained proxy's per-domain
    * losses upgrades it to full DoReMi without touching the shape.
    *
    * Shape: ONE corpus token explode into a per-(source, token) count
    * aggregation (map-side combined, checkpointed — it is read for
    * both the global unigram distribution and the per-source loss);
    * everything downstream is vocabulary- or source-sized. The
    * cross-entropy sum is float with a 6dp round (the §5 convention);
    * weights exp/normalize over the vanishing per-source frame via
    * 1-row broadcast totals — scale-free at any corpus size.
    */
  private[graft] def doremi(d: DataFrame): DataFrame = {
    val st = d
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val global = st.groupBy(col("token")).agg(sum(col("cnt")).as("g"))
    val tot = global.agg(sum(col("g")).as("n_total"))
    // per-source unigram cross-entropy under the CORPUS distribution
    val loss = st.join(global, Seq("token"))
      .crossJoin(broadcast(tot))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_toks"),
        (sum(col("cnt") * -log(col("g").cast("double") / col("n_total")))
          / sum(col("cnt"))).as("xent"))
      .localCheckpoint()
    val avg = loss.crossJoin(broadcast(
        loss.agg(sum(col("n_toks")).as("nt"))))
      .agg((sum(col("xent") * col("n_toks")) / first(col("nt"))).as("mean_xent"),
        first(col("nt")).as("nt"))
    val scored = loss.crossJoin(broadcast(avg))
      .withColumn("base_w", col("n_toks").cast("double") / col("nt"))
      .withColumn("raw",
        col("base_w") * exp(lit(DoremiEta) * (col("xent") - col("mean_xent"))))
    scored.crossJoin(broadcast(scored.agg(sum(col("raw")).as("z"))))
      .select(col("source"), col("n_toks"),
        round(col("xent"), 6).as("xent"),
        round(col("base_w"), 6).as("base_w"),
        round(lit(DoremiLambda) * col("raw") / col("z")
          + lit(1.0 - DoremiLambda) * col("base_w"), 6).as("weight"))
  }

  /** The frozen proxy-LM pieces [[graft.streaming.Streams
    * .doremiMonitored]] serves under: the corpus unigram log-probs,
    * the mixture-mean cross-entropy (algebraically the corpus unigram
    * entropy — the token-weighted mean of per-source xents), and the
    * OOV floor (-ln 1/N, the unseen-token smoothing). Derives
    * batch-side because a mixture baseline needs a corpus; the stream
    * applies it frozen (the dsir_select / DsirStore convention). */
  private[graft] def doremiModel(d: DataFrame): (DataFrame, Double, Double) = {
    val global = d
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("g"))
      .localCheckpoint()
    val tot = global.agg(sum(col("g"))).head.getLong(0)
    val lm = global.select(col("token"),
      log(col("g").cast("double") / tot).as("lnp")).localCheckpoint()
    val meanXent = global
      .agg(sum(col("g") * -log(col("g").cast("double") / tot)))
      .head.getDouble(0) / tot
    (lm, meanXent, math.log(1.0 / tot))
  }

  private val opDoremi = Op(
    "mix_doremi",
    (s, dir) => doremi(docs(s, dir)),
    Some(s"""
      WITH st AS (
        SELECT source, u.tok AS token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT source, string_split(text, ' ') AS toks FROM documents),
          UNNEST(toks) AS u(tok)
        WHERE length(u.tok) > 0
        GROUP BY 1, 2),
      g AS (SELECT token, CAST(SUM(cnt) AS BIGINT) AS g FROM st GROUP BY 1),
      t AS (SELECT CAST(SUM(g) AS BIGINT) AS n_total FROM g),
      loss AS (
        SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_toks,
          SUM(cnt * -ln(CAST(g AS DOUBLE) / n_total)) / SUM(cnt) AS xent
        FROM st JOIN g USING (token), t GROUP BY source),
      a AS (SELECT SUM(xent * n_toks) / SUM(n_toks) AS mean_xent,
          CAST(SUM(n_toks) AS BIGINT) AS nt FROM loss),
      sc AS (
        SELECT source, n_toks, xent,
          CAST(n_toks AS DOUBLE) / nt AS base_w,
          CAST(n_toks AS DOUBLE) / nt
            * exp($DoremiEta * (xent - mean_xent)) AS raw
        FROM loss, a),
      z AS (SELECT SUM(raw) AS z FROM sc)
      SELECT source, n_toks, ROUND(xent, 6) AS xent,
        ROUND(base_w, 6) AS base_w,
        ROUND($DoremiLambda * raw / z + ${1.0 - DoremiLambda} * base_w, 6)
          AS weight
      FROM sc, z"""))

  // ---- mix_anneal: the two-phase quality-annealed schedule ----
  // The Llama-3 / MiniCPM practice the mixing ladder was missing: the
  // MAIN phase (1 − AnnealFrac of the token budget) trains on the
  // natural distribution, then the ANNEAL tail upweights high-quality
  // sources — quality data teaches most in the last steps, and
  // burning it uniformly across the run wastes it. Source quality is
  // the corpus-relative contract: distinct-token mass per token in
  // ppm (the dpo_pairs scorer family at source granularity — swap in
  // any trained scorer); the anneal POOL is sources at or above the
  // CORPUS-MEAN quality (a fixed threshold goes stale; the mean is
  // one more 1-row broadcast), and within the pool anneal tokens
  // allocate ∝ n_toks · quality_ppm — both factors exact BIGINTs, so
  // the only float work is the final ROUND(…, 4) (the epochPlan
  // convention). One corpus token scan folding to a per-source frame
  // (vanishing, checkpointed — read three times: totals, pool sum,
  // plan), two 1-row broadcasts; nothing corpus-wide after the scan.
  val AnnealFrac = 0.1

  private[graft] def annealPlan(d: DataFrame): DataFrame = {
    val perSource = d
      .select(col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("toks"),
        size(array_distinct(TextFns.tokens(col("text")))).cast("long")
          .as("dst"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_toks"),
        sum(col("dst")).as("n_distinct"))
      .withColumn("quality_ppm",
        expr("(n_distinct * 1000000) DIV n_toks"))
      .localCheckpoint()
    val tot = perSource.agg(
      sum(col("n_toks")).as("b"),
      expr("(SUM(n_distinct) * 1000000) DIV SUM(n_toks)").as("q_mean"))
    val pooled = perSource.crossJoin(broadcast(tot))
      .withColumn("in_anneal",
        when(col("quality_ppm") >= col("q_mean"), 1L).otherwise(0L))
    val poolSum = pooled.where(col("in_anneal") === 1L)
      .agg(sum(col("n_toks") * col("quality_ppm")).as("pool_mass"))
    pooled.crossJoin(broadcast(poolSum))
      .select(col("source"), col("n_docs"), col("n_toks"),
        col("quality_ppm"), col("in_anneal"),
        round(lit(1.0 - AnnealFrac) * col("n_toks"), 4).as("main_toks"),
        when(col("in_anneal") === 1L,
          round(lit(AnnealFrac) * col("b") *
            (col("n_toks") * col("quality_ppm")) / col("pool_mass"), 4))
          .otherwise(lit(0.0)).as("anneal_toks"))
  }

  private val opAnneal = Op(
    "mix_anneal",
    (s, dir) => annealPlan(docs(s, dir)),
    Some(s"""
      WITH src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks,
          CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS BIGINT)
            AS n_distinct
        FROM documents GROUP BY 1),
      q AS (
        SELECT *, (n_distinct * 1000000) // n_toks AS quality_ppm
        FROM src),
      t AS (
        SELECT CAST(SUM(n_toks) AS BIGINT) AS b,
          (SUM(n_distinct) * 1000000) // SUM(n_toks) AS q_mean
        FROM q),
      p AS (
        SELECT q.*, t.b,
          CASE WHEN quality_ppm >= q_mean THEN 1 ELSE 0 END AS in_anneal
        FROM q, t),
      ps AS (
        SELECT CAST(SUM(n_toks * quality_ppm) AS BIGINT) AS pool_mass
        FROM p WHERE in_anneal = 1)
      SELECT source, n_docs, n_toks,
        CAST(quality_ppm AS BIGINT) AS quality_ppm,
        CAST(in_anneal AS BIGINT) AS in_anneal,
        ROUND(${1.0 - AnnealFrac} * CAST(n_toks AS DOUBLE), 4)
          AS main_toks,
        CASE WHEN in_anneal = 1
          THEN ROUND($AnnealFrac * CAST(b AS DOUBLE)
            * (n_toks * quality_ppm) / pool_mass, 4)
          ELSE 0.0 END AS anneal_toks
      FROM p, ps"""))

  // ---- mix_constrained: the repeat-budget planner ----
  // The data-constrained regime (Muennighoff et al. 2023, "Scaling
  // Data-Constrained Language Models"): when the token budget exceeds
  // the unique corpus, data must REPEAT, and a repeated epoch is
  // worth less than a fresh one — roughly free to ~4 epochs, then
  // decaying fast (MaxEpochs above is that knee). This op answers the
  // regime's operative question — WHERE to spend the repeat budget —
  // with the anneal-pool logic applied to epochs: sources are ranked
  // by quality_ppm (the mix_anneal scorer) and greedily granted up to
  // 4 epochs top-quality-first until the budget (BudgetEpochs × the
  // unique corpus) runs out; everything after the boundary trains
  // once. Epoch value decays on the dyadic half-ladder (epoch k worth
  // 2^(1−k) of a fresh epoch) — the engine-exact conservative
  // stand-in for the paper's fitted R_D* decay (the trace_returns
  // literal-table move): every effective-token mass is then an exact
  // ×8 integer (E∈1..4 → multiplier 8/12/14/15), so effective_toks is
  // one exact dyadic division and efficiency_ppm is pure BIGINT DIV
  // (1e6/8 folded to ×125000 to keep headroom ~2^61 at 10^12-token
  // sources). Greedy boundary via ONE running-sum window over the
  // per-source frame (vanishing rows — the global window is over
  // #sources, not the corpus; same class as epochPlan's broadcast
  // total). One corpus token scan, checkpointed per-source fold,
  // 1-row broadcast, no corpus-wide work after the scan.
  val BudgetEpochs = 2L

  private[graft] def constrainedPlan(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSource = d
      .select(col("source"),
        size(TextFns.tokens(col("text"))).cast("long").as("toks"),
        size(array_distinct(TextFns.tokens(col("text")))).cast("long")
          .as("dst"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_toks"),
        sum(col("dst")).as("n_distinct"))
      .withColumn("quality_ppm",
        expr("(n_distinct * 1000000) DIV n_toks"))
      .localCheckpoint()
    val tot = perSource.agg(sum(col("n_toks")).as("u_total"))
    val byQuality = Window
      .orderBy(col("quality_ppm").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perSource.crossJoin(broadcast(tot))
      .withColumn("b", col("u_total") * BudgetEpochs)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("quality_ppm").desc,
          col("source"))))
      .withColumn("cum", sum(col("n_toks") * 4L).over(byQuality))
      .withColumn("epochs", expr("""
        CASE WHEN cum <= b THEN CAST(4 AS BIGINT)
             WHEN cum - 4 * n_toks >= b THEN CAST(1 AS BIGINT)
             ELSE GREATEST(CAST(1 AS BIGINT),
                           (b - (cum - 4 * n_toks)) DIV n_toks) END"""))
      .withColumn("eff_x8", col("n_toks") * expr(
        "CASE epochs WHEN 1 THEN 8 WHEN 2 THEN 12 WHEN 3 THEN 14 ELSE 15 END"))
      .select(col("source"), col("n_docs"), col("n_toks"),
        col("quality_ppm"), col("rnk").cast("long").as("rnk"),
        col("epochs"),
        (col("n_toks") * col("epochs")).as("raw_toks"),
        (col("eff_x8") / 8.0).as("effective_toks"),
        expr("(eff_x8 * 125000) DIV (n_toks * epochs)")
          .as("efficiency_ppm"))
  }

  private val opConstrained = Op(
    "mix_constrained",
    (s, dir) => constrainedPlan(docs(s, dir)),
    Some(s"""
      WITH src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks,
          CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS BIGINT)
            AS n_distinct
        FROM documents GROUP BY 1),
      q AS (
        SELECT source, n_docs, n_toks,
          (n_distinct * 1000000) // n_toks AS quality_ppm
        FROM src),
      t AS (SELECT CAST(SUM(n_toks) AS BIGINT) * $BudgetEpochs AS b
            FROM q),
      w AS (
        SELECT q.*, t.b,
          ROW_NUMBER() OVER (ORDER BY quality_ppm DESC, source) AS rnk,
          SUM(n_toks * 4) OVER (ORDER BY quality_ppm DESC, source
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM q, t),
      e AS (
        SELECT *,
          CASE WHEN cum <= b THEN 4
               WHEN cum - 4 * n_toks >= b THEN 1
               ELSE GREATEST(1, (b - (cum - 4 * n_toks)) // n_toks) END
            AS epochs
        FROM w),
      x AS (
        SELECT *, n_toks * CASE epochs WHEN 1 THEN 8 WHEN 2 THEN 12
            WHEN 3 THEN 14 ELSE 15 END AS eff_x8
        FROM e)
      SELECT source, n_docs, n_toks,
        CAST(quality_ppm AS BIGINT) AS quality_ppm,
        CAST(rnk AS BIGINT) AS rnk,
        CAST(epochs AS BIGINT) AS epochs,
        CAST(n_toks * epochs AS BIGINT) AS raw_toks,
        eff_x8 / 8.0 AS effective_toks,
        CAST((eff_x8 * 125000) // (n_toks * epochs) AS BIGINT)
          AS efficiency_ppm
      FROM x"""))

  // ---- longctx_mix: length-bucketed context-extension mix ----
  // The data side of context extension (Fu et al. 2024, "Data
  // Engineering for Scaling Language Models to 128K Context";
  // ProLong): the natural corpus is short-heavy, so the extension
  // stage UPSAMPLES long documents — position slots past the old
  // context limit only train when sequences actually reach them.
  // Buckets are integer log2 of n_chars (length(bin(x))−1, the
  // ngram_lm move — exact in both engines); the target mass
  // upweights each bucket LINEARLY IN LOG-LENGTH (∝ n_toks·(b+1),
  // the deterministic stand-in for the paper's per-length-band
  // tuning — swap in measured weights the same way), so target_ppm
  // and the per-bucket upsample factor are pure BIGINT arithmetic:
  // up_x100 = target_ppm·100 DIV max(natural_ppm, 1), both ppm
  // values themselves integer DIVs replayed identically in the
  // oracle. longctx_stitch (Sampling) packs the sequences; this op
  // decides HOW MUCH of each length band the extension stage reads.
  // Scale shape: one corpus token scan folding to ≤ ~40 bucket rows
  // (log2 of the longest doc); one 1-row broadcast of the two
  // totals. Nothing corpus-wide after the scan.
  private[graft] def longctxMix(d: DataFrame): DataFrame = {
    val perBucket = d
      .select(expr("length(bin(greatest(n_chars, 1))) - 1").cast("long")
          .as("bucket"),
        size(TextFns.tokens(col("text"))).cast("long").as("toks"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_toks"))
      .withColumn("w", col("n_toks") * (col("bucket") + 1L))
      .localCheckpoint()
    val tot = perBucket.agg(sum(col("n_toks")).as("tt"),
      sum(col("w")).as("wt"))
    perBucket.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_docs"), col("n_toks"),
        expr("(n_toks * 1000000) DIV tt").as("natural_ppm"),
        expr("(w * 1000000) DIV wt").as("target_ppm"),
        expr("""((w * 1000000) DIV wt) * 100
          DIV GREATEST((n_toks * 1000000) DIV tt, 1)""").as("up_x100"))
  }

  private val opLongctxMix = Op(
    "longctx_mix",
    (s, dir) => longctxMix(docs(s, dir)),
    Some("""
      WITH b AS (
        SELECT CAST(length(bin(greatest(n_chars, 1))) - 1 AS BIGINT)
            AS bucket,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        FROM documents),
      pb AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(toks) AS BIGINT) AS n_toks
        FROM b GROUP BY 1),
      w AS (SELECT *, n_toks * (bucket + 1) AS w FROM pb),
      t AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS tt,
              CAST(SUM(w) AS BIGINT) AS wt FROM w)
      SELECT bucket, n_docs, n_toks,
        CAST((n_toks * 1000000) // tt AS BIGINT) AS natural_ppm,
        CAST((w * 1000000) // wt AS BIGINT) AS target_ppm,
        CAST(((w * 1000000) // wt) * 100
          // GREATEST((n_toks * 1000000) // tt, 1) AS BIGINT) AS up_x100
      FROM w, t"""))

  def ops: Seq[Op] =
    Seq(opSplitSafe, opSplitLeakage, opEpochPlan, opUpsample,
      opContamMinhash, opContamEmbed, opDoremi, opAnneal, opConstrained,
      opLongctxMix)
}
