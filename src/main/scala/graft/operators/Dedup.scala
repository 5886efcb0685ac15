package graft.operators

import graft.{Op, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data curation
  * (SURVEY.md §2). Scale design: signature computation is NARROW
  * (per-doc column expressions); the only shuffles are (a) the
  * band-bucket exchange whose volume is a small constant × row count
  * and (b) the in-bucket self-join, which never degenerates into a
  * cross product because bucket keys partition the space.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** 3-token shingles; docs shorter than 3 tokens contribute one
    * whole-text shingle.
    */
  private val shingleExpr =
    """CASE WHEN size(toks) >= 3
         THEN transform(sequence(0, size(toks)-3), i -> array_join(slice(toks, i+1, 3), ' '))
         ELSE array(text) END"""

  private[graft] def withShingles(d: DataFrame): DataFrame =
    d.withColumn("toks", TextFns.tokens(col("text")))
      .withColumn("shingles", expr(shingleExpr))

  // ---- dedup_exact: content-hash groupBy (one shuffle) ----
  private val opExact = Op(
    "dedup_exact",
    (s, dir) =>
      docs(s, dir)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_id")),
    Some("""
      SELECT md5(text) AS content_hash, COUNT(*) AS n_copies,
        MIN(doc_id) AS keeper_id
      FROM documents GROUP BY 1"""))

  // ---- dedup_minhash: MinHash signatures + LSH banding ----
  // 32 hash functions (seeded xxhash64 over shingles), 8 bands × 4 rows.
  // Per-doc output (signature digest + candidate count) so the result is
  // defined even on a duplicate-free corpus.
  private val opMinhash = Op(
    "dedup_minhash",
    (s, dir) => {
      val base = withShingles(docs(s, dir))
        .withColumn("sig", expr(
          "transform(sequence(0, 31), h -> array_min(transform(shingles, s2 -> xxhash64(cast(h AS string), s2))))"))
        .withColumn("bands", expr(
          "transform(sequence(0, 7), b -> xxhash64(cast(b AS string), slice(sig, b*4 + 1, 4)))"))
      val bandRows = base.select(col("doc_id"), explode(col("bands")).as("band_val"))
      val pairs = bandRows.as("x")
        .join(bandRows.as("y"),
          col("x.band_val") === col("y.band_val") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      val cand = pairs.select(col("a").as("doc_id"))
        .union(pairs.select(col("b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup_candidates"))
      base.select(col("doc_id"),
          size(col("shingles")).cast("long").as("n_shingles"),
          md5(concat_ws(",", expr("transform(sig, x -> cast(x AS string))")))
            .as("sig_digest"))
        .join(cand, Seq("doc_id"), "left")
        .withColumn("n_dup_candidates",
          coalesce(col("n_dup_candidates"), lit(0L)))
    },
    None)

  // ---- dedup_simhash: 64-bit SimHash + 16-bit-band hamming dedup ----
  private val opSimhash = Op(
    "dedup_simhash",
    (s, dir) => {
      val base = docs(s, dir)
        .withColumn("toks", TextFns.tokens(col("text")))
        .withColumn("tok_hashes", expr("transform(toks, t -> xxhash64(t))"))
        .withColumn("bits", expr(
          """transform(sequence(0, 63), b ->
               CASE WHEN size(filter(tok_hashes, h -> (shiftright(h, b) & 1) = 1)) * 2 > size(tok_hashes)
                    THEN 1L ELSE 0L END)"""))
        // pack via shift+OR — acc*2+bit would ANSI-overflow at bit 63
        .withColumn("simhash", expr(
          "aggregate(zip_with(bits, sequence(0, 63), (bit, i) -> shiftleft(bit, i)), 0L, (acc, x) -> acc | x)"))
        .select(col("doc_id"), col("simhash"))
      // 4 bands of 16 bits: near-dups (hamming <= 8) agree on >= 1 band
      // with high probability; only same-band pairs are compared.
      val bands = base.withColumn("band_id", explode(sequence(lit(0), lit(3))))
        .withColumn("band_key",
          expr("(shiftright(simhash, band_id * 16) & 65535)"))
      val pairs = bands.as("x")
        .join(bands.as("y"),
          col("x.band_id") === col("y.band_id") &&
            col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 8)
      val perDoc = pairs.select(col("a").as("doc_id"), col("hamming"))
        .union(pairs.select(col("b").as("doc_id"), col("hamming")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_near_dups"), min("hamming").as("min_hamming"))
      base.join(perDoc, Seq("doc_id"), "left")
        .withColumn("n_near_dups", coalesce(col("n_near_dups"), lit(0L)))
        .withColumn("min_hamming", coalesce(col("min_hamming"), lit(-1L)))
    },
    None)

  // ---- ngram_jaccard: exact 3-gram set Jaccard on candidate pairs ----
  // (deterministic consecutive-doc pairing so the oracle is ANSI SQL).
  private val opJaccard = Op(
    "ngram_jaccard",
    (s, dir) => {
      val sh = withShingles(docs(s, dir))
        .select(col("doc_id"), array_distinct(col("shingles")).as("sset"))
      val a = sh.select(col("doc_id"), col("sset").as("sa"))
      val b = sh.select((col("doc_id") - 1).as("doc_id"), col("sset").as("sb"))
      a.join(b, "doc_id")
        .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .withColumn("n_union",
          (size(col("sa")) + size(col("sb"))).cast("long") - col("n_inter"))
        .select(col("doc_id"), col("n_inter"), col("n_union"),
          round(col("n_inter") / col("n_union"), 6).as("jaccard"))
    },
    Some("""
      WITH sh AS (
        SELECT doc_id,
          list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3
            THEN [array_to_string(list_slice(string_split(text, ' '), i+1, i+3), ' ')
                  for i in generate_series(0, len(string_split(text, ' ')) - 3)]
            ELSE [text] END) AS sset
        FROM documents)
      SELECT a.doc_id AS doc_id,
        CAST(len(list_intersect(a.sset, b.sset)) AS BIGINT) AS n_inter,
        CAST(len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)) AS BIGINT) AS n_union,
        ROUND(len(list_intersect(a.sset, b.sset))
          / (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset))), 6) AS jaccard
      FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1"""))

  val ops: Seq[Op] = Seq(opExact, opMinhash, opSimhash, opJaccard)
}
