package graft.plans

/** DuckDB SQL fragment generators that replay Spark's XXH64 (seed 42)
  * for the hash-family oracles — the r17 move that converts the
  * signature operators (dedup_simhash, dedup_minhash, embed_hash)
  * from rows-only to full DuckDB-hash-proven queries.
  *
  * Scope, stated plainly: this replays the xxHash64 SMALL-INPUT path
  * (< 32 bytes, no 4-lane stripes) over ASCII strings — byte values
  * are read as `unicode(s[i])`, which equals the byte only for
  * single-byte code points. The test corpora satisfy both bounds by
  * construction (tokens ≤ 8 bytes, 3-token shingles ≤ 26 bytes, pure
  * ASCII — measured, not assumed); an input outside them would make
  * the oracle DISAGREE with the engine and fail the driver compare
  * loudly, which is the correct failure mode for a correctness
  * oracle.
  *
  * Arithmetic discipline (the PlantedSql convention): 64-bit wrap via
  * HUGEINT mod-2⁶⁴ with a 32-bit split multiply (a full 64×64 product
  * overflows even HUGEINT); rotations as disjoint shift halves;
  * xor via UBIGINT casts (carries the 64-bit pattern exactly).
  * Sequential chunk/tail folds ride `list_reduce(list_prepend(h0,
  * xs), …)` — DuckDB's reduce seeds from the first element, so the
  * init state is prepended; an empty input list degenerates to h0,
  * which is exactly xxHash64's n=0 shape. Verified equal to Spark's
  * `xxhash64()` on empty/1..31-byte inputs including every
  * chunk/4-byte/tail boundary (and the three consuming oracles
  * hash-pass end-to-end at sf0.01).
  */
private[graft] object OracleSql {
  val M64 = "18446744073709551616::HUGEINT"
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  /** (a·b) mod 2⁶⁴ for HUGEINT-range a < 2⁶⁴ (b any 64-bit constant
    * or column): split a at 32 bits so no partial product exceeds
    * 2⁹⁶. */
  def mul(a: String, b: String): String =
    s"(((($a) % 4294967296::HUGEINT) * $b + (((($a) // 4294967296::HUGEINT)" +
      s" * $b) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % $M64)"

  /** rotl64(x, r) as the sum of the two disjoint shift halves. */
  def rot(x: String, r: Int): String = {
    require(r > 0 && r < 64, s"rot distance $r out of (0, 64)")
    s"((($x) * ${1L << r}::HUGEINT) % $M64 + ($x) // ${java.lang.Long
      .toUnsignedString(1L << (64 - r))}::HUGEINT)"
  }

  /** 64-bit xor of two unsigned HUGEINT values via UBIGINT. */
  def xr(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  /** One 8-byte round: h ← rotl27(h ⊕ rotl31(c·P2)·P1)·P1 + P4. */
  def chunkStep(h: String, c: String): String =
    s"(${mul(rot(xr(h, mul(rot(mul(c, P2), 31), P1)), 27), P1)} + $P4) % $M64"

  private def fourStep(h: String, v: String): String =
    s"(${mul(rot(xr(h, mul(v, P1)), 23), P2)} + $P3) % $M64"

  private def byteStep(h: String, b: String): String =
    mul(rot(xr(h, s"(($b) * $P5) % $M64"), 11), P1)

  /** Signed-BIGINT reinterpretation of an unsigned HUGEINT word. */
  def toSigned(u: String): String =
    s"CAST(CASE WHEN ($u) >= 9223372036854775808::HUGEINT " +
      s"THEN ($u) - $M64 ELSE ($u) END AS BIGINT)"

  /** Unsigned HUGEINT reinterpretation of a signed BIGINT word. */
  def toUnsigned(l: String): String =
    s"(CASE WHEN ($l) < 0 THEN CAST(($l) AS HUGEINT) + $M64 " +
      s"ELSE CAST(($l) AS HUGEINT) END)"

  /** CTE chain hashing VARCHAR column `sCol` (ASCII, < 32 bytes) of
    * `srcCte` rows to a signed-BIGINT `outCol` in `outCte`, carrying
    * `keys` through. Rows need not be key-unique — the chain is
    * strictly per-row. `prefix` namespaces the intermediate CTEs.
    */
  def xxh64Cte(srcCte: String, keys: Seq[String], sCol: String,
      outCte: String, outCol: String, prefix: String): String = {
    val ks = keys.mkString(", ")
    val p = prefix
    val le32 =
      "(bs[8*nc+1] + bs[8*nc+2]*256 + bs[8*nc+3]*65536 + bs[8*nc+4]*16777216)"
    s"""${p}_b AS (
        SELECT $ks, CAST(octet_length(encode($sCol)) AS HUGEINT) AS n,
          [CAST(unicode($sCol[i]) AS HUGEINT)
           for i in generate_series(1, length($sCol))] AS bs
        FROM $srcCte
      ), ${p}_c AS (
        SELECT $ks, n, bs, CAST(n // 8 AS BIGINT) AS nc,
          [bs[8*k-7] + bs[8*k-6]*256 + bs[8*k-5]*65536 + bs[8*k-4]*16777216
           + bs[8*k-3]*4294967296 + bs[8*k-2]*1099511627776
           + bs[8*k-1]*281474976710656 + bs[8*k]*72057594037927936
           for k in generate_series(1, CAST(n // 8 AS BIGINT))] AS chunks
        FROM ${p}_b
      ), ${p}_h1 AS (
        SELECT $ks, n, bs, nc,
          list_reduce(list_prepend((42::HUGEINT + $P5 + n) % $M64, chunks),
            (h, c) -> ${chunkStep("h", "c")}) AS h
        FROM ${p}_c
      ), ${p}_h2 AS (
        SELECT $ks, n, bs, nc,
          CASE WHEN n % 8 >= 4 THEN ${fourStep("h", le32)} ELSE h END AS h,
          CASE WHEN n % 8 >= 4 THEN 8*nc + 4 ELSE 8*nc END AS toff
        FROM ${p}_h1
      ), ${p}_h3 AS (
        SELECT $ks,
          list_reduce(list_prepend(h, bs[toff+1:]),
            (h, b) -> ${byteStep("h", "b")}) AS h
        FROM ${p}_h2
      ), ${p}_a1 AS (
        SELECT $ks, ${mul(xr("h", "h // 8589934592::HUGEINT"), P2)} AS h
        FROM ${p}_h3
      ), ${p}_a2 AS (
        SELECT $ks, ${mul(xr("h", "h // 536870912::HUGEINT"), P3)} AS h
        FROM ${p}_a1
      ), $outCte AS (
        SELECT $ks, ${toSigned(xr("h", "h // 4294967296::HUGEINT"))}
          AS $outCol
        FROM ${p}_a2
      )"""
  }

  /** CTE chain for Spark's `XXH64.hashLong(l, seed)` — xxHash64 of
    * the 8 LE bytes of signed-BIGINT `lCol` seeded by the unsigned
    * HUGEINT column `seedCol` (one chunk round + the final
    * avalanche). Emits `outCte` carrying `keys` plus unsigned `h`,
    * so applications CHAIN: the minhash band fold is four of these
    * with each stage's `h` feeding the next stage's seed.
    */
  def hashLongCte(srcCte: String, keys: Seq[String], lCol: String,
      seedCol: String, outCte: String, prefix: String): String = {
    val ks = keys.mkString(", ")
    val p = prefix
    val h1 = chunkStep(s"(($seedCol) + $P5 + 8) % $M64", toUnsigned(lCol))
    s"""${p}_h1 AS (
        SELECT $ks, $h1 AS h FROM $srcCte
      ), ${p}_a1 AS (
        SELECT $ks, ${mul(xr("h", "h // 8589934592::HUGEINT"), P2)} AS h
        FROM ${p}_h1
      ), ${p}_a2 AS (
        SELECT $ks, ${mul(xr("h", "h // 536870912::HUGEINT"), P3)} AS h
        FROM ${p}_a1
      ), $outCte AS (
        SELECT $ks, ${xr("h", "h // 4294967296::HUGEINT")} AS h
        FROM ${p}_a2
      )"""
  }

  /** CTE chain computing the full per-row MinHash signature pipeline
    * from a `srcCte(idCol, text)` frame — the shared replay of
    * [[SignatureKernels.minhashAll]] that every minhash-family oracle
    * composes (dedup_minhash, contam_minhash, dedup_incr_minhash,
    * dedup_pipeline, split_leakage): exact-byte 3-token shingles (a
    * < 3-token row's single whole-text shingle equals its text),
    * per-shingle xxHash64, the 32 rotate/xor family minima under
    * SIGNED long comparison (the kernel's Long.MaxValue fold), and
    * the 8 band values as the kernel's exact left fold — xxh64 of the
    * band index's decimal string, then four chained
    * [[hashLongCte]] rounds over the band's minima. Emits
    * `{prefix}_bandvals(idCol, band_id, band_val)` and, when
    * `withDigest`, `{prefix}_sigd(idCol, sig_digest)` over signed
    * decimal strings.
    */
  def sigCtes(srcCte: String, idCol: String, prefix: String,
      withDigest: Boolean = false): String = {
    val p = prefix
    val dig = if (withDigest) s""", ${p}_sigd AS (
        SELECT $idCol,
          md5(string_agg(CAST(mn AS VARCHAR), ',' ORDER BY i)) AS sig_digest
        FROM ${p}_mins GROUP BY $idCol
      )""" else ""
    s"""${p}_t AS (
        SELECT $idCol, text, string_split(text, ' ') AS toks FROM $srcCte
      ), ${p}_sh AS (
        SELECT $idCol,
          CASE WHEN len(toks) >= 3
            THEN toks[k] || ' ' || toks[k+1] || ' ' || toks[k+2]
            ELSE text END AS sh
        FROM ${p}_t, UNNEST(generate_series(1,
          CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 1 END)) AS g(k)
      ), ${xxh64Cte(s"${p}_sh", Seq(idCol), "sh", s"${p}_shashed", "bh",
        s"${p}xs")},
      ${p}_fam AS (
        SELECT * FROM (VALUES $familyRows) v(i, sl, cst)
      ), ${p}_mins AS (
        SELECT $idCol, i, MIN(${toSigned("r")}) AS mn
        FROM (
          SELECT s.$idCol, f.i,
            ${xr(s"((u * f.sl) % $M64 + u // ($M64 // f.sl))", "f.cst")} AS r
          FROM (SELECT $idCol, ${toUnsigned("bh")} AS u
                FROM ${p}_shashed) s
          CROSS JOIN ${p}_fam f)
        GROUP BY $idCol, i
      ), ${p}_bstr AS (
        SELECT unnest(range(8)) AS band_id,
          CAST(unnest(range(8)) AS VARCHAR) AS bs
      ), ${xxh64Cte(s"${p}_bstr", Seq("band_id"), "bs", s"${p}_bseed0",
        "bh0", s"${p}xb")},
      ${p}_bseed AS (
        SELECT band_id, ${toUnsigned("bh0")} AS h0 FROM ${p}_bseed0
      ), ${p}_bwide0 AS (
        SELECT m.$idCol, b.band_id, b.h0,
          MAX(CASE WHEN m.i = b.band_id * 4 THEN m.mn END) AS m1,
          MAX(CASE WHEN m.i = b.band_id * 4 + 1 THEN m.mn END) AS m2,
          MAX(CASE WHEN m.i = b.band_id * 4 + 2 THEN m.mn END) AS m3,
          MAX(CASE WHEN m.i = b.band_id * 4 + 3 THEN m.mn END) AS m4
        FROM ${p}_mins m JOIN ${p}_bseed b ON m.i // 4 = b.band_id
        GROUP BY m.$idCol, b.band_id, b.h0
      ), ${hashLongCte(s"${p}_bwide0",
        Seq(idCol, "band_id", "m2", "m3", "m4"), "m1", "h0",
        s"${p}_bw1", s"${p}l1")},
      ${hashLongCte(s"${p}_bw1", Seq(idCol, "band_id", "m3", "m4"),
        "m2", "h", s"${p}_bw2", s"${p}l2")},
      ${hashLongCte(s"${p}_bw2", Seq(idCol, "band_id", "m4"),
        "m3", "h", s"${p}_bw3", s"${p}l3")},
      ${hashLongCte(s"${p}_bw3", Seq(idCol, "band_id"),
        "m4", "h", s"${p}_bw4", s"${p}l4")},
      ${p}_bandvals AS (
        SELECT $idCol, band_id, ${toSigned("h")} AS band_val FROM ${p}_bw4
      )$dig"""
  }

  /** The 32 minhash families as an inline VALUES table
    * `(i, sl, cst)`: family index, the rotl-by-i multiplier 2^i, and
    * the xorshift seed constant — the same algorithm constants
    * [[SignatureKernels.seedConsts]] compiles in, inlined the way the
    * LSH oracle inlines its hyperplane-formula constants.
    */
  def familyRows: String =
    SignatureKernels.seedConsts.zipWithIndex.map { case (c, i) =>
      s"($i, ${java.lang.Long.toUnsignedString(1L << i)}::HUGEINT, " +
        s"${java.lang.Long.toUnsignedString(c)}::HUGEINT)"
    }.mkString(", ")
}
