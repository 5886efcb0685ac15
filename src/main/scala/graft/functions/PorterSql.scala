package graft.functions

/** DuckDB-SQL code generator for [[PorterStemmer]] — emits a CTE
  * cascade that stems a vocabulary column with the exact 1980 Porter
  * rules the Scala kernel applies, so stemmed-token operators
  * (score_rouge1) can carry a FULL hash-checked oracle instead of a
  * rows-only fixture. No stemmer ships with a stock DuckDB (the fts
  * extension is a download), so the oracle inlines the algorithm.
  *
  * The enabling property: Porter's consonant test only looks BACKWARD
  * (`y` classifies off its predecessor), so the consonant flags of any
  * candidate stem are a PREFIX SLICE of the current word's flags — each
  * step computes one `cons` list and evaluates every candidate-suffix
  * condition (`m`, `*v*`, `*o`, double-consonant) against slices of it.
  * `y`-runs resolve by parity from the run head (isCons(y_i) =
  * ¬isCons(i−1) alternates), which keeps the flag list a closed-form
  * `list_transform` instead of a sequential scan. Fuzz-validated
  * against the Scala stemmer on corpus vocab + 5.7k adversarial tokens
  * (suffix soup, y-runs, digits/apostrophes), zero divergence.
  */
object PorterSql {

  private val V = "('a','e','i','o','u')"

  /** Consonant-flag list for string expr `e` (1-based, lambda var i). */
  private def consList(e: String): String = {
    val lastNonY = s"COALESCE(list_max(list_transform(generate_series(1, i-1), k -> " +
      s"CASE WHEN $e[k] = 'y' THEN 0 ELSE k END)), 0)"
    s"list_transform(generate_series(1, length($e)), i -> " +
      s"CASE WHEN $e[i] IN $V THEN false " +
      s"WHEN $e[i] != 'y' THEN true " +
      s"ELSE ((($lastNonY = 0) OR $e[$lastNonY] IN $V) " +
      s"!= (((i - $lastNonY - 1) % 2) = 1)) END)"
  }

  /** Porter measure m over the first `len` flags of cons list `c`. */
  private def mOf(c: String, len: String): String =
    s"len(list_filter(generate_series(2, $len), i -> $c[i] AND NOT $c[i-1]))"

  private def hasVowelOf(c: String, len: String): String =
    s"(len(list_filter(list_slice($c, 1, $len), c -> NOT c)) > 0)"

  private def endsDc(w: String, c: String, len: String): String =
    s"($len >= 2 AND $w[$len] = $w[$len-1] AND $c[$len])"

  private def cvcOf(w: String, c: String, len: String): String =
    s"($len >= 3 AND $c[$len-2] AND NOT $c[$len-1] AND $c[$len] " +
      s"AND $w[$len] NOT IN ('w','x','y'))"

  /** First-matching-suffix table application (steps 2/3): the CASE
    * chain mirrors the Scala `rules` — a matched suffix whose stem
    * fails the measure test ENDS the step unchanged.
    */
  private def rulesCase(w: String, c: String, minM: Int,
      table: Seq[(String, String)]): String = {
    val whens = table.map { case (suf, rep) =>
      val k = suf.length
      s"WHEN ends_with($w, '$suf') THEN " +
        s"CASE WHEN ${mOf(c, s"length($w)-$k")} > $minM " +
        s"THEN left($w, length($w)-$k) || '$rep' ELSE $w END"
    }
    whens.mkString("CASE ", " ", s" ELSE $w END")
  }

  private val step2 = Seq(
    "ational" -> "ate", "ization" -> "ize", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "tional" -> "tion",
    "biliti" -> "ble", "ation" -> "ate", "alism" -> "al", "aliti" -> "al",
    "iviti" -> "ive", "entli" -> "ent", "ousli" -> "ous", "anci" -> "ance",
    "enci" -> "ence", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "ator" -> "ate", "eli" -> "e")

  private val step3 = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4 = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ion",
    "ism", "ate", "iti", "ous", "ive", "ize", "ou", "al", "er", "ic")

  private def step4Case(w: String, c: String): String = {
    val whens = step4.map { suf =>
      val k = suf.length
      val base = s"${mOf(c, s"length($w)-$k")} > 1"
      val cond =
        if (suf == "ion")
          s"$base AND length($w) > $k AND $w[length($w)-$k] IN ('s','t')"
        else base
      s"WHEN ends_with($w, '$suf') THEN " +
        s"CASE WHEN $cond THEN left($w, length($w)-$k) ELSE $w END"
    }
    whens.mkString("CASE ", " ", s" ELSE $w END")
  }

  /** CTE block stemming `src`(tok) — callers append `,$ctes` after
    * their own CTEs and read `stemmed`(tok, st). `src` must hold only
    * tokens longer than 3 chars (the rouge tokenizer guard); shorter
    * tokens pass through outside.
    */
  def ctes(src: String): String = {
    val L = "length(w)"
    s"""
  s0 AS (SELECT tok, tok AS w FROM $src),
  s0c AS (SELECT tok, w, ${consList("w")} AS c FROM s0),
  s1a AS (SELECT tok,
    CASE WHEN ends_with(w,'sses') THEN left(w, $L-2)
         WHEN ends_with(w,'ies') THEN left(w, $L-2)
         WHEN NOT ends_with(w,'ss') AND ends_with(w,'s') THEN left(w, $L-1)
         ELSE w END AS w FROM s0c),
  s1ac AS (SELECT tok, w, ${consList("w")} AS c FROM s1a),
  s1b1 AS (SELECT tok,
    CASE WHEN ends_with(w,'eed') THEN
           CASE WHEN ${mOf("c", s"$L-3")} > 0 THEN left(w, $L-1) ELSE w END
         WHEN ends_with(w,'ed') AND ${hasVowelOf("c", s"$L-2")} THEN left(w, $L-2)
         WHEN ends_with(w,'ing') AND ${hasVowelOf("c", s"$L-3")} THEN left(w, $L-3)
         ELSE w END AS w,
    (NOT ends_with(w,'eed') AND
     ((ends_with(w,'ed') AND ${hasVowelOf("c", s"$L-2")}) OR
      (ends_with(w,'ing') AND ${hasVowelOf("c", s"$L-3")}))) AS fed
    FROM s1ac),
  s1b1c AS (SELECT tok, w, fed, ${consList("w")} AS c FROM s1b1),
  s1b2 AS (SELECT tok,
    CASE WHEN NOT fed THEN w
         WHEN ends_with(w,'at') OR ends_with(w,'bl') OR ends_with(w,'iz') THEN w || 'e'
         WHEN ${endsDc("w", "c", L)} AND w[$L] NOT IN ('l','s','z') THEN left(w, $L-1)
         WHEN ${mOf("c", L)} = 1 AND ${cvcOf("w", "c", L)} THEN w || 'e'
         ELSE w END AS w FROM s1b1c),
  s1b2c AS (SELECT tok, w, ${consList("w")} AS c FROM s1b2),
  s1c AS (SELECT tok,
    CASE WHEN ends_with(w,'y') AND ${hasVowelOf("c", s"$L-1")}
         THEN left(w, $L-1) || 'i' ELSE w END AS w FROM s1b2c),
  s1cc AS (SELECT tok, w, ${consList("w")} AS c FROM s1c),
  s2 AS (SELECT tok, ${rulesCase("w", "c", 0, step2)} AS w FROM s1cc),
  s2c AS (SELECT tok, w, ${consList("w")} AS c FROM s2),
  s3 AS (SELECT tok, ${rulesCase("w", "c", 0, step3)} AS w FROM s2c),
  s3c AS (SELECT tok, w, ${consList("w")} AS c FROM s3),
  s4 AS (SELECT tok, ${step4Case("w", "c")} AS w FROM s3c),
  s4c AS (SELECT tok, w, ${consList("w")} AS c FROM s4),
  s5a AS (SELECT tok,
    CASE WHEN ends_with(w,'e') AND
              (${mOf("c", s"$L-1")} > 1 OR
               (${mOf("c", s"$L-1")} = 1 AND NOT ${cvcOf("w", "c", s"$L-1")}))
         THEN left(w, $L-1) ELSE w END AS w FROM s4c),
  s5ac AS (SELECT tok, w, ${consList("w")} AS c FROM s5a),
  stemmed AS (SELECT tok,
    CASE WHEN ${mOf("c", L)} > 1 AND ${endsDc("w", "c", L)} AND w[$L] = 'l'
         THEN left(w, $L-1) ELSE w END AS st FROM s5ac)"""
  }
}
