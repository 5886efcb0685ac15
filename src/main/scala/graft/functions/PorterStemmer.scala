package graft.functions

/** Porter's suffix-stripping algorithm (M.F. Porter, "An algorithm for
  * suffix stripping", Program 14(3), 1980 — the public, de-facto
  * standard stemmer). Used by score_rougeL to APPROXIMATE the
  * reference's `rouge_scorer(..., use_stemmer=True)` (reference
  * hanchen_recomp.py:77), which stems tokens longer than 3 chars before
  * the LCS — see [[stemToken]] for that guard.
  *
  * This is the original published algorithm (steps 1a–5b, longest
  * matching suffix per step). The reference's NLTK stemmer runs in its
  * NLTK_EXTENSIONS mode, which departs from the paper on a small set of
  * special-cased shapes — e.g. "dying"→"die" where the 1980 rules give
  * "dy" (pinned in the spec) — so score_rougeL can differ from the
  * NLTK-backed scorer on tokens hitting those extensions; identical
  * stems on both sides still yield identical ROUGE-L. Pure function on
  * lowercase ASCII-ish tokens; non-letter content passes through
  * untouched by virtue of the consonant/vowel tests.
  */
object PorterStemmer {

  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** The measure m of [C](VC)^m[V]. */
  private def m(w: String): Int = {
    var n = 0
    var i = 0
    val len = w.length
    while (i < len && isCons(w, i)) i += 1
    while (i < len) {
      while (i < len && !isCons(w, i)) i += 1
      if (i < len) {
        n += 1
        while (i < len && isCons(w, i)) i += 1
      }
    }
    n
  }

  private def hasVowel(w: String): Boolean = {
    var i = 0
    while (i < w.length) {
      if (!isCons(w, i)) return true
      i += 1
    }
    false
  }

  private def endsDoubleCons(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isCons(w, w.length - 1)

  /** *o: ends cvc where the final c is not w, x or y. */
  private def cvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && isCons(w, n - 3) && !isCons(w, n - 2) && isCons(w, n - 1) &&
      "wxy".indexOf(w.charAt(n - 1)) < 0
  }

  /** Longest-suffix rule table application: first (length-desc sorted)
    * suffix that matches AND whose stem passes `cond` is replaced.
    */
  private def rules(w: String, minM: Int, table: Seq[(String, String)]): String = {
    for ((suf, rep) <- table) {
      if (w.endsWith(suf)) {
        val stem = w.substring(0, w.length - suf.length)
        return if (m(stem) > minM) stem + rep else w
      }
    }
    w
  }

  // length-desc within each table so the longest suffix wins
  private val step2Table = Seq(
    "ational" -> "ate", "ization" -> "ize", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "tional" -> "tion",
    "biliti" -> "ble", "ation" -> "ate", "alism" -> "al", "aliti" -> "al",
    "iviti" -> "ive", "entli" -> "ent", "ousli" -> "ous", "anci" -> "ance",
    "enci" -> "ence", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "ator" -> "ate", "eli" -> "e")

  private val step3Table = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4Suffixes = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ion",
    "ism", "ate", "iti", "ous", "ive", "ize", "ou", "al", "er", "ic")

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // step 1b
    if (w.endsWith("eed")) {
      if (m(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else {
      val afterEd =
        if (w.endsWith("ed") && hasVowel(w.dropRight(2))) { w = w.dropRight(2); true }
        else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) { w = w.dropRight(3); true }
        else false
      if (afterEd) {
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
        else if (endsDoubleCons(w) && "lsz".indexOf(w.last) < 0) w = w.dropRight(1)
        else if (m(w) == 1 && cvc(w)) w += "e"
      }
    }

    // step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // steps 2-3 (m > 0), step 4 (m > 1)
    w = rules(w, 0, step2Table)
    w = rules(w, 0, step3Table)
    // step 4 applies the LONGEST matching suffix only — if its
    // condition fails, the step ends without trying shorter suffixes
    var step4Done = false
    for (suf <- step4Suffixes) {
      if (!step4Done && w.endsWith(suf)) {
        step4Done = true
        val stem = w.substring(0, w.length - suf.length)
        val ok = m(stem) > 1 &&
          (suf != "ion" || (stem.nonEmpty && (stem.last == 's' || stem.last == 't')))
        if (ok) w = stem
      }
    }

    // step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      if (m(stem) > 1 || (m(stem) == 1 && !cvc(stem))) w = stem
    }
    // step 5b
    if (m(w) > 1 && endsDoubleCons(w) && w.last == 'l') w = w.dropRight(1)
    w
  }

  /** rouge_scorer's tokenizer guard: only tokens longer than 3 chars
    * are stemmed (google-research rouge/tokenize.py).
    */
  def stemToken(tok: String): String =
    if (tok.length > 3) stem(tok) else tok
}
