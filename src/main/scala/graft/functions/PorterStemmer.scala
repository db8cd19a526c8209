package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Porter stemmer — implemented from the published algorithm
  * (M.F. Porter, "An algorithm for suffix stripping", Program 14(3), 1980).
  *
  * The reference pipeline stems every token before stopword filtering and
  * LDA (reference: module/instagram/lda/index.js:39, via the `stem-porter`
  * npm package). Spark has no builtin stemmer, so this is one of the few
  * genuinely custom scalar functions in the engine (SURVEY.md §2.10).
  *
  * Pure function on lowercase ASCII words; non-alphabetic input is
  * returned unchanged. Thread-safe (no shared state) → safe inside
  * codegen'd UDF calls on executors.
  */
object PorterStemmer extends Serializable {

  private def isVowelAt(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** m = number of VC sequences in the stem. */
  private def measure(w: String): Int = {
    var m = 0; var i = 0; val n = w.length
    while (i < n && !isVowelAt(w, i)) i += 1 // skip initial consonants
    while (i < n) {
      while (i < n && isVowelAt(w, i)) i += 1
      if (i < n) { m += 1; while (i < n && !isVowelAt(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    (0 until w.length).exists(isVowelAt(w, _))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      !isVowelAt(w, w.length - 1)

  /** *o — stem ends cvc where second c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowelAt(w, n - 3) && isVowelAt(w, n - 2) && !isVowelAt(w, n - 1) &&
      !"wxy".contains(w.charAt(n - 1))
  }

  private def replaceSuffix(w: String, suffix: String, repl: String, minM: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.substring(0, w.length - suffix.length)
      if (measure(stem) > minM) Some(stem + repl) else Some(w)
    } else None

  def stem(word: String): String = {
    if (word == null) return null
    var w = word
    if (w.length <= 2 || !w.forall(c => c >= 'a' && c <= 'z')) return w

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // Step 1b
    var step1bFlag = false
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else if (w.endsWith("ed") && containsVowel(w.dropRight(2))) {
      w = w.dropRight(2); step1bFlag = true
    } else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) {
      w = w.dropRight(3); step1bFlag = true
    }
    if (step1bFlag) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (endsDoubleConsonant(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (measure(w) == 1 && endsCvc(w)) w += "e"
    }

    // Step 1c
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    longest(step2, w).foreach { case (s, r) => replaceSuffix(w, s, r, 0).foreach(w = _) }

    longest(step3, w).foreach { case (s, r) => replaceSuffix(w, s, r, 0).foreach(w = _) }

    // Step 4 ("ion" additionally requires *S or *T stem)
    longest(step4, w).foreach { case (s, _) =>
      val stem = w.substring(0, w.length - s.length)
      val ionOk = s != "ion" ||
        (stem.nonEmpty && (stem.last == 's' || stem.last == 't'))
      if (measure(stem) > 1 && ionOk) w = stem
    }

    // Step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // Step 5b
    if (measure(w) > 1 && endsDoubleConsonant(w) && w.endsWith("l")) w = w.dropRight(1)

    w
  }

  // Steps 2-4 suffix tables, hoisted to constants: stem() runs once per
  // token inside codegen'd hot loops, and rebuilding these as Maps per
  // call (plus the filter/reduce intermediates of a Map-based longest
  // match) cost dozens of allocations per token. Sorted longest-first,
  // so the FIRST endsWith hit IS the longest match ("search for the
  // longest among the suffixes" — Porter 1980; if its condition fails,
  // no shorter suffix is tried). Equal-length suffixes are mutually
  // exclusive under endsWith, so the within-length order is irrelevant.
  private def byLen(m: (String, String)*): Array[(String, String)] =
    m.sortBy(-_._1.length).toArray
  // Step 2 (m > 0 suffix mappings)
  private val step2 = byLen(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
  // Step 3
  private val step3 = byLen(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")
  // Step 4 (m > 1 suffix removal)
  private val step4 = byLen(
    "al" -> "", "ance" -> "", "ence" -> "", "er" -> "", "ic" -> "",
    "able" -> "", "ible" -> "", "ant" -> "", "ement" -> "", "ment" -> "",
    "ent" -> "", "ion" -> "", "ou" -> "", "ism" -> "", "ate" -> "",
    "iti" -> "", "ous" -> "", "ive" -> "", "ize" -> "")

  private def longest(m: Array[(String, String)], word: String): Option[(String, String)] = {
    var i = 0
    while (i < m.length) {
      if (word.endsWith(m(i)._1)) return Some(m(i))
      i += 1
    }
    None
  }

  /** UTF8String entry point for the codegen'd [[Stem]] expression (called
    * as a static forwarder from generated Java). */
  def stemUTF8(w: UTF8String): UTF8String =
    if (w == null) null else UTF8String.fromString(stem(w.toString))
}
