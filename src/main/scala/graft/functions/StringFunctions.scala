package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** String-distance and tokenization toolkit (the reference's NLP tools:
  * matcher nlptools/distance/OntoSimDistanceMetrics.scala:23-32,
  * nlptools/tokenizer/StringTokenizer.scala:25-77,
  * nlptools/tokenizer/PorterStemmer.scala). Pure Scala implementations,
  * exposed as UDFs. These run on column *names* (header metadata, tiny
  * cardinality) in the matcher path, so UDF overhead is irrelevant; value
  * -level paths use built-in `levenshtein`/`regexp_*` instead.
  */
object StringFunctions {

  // ---------- distances ----------

  /** Levenshtein edit distance (iterative two-row DP). */
  def levenshtein(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    val curr = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      curr(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = curr.clone(); j = 0
      i += 1
    }
    prev(b.length)
  }

  /** Needleman-Wunsch global-alignment distance: gap penalty 1, mismatch 1,
    * match 0 — normalized to [0,1] by max length. */
  def needlemanWunsch(a: String, b: String): Double = {
    val (x, y) = (a.toLowerCase, b.toLowerCase)
    if (x.isEmpty && y.isEmpty) return 0.0
    val m = Array.ofDim[Int](x.length + 1, y.length + 1)
    for (i <- 0 to x.length) m(i)(0) = i
    for (j <- 0 to y.length) m(0)(j) = j
    for (i <- 1 to x.length; j <- 1 to y.length) {
      val cost = if (x(i - 1) == y(j - 1)) 0 else 1
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + cost)
    }
    m(x.length)(y.length).toDouble / math.max(x.length, y.length)
  }

  /** Jaro similarity in [0,1]. */
  def jaro(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aM = new Array[Boolean](a.length)
    val bM = new Array[Boolean](b.length)
    var matches = 0
    for (i <- a.indices) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a(i) == b(j)) { aM(i) = true; bM(j) = true; matches += 1; found = true }
        j += 1
      }
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    for (i <- a.indices if aM(i)) {
      while (!bM(k)) k += 1
      if (a(i) != b(k)) transpositions += 1
      k += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - transpositions / 2.0) / m) / 3.0
  }

  /** Jaro-Winkler similarity (prefix scale 0.1, max prefix 4). */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    val prefix = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
    j + prefix * 0.1 * (1 - j)
  }

  /** Character n-gram distance: 1 - Jaccard over n-gram sets. */
  def ngramDistance(a: String, b: String, n: Int): Double = {
    def grams(s: String): Set[String] =
      if (s.length < n) Set(s) else s.toLowerCase.sliding(n).toSet
    val (ga, gb) = (grams(a), grams(b))
    if (ga.isEmpty && gb.isEmpty) 0.0
    else 1.0 - ga.intersect(gb).size.toDouble / ga.union(gb).size
  }

  // ---------- tokenization ----------

  /** Compact embedded dictionary for compound-word splitting (the
    * reference loads an external word list; we embed a minimal set
    * covering schema-name vocabulary). */
  val dictionary: Set[String] = Set(
    "account", "address", "amount", "balance", "birth", "brand", "category",
    "city", "class", "code", "comment", "company", "cost", "country",
    "county", "customer", "data", "date", "day", "description", "discount",
    "email", "event", "extended", "fax", "first", "flag", "home", "house",
    "id", "identifier", "key", "label", "last", "line", "item", "market",
    "middle", "mobile", "month", "name", "nation", "number", "order",
    "part", "phone", "post", "price", "priority", "product", "quantity",
    "region", "retail", "return", "segment", "ship", "size", "status",
    "street", "supplier", "supply", "tax", "text", "time", "title", "total",
    "type", "user", "value", "year", "zip")

  /** Header-name tokenizer: camelCase split -> non-alphanumeric split ->
    * lowercase -> dictionary-based compound split (longest-match
    * recursion, memoized per JVM). */
  def tokenize(name: String): Seq[String] = {
    val camel = name.replaceAll("([a-z0-9])([A-Z])", "$1 $2")
    val rough = camel.split("[^A-Za-z0-9]+").filter(_.nonEmpty).map(_.toLowerCase)
    rough.flatMap(compoundSplit).toSeq
  }

  private val compoundCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  /** Split a lowercase token into dictionary words (longest-prefix-first
    * recursion); unknown remainders are kept as-is. */
  def compoundSplit(token: String): Seq[String] = {
    val cached = compoundCache.get(token)
    if (cached != null) return cached
    def go(s: String): Option[List[String]] =
      if (s.isEmpty) Some(Nil)
      else (math.min(s.length, 20) to 1 by -1).collectFirst(Function.unlift { l =>
        val head = s.substring(0, l)
        if (dictionary.contains(head)) go(s.substring(l)).map(head :: _) else None
      })
    val out = if (dictionary.contains(token)) Seq(token)
    else go(token).getOrElse(List(token))
    compoundCache.put(token, out)
    out
  }

  /** Porter stemmer (classic 5-step algorithm, standard definition). */
  def porterStem(word: String): String = {
    if (word.length < 3) return word.toLowerCase
    var w = word.toLowerCase
    def isVowel(s: String, i: Int): Boolean = s(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => true
      case 'y' => i > 0 && !isVowel(s, i - 1)
      case _ => false
    }
    def measure(s: String): Int = {
      var m = 0; var i = 0
      while (i < s.length && !isVowel(s, i)) i += 1
      while (i < s.length) {
        while (i < s.length && isVowel(s, i)) i += 1
        if (i < s.length) { m += 1; while (i < s.length && !isVowel(s, i)) i += 1 }
      }
      m
    }
    def hasVowel(s: String): Boolean = s.indices.exists(isVowel(s, _))
    def endsDoubleC(s: String): Boolean =
      s.length >= 2 && s(s.length - 1) == s(s.length - 2) && !isVowel(s, s.length - 1)
    def cvc(s: String): Boolean =
      s.length >= 3 && !isVowel(s, s.length - 3) && isVowel(s, s.length - 2) &&
        !isVowel(s, s.length - 1) && !"wxy".contains(s(s.length - 1))
    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)
    // step 1b
    if (w.endsWith("eed")) { if (measure(w.dropRight(3)) > 0) w = w.dropRight(1) }
    else {
      val trimmed =
        if (w.endsWith("ing") && hasVowel(w.dropRight(3))) Some(w.dropRight(3))
        else if (w.endsWith("ed") && hasVowel(w.dropRight(2))) Some(w.dropRight(2))
        else None
      trimmed.foreach { t =>
        w = t
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
        else if (endsDoubleC(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
        else if (measure(w) == 1 && cvc(w)) w += "e"
      }
    }
    // step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"
    // step 2/3 (common suffix maps, measure > 0)
    val maps = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble",
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    maps.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, rep) =>
      val stem = w.dropRight(suf.length)
      if (measure(stem) > 0) w = stem + rep
    }
    // step 4 (measure > 1 suffix removal)
    val s4 = Seq("ement", "ance", "ence", "able", "ible", "ment", "ent", "ant",
      "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic", "ou")
    s4.find(w.endsWith).foreach { suf =>
      val stem = w.dropRight(suf.length)
      val ok = measure(stem) > 1 &&
        (suf != "ion" || (stem.nonEmpty && "st".contains(stem.last)))
      if (ok) w = stem
    }
    // step 5
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      if (measure(stem) > 1 || (measure(stem) == 1 && !cvc(stem))) w = stem
    }
    if (measure(w) > 1 && endsDoubleC(w) && w.endsWith("l")) w = w.dropRight(1)
    w
  }

  // ---------- UDF registration ----------

  val nwUdf: UserDefinedFunction = udf(needlemanWunsch _)
  val jaroUdf: UserDefinedFunction = udf(jaro _)
  val jaroWinklerUdf: UserDefinedFunction = udf(jaroWinkler _)
  val ngramUdf: UserDefinedFunction = udf((a: String, b: String) => ngramDistance(a, b, 2))
  val tokenizeUdf: UserDefinedFunction = udf((s: String) => tokenize(s))
  val stemUdf: UserDefinedFunction = udf(porterStem _)

  /** Register all functions for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("nw_dist", nwUdf)
    spark.udf.register("jaro_sim", jaroUdf)
    spark.udf.register("jaro_winkler_sim", jaroWinklerUdf)
    spark.udf.register("ngram_dist", ngramUdf)
    spark.udf.register("tokenize_name", tokenizeUdf)
    spark.udf.register("porter_stem", stemUdf)
  }
}
