package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Metric-law property battery for the hand-written string-distance
  * kernels (reference nlptools/distance/OntoSimDistanceMetrics.scala:
  * 23-32 — the reference declared scalacheck but never wrote a
  * property; SURVEY §5.7). Example-based specs pin known values; these
  * pin the LAWS every downstream consumer (m1/m2/m7 feature joins)
  * implicitly assumes: identity, symmetry, bounds, the Levenshtein
  * triangle inequality, and agreement with an independent reference
  * implementation.
  */
object StringFunctionsPropSpec extends Properties("StringFunctions") {

  private val word: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(24)),
    Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ', '_', 'é', 'X')).map(_.take(24).mkString))

  // independent reference: the textbook recursive Levenshtein, memoized
  private def levRef(a: String, b: String): Int = {
    val memo = collection.mutable.Map[(Int, Int), Int]()
    def go(i: Int, j: Int): Int = memo.getOrElseUpdate((i, j),
      if (i == 0) j else if (j == 0) i
      else math.min(math.min(go(i - 1, j) + 1, go(i, j - 1) + 1),
        go(i - 1, j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)))
    go(a.length, b.length)
  }

  property("levenshtein: agrees with the textbook recursion") =
    forAll(word, word) { (a, b) =>
      StringFunctions.levenshtein(a, b) == levRef(a, b)
    }

  property("levenshtein: identity, symmetry, bounds") =
    forAll(word, word) { (a, b) =>
      val d = StringFunctions.levenshtein(a, b)
      StringFunctions.levenshtein(a, a) == 0 &&
        d == StringFunctions.levenshtein(b, a) &&
        d >= math.abs(a.length - b.length) &&
        d <= math.max(a.length, b.length)
    }

  property("levenshtein: triangle inequality") =
    forAll(word, word, word) { (a, b, c) =>
      StringFunctions.levenshtein(a, c) <=
        StringFunctions.levenshtein(a, b) + StringFunctions.levenshtein(b, c)
    }

  property("needlemanWunsch: identity, symmetry, [0,1]") =
    forAll(word, word) { (a, b) =>
      val d = StringFunctions.needlemanWunsch(a, b)
      StringFunctions.needlemanWunsch(a, a) == 0.0 &&
        d == StringFunctions.needlemanWunsch(b, a) &&
        d >= 0.0 && d <= 1.0
    }

  property("jaro: identity, symmetry, [0,1]") =
    forAll(word, word) { (a, b) =>
      val s = StringFunctions.jaro(a, b)
      (a.isEmpty || StringFunctions.jaro(a, a) == 1.0) &&
        s == StringFunctions.jaro(b, a) &&
        s >= 0.0 && s <= 1.0
    }

  property("jaroWinkler: >= jaro, [0,1]") =
    forAll(word, word) { (a, b) =>
      val j = StringFunctions.jaro(a, b)
      val w = StringFunctions.jaroWinkler(a, b)
      w >= j - 1e-12 && w >= 0.0 && w <= 1.0 + 1e-12
    }

  property("ngramDistance: identity, symmetry, [0,1]") =
    forAll(word, word, Gen.choose(2, 4)) { (a, b, n) =>
      val d = StringFunctions.ngramDistance(a, b, n)
      StringFunctions.ngramDistance(a, a, n) == 0.0 &&
        d == StringFunctions.ngramDistance(b, a, n) &&
        d >= 0.0 && d <= 1.0
    }

  property("compoundSplit: parts rejoin to the token") =
    forAll(Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(20)),
      // known-compound shapes: dictionary words glued together
      Gen.listOfN(3, Gen.oneOf(StringFunctions.dictionary.toSeq))
        .map(_.mkString))) { t =>
      StringFunctions.compoundSplit(t).mkString == t
    }

  property("tokenize: emits only nonempty lowercase alphanumeric tokens") =
    forAll(word) { name =>
      val toks = StringFunctions.tokenize(name)
      toks.forall(t => t.nonEmpty && t.matches("[a-z0-9]+"))
    }

  property("porterStem: nonempty, lowercase, never longer than the word") =
    forAll(Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(24))) { w =>
      val s = StringFunctions.porterStem(w)
      s.nonEmpty && s == s.toLowerCase && s.length <= w.length
    }
}
