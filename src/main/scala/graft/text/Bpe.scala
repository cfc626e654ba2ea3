package graft.text

/** Byte-pair-encoding vocabulary induction and application — the real
  * iterative merge loop (t20), upgrading t14's single-round pair count
  * to the artifact a tokenizer pipeline actually ships: the RANKED
  * MERGE LIST. Induction and application share the one
  * [[Bpe.mergePair]] kernel so the tokenizer cannot drift from the
  * trainer.
  *
  * Scale posture: the corpus-sized work is the distributed word count
  * (one scan + one map-side-combined groupBy); the merge loop runs
  * over the word-SHAPE dictionary, which is vocabulary-sized and
  * frequency-capped ([[graft.text.TextQueries.BpeShapeWords]]) — the
  * same posture as production BPE trainers (HuggingFace tokenizers
  * trains from a capped word-count dict), and the same bounded-collect
  * class as the k-means centroid loop (s4). 50 merge rounds over a
  * 50k-shape dict is driver-trivial at ANY corpus size; shipping each
  * round as a Spark job would add 50 scheduler round-trips to save
  * milliseconds of CPU.
  */
object Bpe {

  /** One learned merge: at `rank`, adjacent (`left`,`right`) fuse into
    * `left+right`; `pairFreq` is the weighted adjacency count that won
    * the round. */
  final case class Merge(rank: Int, left: String, right: String,
      pairFreq: Long) {
    def merged: String = left + right
  }

  /** Greedy left-to-right fuse of every adjacent (a,b) in `syms` —
    * "aaa" under (a,a) becomes ["aa","a"], the standard BPE scan
    * order. Shared by induction and application. */
  def mergePair(syms: IndexedSeq[String], a: String,
      b: String): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Induce up to `maxMerges` merges from a (word, freq) dictionary.
    * Each round counts every adjacent symbol position weighted by word
    * frequency, picks the max (ties broken lexicographically on the
    * pair, so the list is partition- and map-order-independent), fuses
    * it everywhere, repeats. Stops early when no pair reaches
    * `minPairFreq` (merging singletons would just memorize the tail). */
  def induce(shapes: Seq[(String, Long)], maxMerges: Int,
      minPairFreq: Long): Seq[Merge] = {
    var words: Array[(IndexedSeq[String], Long)] = shapes.iterator
      .map { case (w, f) => (w.map(_.toString): IndexedSeq[String], f) }
      .toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= maxMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        if (c < minPairFreq) done = true
        else {
          merges += Merge(rank, a, b, c)
          words = words.map { case (syms, f) => (mergePair(syms, a, b), f) }
          rank += 1
        }
      }
    }
    merges.result()
  }

  /** Tokenize one word with a learned merge list: repeatedly fuse the
    * LOWEST-RANKED pair present until none applies — equivalent to
    * replaying the merges in rank order, so `tokenize` over the
    * training dict reproduces the shapes induction ended with. */
  def tokenize(word: String,
      ranks: Map[(String, String), Int]): IndexedSeq[String] = {
    var syms: IndexedSeq[String] = word.map(_.toString)
    var go = syms.length >= 2 && ranks.nonEmpty
    while (go) {
      var bestRank = Int.MaxValue
      var ba: String = null
      var bb: String = null
      var i = 0
      while (i + 1 < syms.length) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; ba = syms(i); bb = syms(i + 1) }
        }
        i += 1
      }
      if (bestRank == Int.MaxValue) go = false
      else syms = mergePair(syms, ba, bb)
    }
    syms
  }
}
