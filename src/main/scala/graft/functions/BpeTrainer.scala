package graft.functions

/** Classic byte-pair-encoding TRAINING over a word-frequency table — the
  * learning step behind [[BpeMerges]]'s frozen table (d36 APPLIES a merge
  * list; this derives one from the corpus, Sennrich et al. 2016).
  *
  * The algorithm trains on word COUNTS, not the corpus: state is each
  * distinct pre-token as a symbol sequence plus its corpus frequency; each
  * round counts adjacent symbol pairs weighted by word frequency (all
  * adjacent positions, overlapping occurrences included — the standard
  * convention), picks the argmax with a total (count DESC, left ASC,
  * right ASC) order, and applies the merge to every word left-to-right
  * non-overlapping. That is also the production SCALE story: the
  * distributed part of tokenizer training is the word count (one corpus
  * shuffle, vocabulary-bounded output); the loop itself runs on a relation
  * whose size is the vocabulary, independent of corpus size — exactly how
  * HF/sentencepiece trainers work, and why the d45 driver-side loop is the
  * bounded-collect class (codebooks, centroids), not a hot-path collect.
  *
  * Equivalence note for the oracle: applying one merge by repeatedly
  * rewriting its LEFTMOST occurrence until none remain equals the
  * left-to-right non-overlapping pass, because applying (l, r) can never
  * create a new (l, r) occurrence — the merged symbol l+r differs from
  * both l and r (nonempty sides), so no overlap regenerates the pair.
  * BpeTrainerSpec pins this against the textbook example.
  */
object BpeTrainer {

  /** One learned merge: rank order is the Seq order. */
  final case class Merge(left: String, right: String, pairCount: Long)

  /** Train `nMerges` merges from `(word, count)` rows. Deterministic: ties
    * in pair count break by (left, right) ASCII order. Throws if the table
    * runs out of pairs before `nMerges` — a silent short table would make
    * every downstream tokenization row quietly wrong. */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int): IndexedSeq[Merge] = {
    var state: Vector[(Vector[String], Long)] =
      wordCounts.sortBy(_._1).map { case (w, c) =>
        (w.map(_.toString).toVector, c)
      }.toVector
    val out = Vector.newBuilder[Merge]
    var r = 0
    while (r < nMerges) {
      val counts = collection.mutable.LinkedHashMap.empty[(String, String), Long]
      state.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + cnt
          i += 1
        }
      }
      require(counts.nonEmpty,
        s"BPE training ran out of adjacent pairs after $r merges (asked for $nMerges)")
      val ((l, rt), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      out += Merge(l, rt, c)
      state = state.map { case (syms, cnt) => (applyMerge(syms, l, rt), cnt) }
      r += 1
    }
    out.result().toIndexedSeq
  }

  /** Left-to-right non-overlapping single-merge application. */
  private[functions] def applyMerge(syms: Vector[String], l: String,
                                    r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }
}
