package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.VocabOps

/** Property test for the BPE merge chain's subtlest claim: the
  * space-wrapped `replace(" a  b " → " ab ")` merge has EXACTLY the
  * greedy left-to-right non-overlapping semantics of a reference BPE
  * trainer — including the overlap traps ("aaaa" under merge (a,a)
  * must become "aa aa", never "a aa a" or "aaa a"). Random tiny-
  * alphabet corpora force dense overlaps that the real-corpus spec
  * never exercises. */
class BpePropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  /** Reference trainer: one greedy merge step over (symbols, freq). */
  private def refStep(words: Seq[(Vector[String], Long)])
      : Option[((String, String, Long), Seq[(Vector[String], Long)])] = {
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    words.foreach { case (syms, n) =>
      syms.sliding(2).filter(_.length == 2).foreach { p =>
        counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
      }
    }
    if (counts.isEmpty) None
    else {
      val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, x, y) }
      val merged = words.map { case (syms, cnt) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), cnt)
      }
      Some(((a, b, n), merged))
    }
  }

  test("spark merge chain == reference trainer on random overlap-heavy corpora") {
    // tiny alphabet + runs ("aaaa") maximize overlapping-pair traps;
    // distinct words with random frequencies, ≥ one multi-char word
    // so three merge rounds always have a pair to pick
    val wordGen = Gen.chooseNum(1, 6).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf('a', 'b')).map(_.mkString))
    val corpusGen = for {
      n <- Gen.chooseNum(3, 10)
      ws <- Gen.listOfN(n, wordGen)
      fs <- Gen.listOfN(n, Gen.chooseNum(1L, 5L))
    } yield ws.distinct.zip(fs).filter(_._1.length >= 1) :+ ("abab", 2L)

    check(Prop.forAll(corpusGen) { corpus0 =>
      val corpus = corpus0.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      // reference: run up to 10 steps (most corpora run dry sooner;
      // the dry tail is exactly what the totality fix must preserve)
      var words = corpus.map { case (w, f) =>
        (w.map(_.toString).toVector, f) }
      val want = (1 to 10).flatMap { _ =>
        refStep(words) match {
          case Some((m, next)) => words = next; Some(m)
          case None => None
        }
      }
      // spark: the operator's chain over the same (token, freq) table
      val freqDf = corpus.toDF("token", "freq")
      val got = VocabOps
        .bpeMergesFromWords(VocabOps.bpeEncode(freqDf), steps = 10)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      // when fewer than 10 real pairs exist BOTH engines run dry at
      // the same step: the reference stops, the operator emits no
      // row — so the sequences must match exactly, not just a prefix
      got.toSeq == want
    }, n = 12)
  }

  test("per-round plan size is bounded — round 30 as flat as round 2") {
    // the trainBpe cost-model invariant (30k merges = 30k small jobs):
    // each round's merged-words plan reads the PREVIOUS round's
    // materialized checkpoint, so the executed plan must not deepen
    // with the round number — a missing lineage cut would grow it
    // linearly and round 30 would dwarf round 2
    val corpus = Seq.tabulate(40)(i =>
      (s"w${i % 7}x${i % 5}y$i", (i % 9 + 1).toLong))
    val words0 = VocabOps.bpeEncode(corpus.toDF("token", "freq"))
    var words = words0
    val nodes = (1 to 30).map { _ =>
      val b = VocabOps.bpeBest(VocabOps.bpePairs(words))
      words = graft.Checkpoints.eager(VocabOps.bpeMerge(words, b))
      words.queryExecution.executedPlan.collect { case p => p }.size
    }
    assert(nodes(29) <= nodes(1) + 2,
      s"plan grew with round number: ${nodes.mkString(",")}")
    assert(nodes.max <= 40, s"per-round plan not small: ${nodes.max}")
  }
}
