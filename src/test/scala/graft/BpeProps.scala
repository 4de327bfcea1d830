package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.BpeOps

/** Properties for the BPE trainer/applier on random corpora: equality
  * with an independent driver-side reference implementation of the exact
  * documented semantics (weighted pair argmax with (cnt DESC, lhs, rhs)
  * tie-break; one leftmost replace-all pass per step), greedy-prefix
  * stability in numMerges, and the conservation/reconstruction and
  * token-type-bound invariants application must never break.
  */
object BpeProps extends Properties("bpe") {
  lazy val spark = SparkTestSession.spark

  // each case runs a full multi-step Spark training loop on a tiny corpus
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val genCorpus: Gen[Seq[(String, Int)]] = for {
    nWords <- Gen.choose(3, 8)
    words <- Gen.listOfN(nWords, for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)
    counts <- Gen.listOfN(nWords, Gen.choose(1, 5))
  } yield words.distinct.zip(counts)

  private def docsOf(corpus: Seq[(String, Int)]) = {
    import spark.implicits._
    corpus.flatMap { case (w, n) => Seq.fill(n)(w) }.toDF("text")
  }

  /** Independent reference trainer: same documented semantics, plain
    * Scala. Java's String.replace is the same leftmost non-overlapping
    * replace-all as Spark's and DuckDB's.
    */
  private def refTrain(corpus: Seq[(String, Int)],
      numMerges: Int): Seq[(String, String, Long)] = {
    var syms = corpus.map { case (w, c) =>
      (w.map(_.toString).mkString(" ") + " </w>", c.toLong)
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    var step = 0
    while (step < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- syms; Seq(a, b) <- s.split(" ").toSeq.sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= 2L =>
          out += ((l, r, c))
          syms = syms.map { case (s, wc) =>
            ((" " + s + " ").replace(s" $l $r ", s" $l$r ").trim, wc)
          }
          step += 1
        case _ => done = true
      }
    }
    out.result()
  }

  property("train equals the driver-side reference on random corpora") =
    forAll(genCorpus) { corpus =>
      corpus.nonEmpty && {
        val got = BpeOps.train(docsOf(corpus), "text", numMerges = 6)
          .orderBy("rank").collect()
          .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
        val want = refTrain(corpus, 6)
        got == want
      }
    }

  property("a longer training run extends the shorter one (greedy prefix)") =
    forAll(genCorpus) { corpus =>
      val short = BpeOps.train(docsOf(corpus), "text", numMerges = 3)
        .orderBy("rank").collect().map(_.toSeq).toSeq
      val long = BpeOps.train(docsOf(corpus), "text", numMerges = 6)
        .orderBy("rank").collect().map(_.toSeq).toSeq
      long.take(short.size) == short &&
        (short.size == 3 || long.size == short.size)
    }

  property("application reconstructs every word; token types stay bounded") =
    forAll(genCorpus) { corpus =>
      import org.apache.spark.sql.functions._
      corpus.nonEmpty && {
        val docs = docsOf(corpus)
        val merges = BpeOps.train(docs, "text", numMerges = 5)
        val words = BpeOps.tokenizeWords(docs, "text", merges)
          .collect()
          .map(r => (r.getString(0), r.getSeq[String](2)))
        val rebuilt = words.forall { case (w, toks) =>
          toks.mkString("") == w + "</w>" &&
            toks.count(_.contains("</w>")) == 1
        }
        val alphabet = corpus.flatMap(_._1).distinct.size
        val nTypes = words.flatMap(_._2).distinct.size
        rebuilt && nTypes <= alphabet + 1 + 5
      }
    }
}
