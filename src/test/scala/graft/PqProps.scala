package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.PqOps

/** Properties of the PQ kernels against an independent driver-side model:
  * the distributed encode must agree with a plain Scala argmin over the
  * same codebook, and the ADC estimate must be EXACTLY the sum of the
  * per-subspace codeword distances (that identity — not an approximation
  * bound — is what the oracle's cross-engine hash relies on).
  */
object PqProps extends Properties("pq") {
  lazy val spark = SparkTestSession.spark

  // each case runs several Spark jobs over generated frames
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private def vecGen(dim: Int): Gen[Seq[Float]] =
    Gen.listOfN(dim, Gen.chooseNum(-8, 8).map(i => i / 4.0f))

  private def d2(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }

  property("encode == driver-side argmin over the same codebook") =
    forAll(Gen.choose(6, 20), Gen.choose(2, 5), Gen.choose(0L, Long.MaxValue)) {
      (n, k, seed) =>
        import spark.implicits._
        val dim = 8; val m = 4
        val rnd = new scala.util.Random(seed)
        val vecs = (0 until n).map(i =>
          (i.toLong, Seq.fill(dim)((rnd.nextInt(33) - 16) / 4.0f)))
        val emb = vecs.toDF("vec_id", "embedding")
        val cb = PqOps.pqTrain(emb, "vec_id", "embedding", m, k, iters = 1)
        val book = cb.collect()
          .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2))).toMap
        val got = PqOps.pqEncode(emb, "vec_id", "embedding", cb, m).collect()
          .map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
        vecs.forall { case (id, v) =>
          (0 until m).forall { s =>
            val sv = v.slice(s * dim / m, (s + 1) * dim / m).map(_.toDouble)
            val best = book.keys.filter(_._1 == s).toSeq
              .map { key => (d2(sv, book(key)), key._2) }.min
            got((id, s)) == best._2
          }
        }
    }

  property("ADC distance == Σ per-subspace codeword distance, exactly") =
    forAll(Gen.choose(6, 15), Gen.choose(0L, Long.MaxValue)) { (n, seed) =>
      import spark.implicits._
      val dim = 8; val m = 4; val k = 3
      val rnd = new scala.util.Random(seed)
      val vecs = (0 until n).map(i =>
        (i.toLong, Seq.fill(dim)((rnd.nextInt(33) - 16) / 4.0f)))
      val emb = vecs.toDF("vec_id", "embedding")
      val cb = PqOps.pqTrain(emb, "vec_id", "embedding", m, k, iters = 1)
      val book = cb.collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2))).toMap
      val codes = PqOps.pqEncode(emb, "vec_id", "embedding", cb, m)
      val q = vecs.head
      val queries = Seq(q).toDF("qid", "qv")
        .select(col("qid"), col("qv").as("qv"))
      val got = PqOps.adcTopKBatch(codes, "vec_id", queries, "qid", "qv",
          cb, m, n).collect()
        .map(r => r.getLong(1) -> r.getDouble(2)).toMap
      val codeMap = codes.collect()
        .map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
      vecs.forall { case (id, _) =>
        val want = (0 until m).foldLeft(0.0) { (acc, s) =>
          val qsv = q._2.slice(s * dim / m, (s + 1) * dim / m).map(_.toDouble)
          acc + d2(qsv, book((s, codeMap((id, s)))))
        }
        got(id) == want // bit-exact: both sum in sub_id order from 0.0
      }
    }

  property("pack→unpack is the identity on any encode result") =
    forAll(Gen.choose(4, 16), Gen.choose(0L, Long.MaxValue)) { (n, seed) =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val vecs = (0 until n).map(i =>
        (i.toLong, Seq.fill(8)((rnd.nextInt(9) - 4) / 2.0f)))
      val emb = vecs.toDF("vec_id", "embedding")
      val cb = PqOps.pqTrain(emb, "vec_id", "embedding", 2, 3, iters = 0)
      val codes = PqOps.pqEncode(emb, "vec_id", "embedding", cb, 2)
      val back = PqOps.unpack(PqOps.pack(codes, "vec_id"), "vec_id")
      back.exceptAll(codes).isEmpty && codes.exceptAll(back).isEmpty
    }
}
