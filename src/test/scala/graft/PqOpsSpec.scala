package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PqOps, SimilarityOps}

/** Product quantization: codebook geometry, encode totality, the packed
  * 8-byte storage shape's losslessness, ADC's agreement with the exact
  * metric it approximates, and the measured recall of both retrieval
  * paths on the sf0.01 fixture.
  *
  * Recall context (unclustered fixture — the worst case for any
  * quantizer, see AnnRecallSpec; sweep recorded there too): at
  * m=16 × k=64 measured recall@5 over the 20-query batch is ≈0.60 for
  * the pure ADC scan and ≈0.96 after shortlist-50 + exact rerank
  * (m=8 × k=16 reads 0.29/0.76 — the m/k dial buys recall for bytes).
  * Floors sit under the measured values; the rerank ≥ adc assertion
  * pins the two-stage dial.
  */
class PqOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf01 = "/root/testdata/sf0.01"
  val m = 16; val kcw = 64

  lazy val emb = Tables.embeddings(spark, sf01)
  lazy val cb = PqOps.pqTrain(emb, "vec_id", "embedding", m, kcw, iters = 2)
    .cache()
  lazy val codes =
    PqOps.pqEncode(emb, "vec_id", "embedding", cb, m).cache()
  lazy val queries = emb.filter(col("vec_id") < 20)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))
  lazy val truth = PqOps.l2TopKBatch(emb, "vec_id", "embedding",
    queries, "qid", "qv", 5, excludeSelf = true).cache()

  private def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
    SimilarityOps.recallAtK(truth, approx.select("qid", "vec_id"),
      "qid", "vec_id").agg(avg("recall")).head().getDouble(0)

  test("codebook has k codewords per subspace, each of dim/m length") {
    val rows = cb.collect()
    assert(rows.length === m * kcw)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSet.size === m * kcw)
    assert(rows.forall(_.getSeq[Double](2).length === 64 / m))
  }

  test("encode assigns every vector exactly m codes, all in [0, k)") {
    val n = emb.count()
    assert(codes.count() === n * m)
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= m).count() === 0)
    assert(codes.filter(col("code_id") < 0 || col("code_id") >= kcw).count() === 0)
  }

  test("scan-local packed encode == join-form encode, bit for bit") {
    val packed = PqOps.pqEncodePacked(emb, "vec_id", "embedding", cb, m)
    val viaPacked = PqOps.unpack(packed, "vec_id")
    assert(viaPacked.exceptAll(codes).count() === 0)
    assert(codes.exceptAll(viaPacked).count() === 0)
    // and its plan carries no exchange: the bulk encode is scan-local
    val plan = packed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"packed encode should not shuffle:\n$plan")
  }

  test("pack/unpack roundtrip is lossless and packs m codes per vector") {
    val packed = PqOps.pack(codes, "vec_id")
    assert(packed.filter(size(col("codes")) =!= m).count() === 0)
    val back = PqOps.unpack(packed, "vec_id")
    assert(back.exceptAll(codes).count() === 0)
    assert(codes.exceptAll(back).count() === 0)
  }

  test("ADC distance of a vector against its own query is the quantization"
      + " residual: 0 iff the vector sits on its codewords") {
    // a vector whose subvectors ARE codewords (a seed vector that survived
    // training unmoved) would read adist 0; in general adist must be
    // nonnegative and, summed with the LUT shape, reproducible: run twice
    val q1 = emb.filter(col("vec_id") === 7)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val a = PqOps.adcTopKBatch(codes, "vec_id", q1, "qid", "qv", cb, m, 10)
      .orderBy("vec_id").collect()
    val b = PqOps.adcTopKBatch(codes, "vec_id", q1, "qid", "qv", cb, m, 10)
      .orderBy("vec_id").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall(_.getDouble(2) >= 0.0))
    // the self row (qid==id, not excluded here) carries only the
    // quantization residual ||v − q(v)||² — far below typical
    // inter-vector distances, so it must rank in the query's top-10
    assert(a.exists(_.getLong(1) === 7L))
  }

  test("rerank distances are the exact squared L2 (ADC error is gone)") {
    val got = PqOps.adcRerankTopKBatch(emb, "vec_id", "embedding", codes,
        queries, "qid", "qv", cb, m, 5, shortlist = 50, excludeSelf = true)
    val exact = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        PqOps.dist2(col("embedding"), col("qv")).as("d"))
    val joined = got.join(exact, Seq("qid", "vec_id"))
    assert(joined.count() === got.count())
    assert(joined.filter(col("l2sq") =!= col("d")).count() === 0)
  }

  test("measured recall@5: ADC ≥ 0.5, rerank ≥ ADC and ≥ 0.85") {
    val adc = meanRecall(PqOps.adcTopKBatch(codes, "vec_id",
      queries, "qid", "qv", cb, m, 5, excludeSelf = true))
    val rr = meanRecall(PqOps.adcRerankTopKBatch(emb, "vec_id", "embedding",
      codes, queries, "qid", "qv", cb, m, 5, shortlist = 50,
      excludeSelf = true))
    assert(adc >= 0.5, s"pq_adc recall@5 $adc")
    assert(rr >= adc - 1e-9, s"rerank $rr < adc $adc")
    assert(rr >= 0.85, s"pq_adc_rerank recall@5 $rr")
  }

  test("native Dist2 == compositional zip_with/aggregate spec, bit for bit") {
    val pairs = emb.alias("a").crossJoin(emb.limit(5).select(
        col("vec_id").as("bid"), col("embedding").as("bv")))
      .select(PqOps.dist2(col("embedding"), col("bv")).as("n"),
        PqOps.dist2Spec(col("embedding"), col("bv")).as("c"))
    assert(pairs.filter(col("n") =!= col("c")).count() === 0)
  }

  test("Dist2/DotProd match the spec's NULL contract on malformed vectors"
      + " (length mismatch, null element)") {
    // the spec (zip_with + aggregate) surfaces a malformed vector as
    // NULL; the native twins must not silently truncate there (advisor
    // r15) — interpreted eval and codegen both
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      ("len_mismatch", Seq[java.lang.Double](1.0, 2.0, 3.0),
        Seq[java.lang.Double](1.0, 2.0)),
      ("null_elem", Seq[java.lang.Double](1.0, null, 3.0),
        Seq[java.lang.Double](1.0, 2.0, 3.0)),
      ("clean", Seq[java.lang.Double](1.0, 2.0, 3.0),
        Seq[java.lang.Double](4.0, 5.0, 6.0))).toDF("kind", "a", "b")
    val out = df.select(col("kind"),
      graft.functions.PqExprs.dist2Native(col("a"), col("b")).as("nd"),
      PqOps.dist2Spec(col("a"), col("b")).as("sd"),
      graft.functions.PqExprs.dotNative(col("a"), col("b")).as("np"))
      .collect().map(r => r.getString(0) ->
        (r.isNullAt(1), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(out("len_mismatch") === ((true, true, true)))
    assert(out("null_elem") === ((true, true, true)))
    assert(out("clean") === ((false, false, false)))
  }

  test("native PqEncode == compositional higher-order spec, code for code") {
    val nat = PqOps.pqEncodePacked(emb, "vec_id", "embedding", cb, m)
    val spec = PqOps.pqEncodePackedSpec(emb, "vec_id", "embedding", cb, m)
      .withColumnRenamed("codes", "codes_spec")
    val j = nat.join(spec, Seq("vec_id"))
    assert(j.filter(col("codes") =!= col("codes_spec")).count() === 0)
    assert(j.count() === emb.count())
  }

  test("training iterations do not hurt the quantizer: iter-2 codebook's"
      + " total residual ≤ iter-0 (seed) codebook's") {
    def residual(book: org.apache.spark.sql.DataFrame): Double =
      PqOps.subvectors(emb, "vec_id", "embedding", m)
        .join(broadcast(book), Seq("sub_id"))
        .withColumn("d", PqOps.dist2(col("sv"), col("cw")))
        .groupBy("vec_id", "sub_id").agg(min("d").as("d"))
        .agg(sum("d")).head().getDouble(0)
    val seed = PqOps.pqTrain(emb, "vec_id", "embedding", m, kcw, iters = 0)
    assert(residual(cb) <= residual(seed) + 1e-6)
  }
}
