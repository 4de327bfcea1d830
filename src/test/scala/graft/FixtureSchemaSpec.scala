package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Canary against driver testdata regens (the round-10 incident: a regen
  * silently switched `events.ts` from ns-as-long to tz-naive µs and three
  * queries failed ANALYSIS weeks of work downstream). This spec pins the
  * column/type surface the engine actually depends on, so the next drift
  * fails HERE with a message naming the table, column, and both types —
  * a one-glance diagnosis instead of a cryptic DATATYPE_MISMATCH deep in
  * a query.
  *
  * Rules encoded:
  *  - extra columns in a fixture are fine (we don't read them);
  *  - a depended-on column must exist with one of the types the engine
  *    is KNOWN to handle (e.g. the three events.ts encodings
  *    [[Tables.events]] normalizes, proven in EventsEncodingSpec);
  *  - the normalized surface (`Tables.events`) must always present
  *    microsecond TimestampType regardless of the raw encoding.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf0001

  // tz-aware and tz-naive µs are both tolerated everywhere a timestamp
  // is consumed (the whole suite passes under either session config);
  // LongType is the legacy nanosAsLong reading of TIMESTAMP(NANOS).
  private val anyTimestamp: Set[DataType] =
    Set(TimestampType, TimestampNTZType)
  private val anyEventsTs: Set[DataType] =
    anyTimestamp + LongType
  private def exactly(t: DataType): Set[DataType] = Set(t)

  private val depended: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map(
      "r_regionkey" -> exactly(IntegerType), "r_name" -> exactly(StringType)),
    "nation" -> Map(
      "n_nationkey" -> exactly(IntegerType), "n_name" -> exactly(StringType),
      "n_regionkey" -> exactly(IntegerType)),
    "customer" -> Map(
      "c_custkey" -> exactly(LongType), "c_name" -> exactly(StringType),
      "c_nationkey" -> exactly(IntegerType),
      "c_acctbal" -> exactly(DoubleType),
      "c_mktsegment" -> exactly(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> exactly(LongType), "s_name" -> exactly(StringType),
      "s_nationkey" -> exactly(IntegerType),
      "s_acctbal" -> exactly(DoubleType)),
    "part" -> Map(
      "p_partkey" -> exactly(LongType), "p_name" -> exactly(StringType),
      "p_brand" -> exactly(StringType), "p_type" -> exactly(StringType),
      "p_size" -> exactly(IntegerType),
      "p_retailprice" -> exactly(DoubleType)),
    "orders" -> Map(
      "o_orderkey" -> exactly(LongType), "o_custkey" -> exactly(LongType),
      "o_orderstatus" -> exactly(StringType),
      "o_totalprice" -> exactly(DoubleType),
      "o_orderdate" -> anyTimestamp,
      "o_orderpriority" -> exactly(StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> exactly(LongType), "l_partkey" -> exactly(LongType),
      "l_suppkey" -> exactly(LongType),
      "l_linenumber" -> exactly(IntegerType),
      "l_quantity" -> exactly(DoubleType),
      "l_extendedprice" -> exactly(DoubleType),
      "l_discount" -> exactly(DoubleType), "l_tax" -> exactly(DoubleType),
      "l_returnflag" -> exactly(StringType),
      "l_linestatus" -> exactly(StringType),
      "l_shipdate" -> anyTimestamp),
    "events" -> Map(
      "event_id" -> exactly(LongType), "ts" -> anyEventsTs,
      "user_id" -> exactly(LongType), "event_type" -> exactly(StringType),
      "value" -> exactly(DoubleType), "props" -> exactly(StringType)),
    "documents" -> Map(
      "doc_id" -> exactly(LongType), "text" -> exactly(StringType),
      "lang" -> exactly(StringType), "source" -> exactly(StringType),
      "n_chars" -> exactly(LongType)),
    "embeddings" -> Map(
      "vec_id" -> exactly(LongType),
      // float is what ships; double would silently change cosine math —
      // surface it here so the decision to widen is explicit
      "embedding" -> exactly(ArrayType(FloatType)),
      "label" -> exactly(IntegerType)))

  test("every depended-on fixture column exists with a handled type") {
    val drift = depended.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val actual = Tables.load(spark, sf, table).schema
        .map(f => f.name -> f.dataType).toMap
      cols.toSeq.sortBy(_._1).flatMap { case (name, ok) =>
        actual.get(name) match {
          case None =>
            Some(s"$table.$name: MISSING (fixture has ${actual.keys.toSeq.sorted.mkString(", ")})")
          case Some(t) if !ok.contains(t) =>
            Some(s"$table.$name: fixture now $t, engine handles ${ok.mkString(" | ")} — " +
              "a testdata regen changed an encoding; extend the normalizer " +
              "or the accepted set ONLY after checking every consumer")
          case _ => None
        }
      }
    }
    assert(drift.isEmpty, "fixture schema drift:\n  " + drift.mkString("\n  "))
  }

  test("the normalized events surface is microsecond TimestampType") {
    assert(Tables.events(spark, sf).schema("ts").dataType == TimestampType)
  }

  test("documents text is ASCII-only and non-empty (x71/x72 oracle contract)") {
    // the audio/video fingerprint oracles index utf-8 bytes via
    // ascii(substr(text, …)), which equals the byte ONLY for ASCII; a
    // regen that introduces multi-byte text must fail here by name, not
    // as a cryptic hash mismatch in the driver compare
    import org.apache.spark.sql.functions._
    val bad = Tables.documents(spark, sf)
      .filter(col("text").isNull || length(col("text")) === 0 ||
        octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(bad == 0L,
      s"$bad documents are empty/non-ASCII — the x71/x72 oracle byte " +
        "indexing (ascii(substr)) is no longer valid; rework the replay " +
        "before trusting those rows")
  }
}
