package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word under a unigram piece table — the
  * per-distinct-word kernel of [[graft.operators.UnigramLmOps]] (the
  * SentencePiece-style tokenizer; Kudo 2018 "Subword Regularization"
  * §3). The piece table rides in the expression as LITERAL arrays — the
  * model is driver-bounded (≤ alphabet + maxSeed rows, the BPE
  * merge-table / PQ-codebook collect-is-the-model discipline), so no
  * join, no broadcast variable, no state: the expression is a pure
  * function of its input string.
  *
  * '''Exactness contract.''' The published unigram objective maximizes
  * Σ log p(piece) — float log-likelihoods that no two engines round
  * alike. Here every piece carries the INTEGER bit-cost
  * `bitlen(total) − bitlen(cnt)` (the `length(bin(x))` both engines
  * share — the x42 surprise-bits precedent), and the best segmentation
  * minimizes the tuple
  * `(Σ cost, n_pieces, piece sequence lexicographically)` — a total
  * order two engines can agree on bit for bit. The DuckDB twin
  * enumerates ALL segmentations by recursive CTE and takes the same
  * argmin; this expression computes it by DP, which is sound because
  * the order is prefix-compositional: extensions add identical
  * (cost, k) to both sides of any per-prefix comparison, and
  * equal-(cost,k) paths over the same prefix differ first inside the
  * prefix, so per-position minimal tuples compose to the global one.
  *
  * A character absent from the table (possible only when applying a
  * trained table to a FOREIGN corpus — training corpora contain their
  * own alphabet, and [[graft.operators.UnigramLmOps]] floors every
  * seen character into the table) falls back to a single-char piece
  * costing `fallbackCost` (one more than any table piece can cost), so
  * segmentation totals on unseen text, the UNK convention.
  *
  * '''BMP-word precondition''' (advisor r15): this DP indexes words by
  * UTF-16 code unit (`java.lang.String` substring/length), while the
  * seed inventory (Spark SQL `substr`) and the DuckDB twins count code
  * POINTS — a supplementary-plane character (anything above U+FFFF)
  * occupies two code units here and one position there, so the walks
  * would disagree and a lone surrogate could surface as a "piece".
  * Unreachable from [[graft.operators.UnigramLmOps]], whose
  * `tokensRegex` words are `[a-z0-9]+` by construction; any other
  * caller must pre-filter words to the Basic Multilingual Plane (or
  * ASCII) before segmenting. Same precondition for [[GreedySegment]].
  */
case class UnigramSegment(child: Expression, pieces: Array[String],
    costs: Array[Long])
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(pieces.length == costs.length, "pieces/costs length mismatch")
  require(pieces.nonEmpty, "empty piece table")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  // java.lang.Long values ON PURPOSE: a scala.Long-valued map would
  // unbox a missing key's null to 0 — a free-cost phantom piece
  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Long.valueOf(costs(i))); i += 1
    }
    m
  }
  @transient private lazy val maxPieceLen: Int = pieces.map(_.length).max
  @transient private lazy val fallbackCost: Long = costs.max + 1L

  override def nullSafeEval(v: Any): Any = {
    val w = v.asInstanceOf[UTF8String].toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // best(i) = minimal (cost, k, path) over segmentations of w[0,i)
    val cost = new Array[Long](n + 1)
    val k = new Array[Int](n + 1)
    val path = new Array[List[String]](n + 1) // reversed piece list
    path(0) = Nil
    var i = 1
    while (i <= n) {
      var bc = Long.MaxValue; var bk = Int.MaxValue
      var bp: List[String] = null
      val lo = math.max(0, i - maxPieceLen)
      var j = i - 1
      while (j >= lo) {
        val piece = w.substring(j, i)
        val pc = table.get(piece) match {
          case null => if (piece.length == 1) fallbackCost else -1L
          case c => c.longValue()
        }
        if (pc >= 0 && path(j) != null) {
          val cc = cost(j) + pc
          val ck = k(j) + 1
          // tuple order (cost, k, path): path compared FORWARD, so
          // rebuild candidates lazily only on full tie
          val better =
            if (cc != bc) cc < bc
            else if (ck != bk) ck < bk
            else bp == null ||
              lexLess((piece :: path(j)).reverse, bp.reverse)
          if (better) { bc = cc; bk = ck; bp = piece :: path(j) }
        }
        j -= 1
      }
      if (bp != null) { cost(i) = bc; k(i) = bk; path(i) = bp }
      i += 1
    }
    val best = path(n)
    if (best == null) return new GenericArrayData(Array.empty[Any])
    val out = best.reverse.map(p => UTF8String.fromString(p): Any).toArray
    new GenericArrayData(out)
  }

  /** Elementwise lexicographic list-of-string comparison — the same
    * order DuckDB applies to `VARCHAR[]` (first differing element
    * decides; a strict prefix sorts first).
    */
  private def lexLess(a: List[String], b: List[String]): Boolean = {
    var x = a; var y = b
    while (x.nonEmpty && y.nonEmpty) {
      val c = x.head.compareTo(y.head)
      if (c != 0) return c < 0
      x = x.tail; y = y.tail
    }
    x.isEmpty && y.nonEmpty
  }

  override protected def withNewChildInternal(c: Expression): UnigramSegment =
    copy(child = c)
}

/** Greedy maximal-munch segmentation of one word under a piece
  * inventory — the WordPiece-style LINEAR apply path (Song et al. 2021
  * "Fast WordPiece Tokenization" §2: longest-match-first; SentencePiece
  * ships the same walk as its non-Viterbi option). At each position the
  * LONGEST inventory piece starting there is emitted and the cursor
  * advances past it; a position no piece covers (a character outside
  * the training alphabet) emits that single character — the same UNK
  * convention as [[UnigramSegment]]'s fallback, so both segmenters
  * total on any input. Deterministic single pass, no scoring, no ties:
  * the DuckDB twin replays it with one longest-match-per-position
  * census plus a linear recursive walk.
  */
case class GreedySegment(child: Expression, pieces: Array[String])
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(pieces.nonEmpty, "empty piece table")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "greedy_segment"

  @transient private lazy val table: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    pieces.foreach(s.add)
    s
  }
  @transient private lazy val maxPieceLen: Int = pieces.map(_.length).max

  override def nullSafeEval(v: Any): Any = {
    val w = v.asInstanceOf[UTF8String].toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      var len = math.min(maxPieceLen, n - i)
      while (len > 1 && !table.contains(w.substring(i, i + len))) len -= 1
      // len == 1: a known char matches; an unknown char emits itself
      out += UTF8String.fromString(w.substring(i, i + len))
      i += len
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): GreedySegment =
    copy(child = c)
}

object UnigramExprs {
  def unigramSegment(word: Column, pieces: Array[String],
      costs: Array[Long]): Column =
    Bridge.column(UnigramSegment(Bridge.expression(word), pieces, costs))

  def greedySegment(word: Column, pieces: Array[String]): Column =
    Bridge.column(GreedySegment(Bridge.expression(word), pieces))
}
