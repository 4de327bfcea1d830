package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Properties of the Luhn checksum (reference implementation; the
  * Column kernel [[graft.operators.TextOps.luhnValid]] is proven equal
  * to this reference on a seeded batch in SecretReadabilitySpec):
  * exactly one valid check digit per prefix, and every single-digit
  * substitution is detected — the two guarantees the algorithm was
  * designed for, and exactly why x98 can plant `prefix || doc_id%10`
  * and let the checksum decide which plants are real cards.
  */
object LuhnProps extends Properties("luhn") {

  /** Reference Luhn (mirrors TextOps.luhnValid's arithmetic). */
  private[graft] def ref(s: String): Boolean = {
    val n = s.length
    val total = s.zipWithIndex.map { case (ch, i0) =>
      val d = ch - '0'
      if ((n - (i0 + 1)) % 2 == 1) { val dd = d * 2; if (dd > 9) dd - 9 else dd }
      else d
    }.sum
    total % 10 == 0
  }

  private val digits15 = Gen.listOfN(15, Gen.choose(0, 9))
    .map(_.mkString)

  property("exactly one valid check digit per 15-digit prefix") =
    forAll(digits15) { p =>
      (0 to 9).count(d => ref(p + d)) == 1
    }

  property("single-digit substitution is always detected") =
    forAll(digits15, Gen.choose(0, 15), Gen.choose(1, 9)) { (p, pos, delta) =>
      val check = (0 to 9).find(d => ref(p + d)).get
      val valid = p + check
      val old = valid(pos) - '0'
      val subst = valid.updated(pos, ('0' + (old + delta) % 10).toChar)
      subst == valid || !ref(subst)
    }
}
