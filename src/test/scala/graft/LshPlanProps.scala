package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.DedupOps

/** Properties for the LSH band planner: the chosen factorization must be
  * exact, optimal among divisors, and monotone in the threshold.
  */
object LshPlanProps extends Properties("lsh-plan") {

  private val budgets = Gen.oneOf(16, 32, 64, 120, 128, 256)
  private val thresholds = Gen.choose(0.05, 0.95)

  property("bands*rows == numHashes and the pick is divisor-optimal") =
    forAll(budgets, thresholds) { (n, t) =>
      val p = DedupOps.lshPlan(n, t)
      val exact = p.bands * p.rowsPerBand == n
      val optimal = (1 to n).filter(n % _ == 0).forall { r =>
        val alt = math.pow(1.0 / (n / r), 1.0 / r)
        math.abs(p.curveThreshold - t) <= math.abs(alt - t) + 1e-12
      }
      exact && optimal
    }

  property("curve threshold is monotone in the requested threshold") =
    forAll(budgets, thresholds, thresholds) { (n, t1, t2) =>
      val (lo, hi) = if (t1 <= t2) (t1, t2) else (t2, t1)
      DedupOps.lshPlan(n, lo).curveThreshold <=
        DedupOps.lshPlan(n, hi).curveThreshold + 1e-12
    }

  property("the planned curve threshold brackets the target when divisors allow") =
    forAll(budgets) { n =>
      // at t = 0.5 some factorization should land within a coarse band —
      // the planner can't do better than the divisor lattice, but it
      // must never pick something wildly off when a close pair exists
      val p = DedupOps.lshPlan(n, 0.5)
      p.curveThreshold > 0.05 && p.curveThreshold < 0.95
    }
}
