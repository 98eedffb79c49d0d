package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Threshold-aware Levenshtein kernel + the optimizer rule that puts it in
  * the plan automatically.
  *
  * The natural way to WRITE a fuzzy predicate is `levenshtein(a, b) <= k`
  * ([[graft.operators.FuzzyJoin]] does, and so does every user) — but
  * evaluated literally it fills the full O(|a|·|b|) DP table and only then
  * compares. For a bounded test almost all of that work is provably
  * irrelevant: if the length gap exceeds k the answer is NO before any DP;
  * and since DP values are non-decreasing along diagonals, the moment a
  * whole row's minimum exceeds k the final cell can never come back under
  * it. [[BoundedLevCore.leq]] is that banded early-exit kernel — O(k·n)
  * expected instead of O(n²) — and [[BoundedLevenshtein]] wraps it as a
  * codegen'd boolean expression (`graft_lev_leq(a, b, k)`; the generated
  * code is one static call, so the surrounding filter stays inside
  * whole-stage codegen).
  *
  * [[RewriteLevenshteinBound]] is the tier-(c) piece: a `Rule[LogicalPlan]`
  * that rewrites the four comparison shapes (`lev <= k`, `lev < k`,
  * `k >= lev`, `k > lev`, literal non-negative k) into the bounded kernel,
  * so the IDIOMATIC spelling gets the banded plan with no user action —
  * the same contract as Catalyst's own constant folding. At 100 TB the
  * verify stage of a fuzzy join evaluates this predicate once per
  * candidate pair; on far pairs (the majority under any blocking scheme)
  * the kernel exits at the length gate, never touching the DP arrays.
  *
  * (Spark ≥3.5's `levenshtein(a, b, threshold)` exposes a banded variant
  * when CALLED explicitly; the rule's value is that nobody has to.)
  */
object BoundedLevCore {

  /** lev(a, b) <= k, early-exit banded two-row DP. */
  def leq(a: UTF8String, b: UTF8String, k: Int): Boolean = {
    if (k < 0) return false
    val sa = a.toString
    val sb = b.toString
    val n = sa.length
    val m = sb.length
    if (math.abs(n - m) > k) return false
    if (n == 0) return m <= k
    var prev = new Array[Int](m + 1)
    var curr = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      curr(0) = i
      var rowMin = i
      var jj = 1
      while (jj <= m) {
        val cost = if (sa.charAt(i - 1) == sb.charAt(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = curr(jj - 1) + 1
        if (ins < v) v = ins
        curr(jj) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      // Values never decrease along diagonals, and the final cell's
      // diagonal crosses every row — row minimum > k ⟹ lev > k.
      if (rowMin > k) return false
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m) <= k
  }
}

/** `graft_lev_leq(a, b, k)` — boolean bounded-Levenshtein test. */
case class BoundedLevenshtein(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_lev_leq requires (string, string, int), got ${a.sql}, ${b.sql}, ${c.sql}")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_lev_leq"

  override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    BoundedLevCore.leq(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) =>
      s"${ev.value} = graft.functions.BoundedLevCore.leq($a, $b, $k);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): BoundedLevenshtein = copy(first = f, second = s, third = t)
}

/** Rewrite `levenshtein(a,b) <op> k` (literal k) into the bounded kernel. */
object RewriteLevenshteinBound extends Rule[LogicalPlan] {

  // Every k < 0 is equivalent (lev >= 0, so the test is vacuously false on
  // non-null inputs): clamp to -1 rather than folding to Literal(false),
  // because the rule fires in arbitrary user plans (GraftExtensions injects
  // it globally) where a fold would turn NULL inputs into false. The
  // null-intolerant ternary keeps `levenshtein(NULL, b) <= k` ⇒ NULL.
  private def bounded(l: Expression, r: Expression, k: Int): Expression =
    BoundedLevenshtein(l, r, Literal(math.max(k, -1)))

  // Strict forms: `lev < k` ≡ `lev <= k-1`, but guard before decrementing —
  // `k - 1` at k = Int.MinValue wraps to Int.MaxValue and an always-false
  // predicate would become effectively always-true. k <= 0 strict is
  // vacuously false (lev >= 0), i.e. the clamped -1 kernel.
  private def strict(l: Expression, r: Expression, k: Int): Expression =
    bounded(l, r, if (k <= 0) -1 else k - 1)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) =>
        bounded(l, r, k)
      case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) =>
        strict(l, r, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) =>
        bounded(l, r, k)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) =>
        strict(l, r, k)
    }
}
