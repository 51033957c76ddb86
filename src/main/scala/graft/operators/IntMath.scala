package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared exact integer column arithmetic.
  *
  * The obvious division idiom `(a - a % n) / n` is NOT exact on long
  * columns: Spark's `/` is double division, so a dividend above 2^53
  * rounds BEFORE dividing (verified: a = 2^53 + 1, n = 1 loses the
  * +1) — precisely the "corpus-scale products" regime the e4
  * fixed-point outputs target, and a divergence from the DuckDB
  * oracles' exact `//`. Routing the already-exactly-divisible
  * numerator through decimal(38,0) keeps every digit: decimal
  * division is exact arithmetic, and the cast back to long is
  * lossless because the quotient is integral by construction.
  */
private[graft] object IntMath {

  /** Exact integer division TRUNCATING TOWARD ZERO — the semantics
    * of DuckDB's `//` (verified: -1300 // 3 = -433 there, not the
    * floor -434), so oracled outputs match on signed inputs too;
    * Spark's `%` follows the dividend sign, which makes
    * `(a - a % n)` round toward zero by construction. On the
    * non-negative inputs most callers feed, truncation == floor. */
  def idivTrunc(a: Column, n: Column): Column =
    ((a - (a % n)).cast("decimal(38,0)") / n).cast("long")

  /** Exact `(x * scale) div n` for fixed-point ratios whose NUMERATOR
    * can pass 2^63: `x` is widened to decimal(38,0) BEFORE the scale
    * multiply, so a corpus-scale sum times an e2/e4 scale never wraps
    * in long arithmetic (a long numerator `x * 10000` silently wraps
    * once x exceeds ~9.2e14 — exactly the token-sum magnitudes the e4
    * outputs target). Decimal `%`/`/` are exact, truncation toward
    * zero matches [[idivTrunc]] and DuckDB's `//`. Callers guarantee
    * the QUOTIENT fits a long (ratios scaled by <= 1e6 always do). */
  def scaledDivTrunc(x: Column, scale: Long, n: Column): Column = {
    val a = x.cast("decimal(38,0)") * lit(scale)
    ((a - (a % n)) / n).cast("long")
  }
}
