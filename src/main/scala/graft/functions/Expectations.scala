package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over landed tables — the
  * validation pass an extraction pipeline runs before publishing a batch
  * (the reference trusts its sources; a 100 TB lake cannot). Rules are a
  * small closed algebra; checking them is aggregation, never row
  * materialization:
  *
  *  - all ROW-LOCAL rules (not-null / range / set / regex) fold into ONE
  *    scan — a single aggregate of conditional counts, so adding a rule
  *    costs a column, not a pass;
  *  - `Unique` is one (count, countDistinct) aggregate over the key;
  *  - `FkIn` is an anti-join against the referenced key set (broadcast
  *    when small, shuffle otherwise — the planner's call).
  *
  * Output: one row per rule, (rule, n_violations) — integer counts,
  * engine-exact. Gate discipline: violations are COUNTED, not sampled;
  * a publish step comparing `n_violations == 0` is deterministic. */
object Expectations {

  sealed trait Rule { def name: String }
  /** Column must never be NULL. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }
  /** Non-null values must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** Non-null values must be one of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Rule {
    def name = s"in_set($col)"
  }
  /** Non-null values must match `regex` entirely. */
  final case class Matches(col: String, regex: String) extends Rule {
    def name = s"matches($col)"
  }
  /** Key must be unique (violations = rows beyond one per key). */
  final case class Unique(col: String) extends Rule {
    def name = s"unique($col)"
  }
  /** Every non-null value must appear in `ref`'s `refCol` (referential
    * integrity; violations = orphan rows). */
  final case class FkIn(col: String, ref: DataFrame, refCol: String)
    extends Rule { def name = s"fk($col)" }

  private def violation(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c) < lit(lo) || col(c) > lit(hi))
    case InSet(c, vs) => col(c).isNotNull && !col(c).isin(vs: _*)
    case Matches(c, re) => col(c).isNotNull && !col(c).rlike(re)
    case _ => lit(false)
  }

  /** Row-level violation predicate for ROW-LOCAL rules (not-null / range /
    * set / regex): true when the row breaks ANY of them — the routing
    * predicate for quarantine/dead-letter flows. Unique/FkIn are not
    * row-local and are rejected. */
  def rowViolation(rules: Seq[Rule]): Column = {
    require(rules.nonEmpty && rules.forall {
      case _: Unique | _: FkIn => false
      case _ => true
    }, "rowViolation takes row-local rules only")
    rules.map(violation).reduce(_ || _)
  }

  /** Check every rule; returns (rule, n_violations), one row per rule, in
    * rule order. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal = rules.filter {
      case _: Unique | _: FkIn => false
      case _ => true
    }
    val localCounts: Map[String, Long] =
      if (rowLocal.isEmpty) Map.empty
      else {
        val aggs = rowLocal.map(r =>
          sum(when(violation(r), 1L).otherwise(0L)).as(r.name))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        rowLocal.zipWithIndex.map { case (r, i) =>
          r.name -> (if (row.isNullAt(i)) 0L else row.getLong(i))
        }.toMap
      }
    val counts: Seq[(String, Long)] = rules.map {
      case u @ Unique(c) =>
        val row = df.filter(col(c).isNotNull)
          .agg(count(lit(1)).as("n"), countDistinct(col(c)).as("d")).head()
        u.name -> (row.getLong(0) - row.getLong(1))
      case f @ FkIn(c, ref, rc) =>
        f.name -> df.filter(col(c).isNotNull)
          .join(ref.select(col(rc).as(c)).distinct(), Seq(c), "left_anti")
          .count()
      case r => r.name -> localCounts(r.name)
    }
    counts.toDF("rule", "n_violations")
  }
}
