package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, Join, LocalLimit, LogicalPlan, Project, Sort, Window}

/** Scale linter for query plans — the rules this engine's own PlanSpec
  * enforces on its registered queries, packaged so ANY query can be
  * audited BEFORE it runs (`df.queryExecution.optimizedPlan` is available
  * without executing). At 100 TB the difference between a per-key window
  * and a global one is a job that finishes versus a reducer that dies at
  * hour six; the audit makes the engine's scale rules checkable in CI
  * rather than tribal knowledge.
  *
  * Rules (error = known scale-killer, warning = needs a human to confirm
  * the operand is bounded):
  *  - `global-window` (error): a Window with no PARTITION BY moves every
  *    row to one task.
  *  - `cartesian-join` (error): a cross/condition-less join with NO
  *    broadcast hint multiplies partitions; the hinted form
  *    (`crossJoin(broadcast(...))` — the 1-row scalar-anchor idiom used
  *    throughout this engine) is exempt because the hint is the caller's
  *    assertion that one side is bounded.
  *  - `global-sort-no-limit` (warning): ORDER BY without a LIMIT above it
  *    range-shuffles the full output; legitimate for bounded output or a
  *    final sorted write, fatal as a mid-pipeline step. */
object PlanAudit {

  final case class Finding(level: String, rule: String, detail: String)

  def audit(df: DataFrame): Seq[Finding] = auditPlan(df.queryExecution.optimizedPlan)

  def auditPlan(plan: LogicalPlan): Seq[Finding] = {
    val findings = Seq.newBuilder[Finding]

    plan.foreach {
      // empty forall = true, so this covers both "no PARTITION BY" and the
      // disguised form partitionBy(lit(...)) — constants hash every row to
      // the same task just as surely as no partition at all
      case w: Window if w.partitionSpec.forall(_.foldable) =>
        findings += Finding("error", "global-window",
          s"window [${w.windowExpressions.map(_.name).mkString(", ")}] has no " +
            "non-constant PARTITION BY: every row lands on one task. " +
            "Partition by a key, or for top-K use orderBy(...).limit(k).")
      case j: Join if (j.joinType == Cross || j.condition.isEmpty) &&
          !Seq(j.hint.leftHint, j.hint.rightHint)
            .flatten.exists(_.strategy.nonEmpty) =>
        findings += Finding("error", "cartesian-join",
          "cross join without a broadcast hint multiplies partitions; " +
            "broadcast() the bounded side (the scalar-anchor idiom) or add " +
            "a join condition.")
      case _ => ()
    }

    // global sorts are fine directly under a limit (TakeOrderedAndProject)
    // — walk with the path so ancestors are visible
    def sorts(node: LogicalPlan, underLimit: Boolean): Unit = node match {
      case s: Sort if s.global && !underLimit =>
        findings += Finding("warning", "global-sort-no-limit",
          s"ORDER BY [${s.order.map(_.sql).mkString(", ")}] without a LIMIT " +
            "above it range-shuffles the full output; confirm the output is " +
            "bounded or move the sort into the write.")
        s.children.foreach(sorts(_, underLimit = false))
      case _: GlobalLimit | _: LocalLimit =>
        node.children.foreach(sorts(_, underLimit = true))
      // order-preserving unaries keep the limit's protection; anything
      // else (aggregate, join, ...) breaks the ordering contract
      case _: Project | _: Filter =>
        node.children.foreach(sorts(_, underLimit))
      case other =>
        other.children.foreach(sorts(_, underLimit = false))
    }
    sorts(plan, underLimit = false)

    findings.result()
  }

  /** CI guard: throw if the plan contains any error-level finding. */
  def assertScaleSafe(df: DataFrame): Unit = {
    val errors = audit(df).filter(_.level == "error")
    require(errors.isEmpty,
      s"plan audit found scale-killers:\n${errors.map(f => s"  [${f.rule}] ${f.detail}").mkString("\n")}")
  }
}
