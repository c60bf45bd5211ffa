package graft.sync

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A signed changelog row: +1 insert, -1 delete (updates are a pair). */
case class MvDelta(k: Long, sign: Long, v: Long)

/** A live MV row emitted by the streaming maintainer; n == 0 is the
  * deletion tombstone a sink uses to drop the key. */
case class MvLive(k: Long, n: Long, s: Long)

/** Incremental view maintenance (IVM) — the batch twin of the streaming
  * watermark sync: keep a materialized aggregate current by merging a
  * CDC changelog into it instead of rescanning the fact table. The
  * reference recomputes its dashboard aggregates from scratch every
  * cycle (etl/flows/sync_daily.py re-runs the full metric queries); at
  * 100 TB a full rescan for a 0.1% daily delta is the single most
  * expensive wrong plan a pipeline can run, so the merge form is the
  * one that matters at scale.
  *
  * Algebra: for commutative-group aggregates (count, sum) a changelog of
  * signed rows (+1 insert, -1 delete; an update is a -1/+1 pair) folds
  * into per-key deltas, and
  *   merged(k) = base(k) ⊕ delta(k),   keys with count 0 drop out.
  * The merge's inputs are both MV-sized (|keys|, not |facts|) — the fact
  * table is never rescanned. min/max are NOT group-invertible under
  * deletes, so [[touchedMinMax]] does the correct narrow thing instead:
  * re-aggregate ONLY the keys the changelog touched with a delete, via a
  * broadcast semi-join that prunes untouched keys map-side.
  *
  * Fixture (deterministic stand-ins for yesterday's table + today's CDC
  * feed, all pure integer arithmetic so both engines replay them):
  *  - measure: cents = (o_orderkey * 7919) % 100000;
  *  - base state: orders with o_orderkey % 13 != 0;
  *  - changelog precedence per order key: % 13 == 0 -> INSERT(+1);
  *    else % 17 == 0 -> DELETE(-1); else % 19 == 0 -> UPDATE
  *    (-1 old, +1 at cents + 777).
  * The registered queries derive base MV and changelog from the same
  * orders scan for self-containment; a deployed pipeline reads the
  * stored MV and the CDC topic. The DuckDB oracles recompute every
  * answer FROM THE POST-CHANGELOG STATE with none of the merge algebra,
  * so a hash match is a machine-checked proof that merge == recompute.
  * IvmPropSpec proves the same for random changelogs (vanishing keys,
  * fresh keys, negative deltas) against a Spark-side recompute.
  */
object Ivm {

  /** Update value shift (the "price correction" of the update rows). */
  val UpdateShift = 777L

  private def cents(id: Column): Column = (id * 7919L) % 100000L

  /** Generic merge core: `baseMv` (k, n, s) ⊕ signed per-key deltas from
    * `changelog` (k, sign, v). Full-outer on the key so fresh keys enter
    * and emptied keys (n == 0) drop. Both join inputs are MV-sized; the
    * changelog fold is map-side combinable. */
  private[graft] def mergeOf(baseMv: DataFrame, changelog: DataFrame): DataFrame = {
    val delta = changelog.groupBy("k")
      .agg(sum(col("sign")).as("dn"),
        sum(col("sign") * col("v")).as("ds"))
    baseMv.join(delta, Seq("k"), "full_outer")
      .select(col("k"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .filter(col("n") > 0)
  }

  /** The fixture changelog: one orders scan, each row exploding to its
    * 0/1/2 signed changelog entries by the precedence rule. */
  private[graft] def changelogOf(orders: DataFrame): DataFrame = {
    val id = col("o_orderkey")
    val v = col("v")
    val entry = (sign: Long, value: Column) =>
      struct(lit(sign).as("sign"), value.as("v"))
    orders
      .select(col("o_custkey").as("k"), id.as("id"), cents(id).as("v"))
      .select(col("k"), explode(
        when(col("id") % 13 === 0, array(entry(1L, v)))
          .when(col("id") % 17 === 0, array(entry(-1L, v)))
          .when(col("id") % 19 === 0,
            array(entry(-1L, v), entry(1L, v + UpdateShift)))
          .otherwise(array().cast(
            "array<struct<sign:bigint,v:bigint>>"))).as("e"))
      .select(col("k"), col("e.sign").as("sign"), col("e.v").as("v"))
  }

  /** The post-changelog fact state (what the oracle recomputes from):
    * inserts at v, survivors at v (or v + shift when updated). */
  private[graft] def newStateOf(orders: DataFrame): DataFrame = {
    val id = col("o_orderkey")
    orders
      .filter(!(id % 13 =!= 0 && id % 17 === 0)) // deletes gone
      .select(col("o_custkey").as("k"),
        when(id % 13 === 0, cents(id))
          .when(id % 19 === 0, cents(id) + UpdateShift)
          .otherwise(cents(id)).as("v"))
  }

  /** Registered merge: base MV (from yesterday's state) ⊕ changelog,
    * WITHOUT touching the post-changelog facts. The oracle recomputes
    * from the post-changelog state — hash match proves the algebra. */
  def mergeRefresh(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.orders(spark, dir)
    val base = orders.filter(col("o_orderkey") % 13 =!= 0)
      .select(col("o_custkey").as("k"), cents(col("o_orderkey")).as("v"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    mergeOf(base, changelogOf(orders))
      .select(col("k").as("o_custkey"), col("n").as("n_orders"),
        col("s").as("sum_cents"))
  }

  /** min/max refresh under deletes: re-aggregate ONLY the keys touched
    * by a negative changelog entry, from the new state, semi-joined so
    * untouched keys never leave the scan. Keys whose rows all vanished
    * produce no row (the MV entry is deleted). The touched set carries
    * NO forced broadcast hint: it is delta-bounded, not k-bounded (a
    * backfill changelog can touch every key), so AQE picks broadcast
    * when the delta measures small and falls back to a shuffle join
    * when it doesn't — the round-13 survivor-set convention. */
  def touchedMinMax(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.orders(spark, dir)
    val touched = changelogOf(orders).filter(col("sign") < 0)
      .select("k").distinct()
    newStateOf(orders)
      .join(touched, Seq("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_orders"),
        min(col("v")).as("min_cents"), max(col("v")).as("max_cents"))
      .select(col("k").as("o_custkey"), col("n_orders"),
        col("min_cents"), col("max_cents"))
  }

  /** Spec/ops probe: distinct keys the fixture changelog touches with a
    * delete — the measured stat [[touchedMinMax]]'s no-hint broadcast
    * expectation rests on (PlanSpec asserts it is far under the pinned
    * broadcast threshold before asserting the AQE plan choice). */
  private[graft] def touchedKeysCount(spark: SparkSession, dir: String): Long =
    changelogOf(graft.Tables.orders(spark, dir))
      .filter(col("sign") < 0).select("k").distinct().count()

  /** One-row refresh audit — the "work proportional to the delta" claim
    * in numbers: changelog composition, touched vs total keys, and how
    * many MV entries vanish. */
  def audit(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.orders(spark, dir)
    val id = col("o_orderkey")
    val counts = orders.agg(
      coalesce(sum(when(id % 13 === 0, 1L).otherwise(0L)), lit(0L))
        .as("n_inserts"),
      coalesce(sum(when(id % 13 =!= 0 && id % 17 === 0, 1L).otherwise(0L)),
        lit(0L)).as("n_deletes"),
      coalesce(sum(when(id % 13 =!= 0 && id % 17 =!= 0 && id % 19 === 0,
        1L).otherwise(0L)), lit(0L)).as("n_updates"))
    val touched = changelogOf(orders).agg(
      countDistinct(col("k")).as("n_keys_touched"))
    val baseKeys = orders.filter(id % 13 =!= 0)
      .select(col("o_custkey").as("k")).distinct().persist()
    val newKeys = newStateOf(orders).select("k").distinct().persist()
    val before = baseKeys.agg(count(lit(1)).as("mv_keys_before"))
    val after = newKeys.agg(count(lit(1)).as("mv_keys_after"))
    val vanished = baseKeys.join(newKeys, Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_keys_vanished"))
    counts.crossJoin(broadcast(touched)).crossJoin(broadcast(before))
      .crossJoin(broadcast(after)).crossJoin(broadcast(vanished))
  }

  /** The STREAMING MV maintainer — [[mergeOf]]'s fold as keyed state
    * over a changelog stream, so the view stays current per micro-batch
    * instead of per refresh cycle. Same algebra, same drop-at-zero
    * semantics (emitted as an n == 0 tombstone the sink deletes on);
    * IvmStreamSpec proves the final streamed MV equals the batch merge
    * under random micro-batch splits of the same changelog — the
    * batch/stream equivalence every twin in this library carries. */
  def mvStreamOf(deltas: Dataset[MvDelta]): Dataset[MvLive] = {
    import deltas.sparkSession.implicits._
    deltas.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (k: Long, rows: Iterator[MvDelta], state: GroupState[MvLive]) => {
          val cur = state.getOption.getOrElse(MvLive(k, 0L, 0L))
          val folded = rows.foldLeft(cur)((st, r) =>
            MvLive(k, st.n + r.sign, st.s + r.sign * r.v))
          state.update(folded)
          Iterator(folded)
        })
  }

  /** Sketches are LINEAR, so they refresh exactly like count/sum: fold
    * the signed changelog into the a15d count-min grid (same hash
    * family via [[graft.metrics.Dashboard.cmsBuckets]]) — no fact
    * rescan, cells-sized join inputs, cells drained to zero drop out.
    * The oracle rebuilds the grid from the post-changelog state, so the
    * hash match is the linearity proof: CMS(base) ⊕ CMS(changelog) ==
    * CMS(new state), cell for cell. Same-key update pairs cancel in the
    * key sketch before they ever reach it. */
  def cmsMergeRefresh(spark: SparkSession, dir: String): DataFrame = {
    import graft.metrics.Dashboard
    val orders = graft.Tables.orders(spark, dir)
    val baseCells = orders.filter(col("o_orderkey") % 13 =!= 0)
      .select(explode(Dashboard.cmsBuckets(col("o_custkey"))).as("e"))
      .groupBy(col("e.depth").as("depth"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val deltaCells = changelogOf(orders)
      .select(col("sign"), explode(Dashboard.cmsBuckets(col("k"))).as("e"))
      .groupBy(col("e.depth").as("depth"), col("e.bucket").as("bucket"))
      .agg(sum(col("sign")).as("dcnt"))
    baseCells.join(deltaCells, Seq("depth", "bucket"), "full_outer")
      .select(col("depth").cast("long").as("depth"), col("bucket"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L)))
          .as("cnt"))
      .filter(col("cnt") > 0)
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "ivm_merge_refresh" -> ((s, d) => mergeRefresh(s, d)),
    "ivm_touched_minmax" -> ((s, d) => touchedMinMax(s, d)),
    "ivm_cms_merge" -> ((s, d) => cmsMergeRefresh(s, d)),
    "ivm_audit" -> ((s, d) => audit(s, d)))

  /** Post-changelog state in SQL — the oracle recomputes from here with
    * no merge algebra anywhere. */
  private val newStateCte: String =
    s"""WITH ns AS (
       |  SELECT o_custkey AS k, (o_orderkey * 7919) % 100000 AS v
       |  FROM orders WHERE o_orderkey % 13 = 0
       |  UNION ALL
       |  SELECT o_custkey, (o_orderkey * 7919) % 100000
       |  FROM orders
       |  WHERE o_orderkey % 13 <> 0 AND o_orderkey % 17 <> 0
       |    AND o_orderkey % 19 <> 0
       |  UNION ALL
       |  SELECT o_custkey, (o_orderkey * 7919) % 100000 + $UpdateShift
       |  FROM orders
       |  WHERE o_orderkey % 13 <> 0 AND o_orderkey % 17 <> 0
       |    AND o_orderkey % 19 = 0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ivm_merge_refresh" ->
      s"""$newStateCte
         |SELECT k AS o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         |       CAST(sum(v) AS BIGINT) AS sum_cents
         |FROM ns GROUP BY 1""".stripMargin,
    "ivm_touched_minmax" ->
      s"""$newStateCte,
         |touched AS (
         |  SELECT DISTINCT o_custkey AS k FROM orders
         |  WHERE o_orderkey % 13 <> 0
         |    AND (o_orderkey % 17 = 0 OR o_orderkey % 19 = 0))
         |SELECT k AS o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         |       CAST(min(v) AS BIGINT) AS min_cents,
         |       CAST(max(v) AS BIGINT) AS max_cents
         |FROM ns JOIN touched USING (k) GROUP BY 1""".stripMargin,
    "ivm_audit" ->
      s"""$newStateCte,
         |cc AS (
         |  SELECT CAST(coalesce(sum(CASE WHEN o_orderkey % 13 = 0
         |           THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_inserts,
         |         CAST(coalesce(sum(CASE WHEN o_orderkey % 13 <> 0
         |           AND o_orderkey % 17 = 0 THEN 1 ELSE 0 END), 0)
         |           AS BIGINT) AS n_deletes,
         |         CAST(coalesce(sum(CASE WHEN o_orderkey % 13 <> 0
         |           AND o_orderkey % 17 <> 0 AND o_orderkey % 19 = 0
         |           THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_updates
         |  FROM orders),
         |tk AS (
         |  SELECT CAST(count(DISTINCT o_custkey) AS BIGINT)
         |           AS n_keys_touched
         |  FROM orders
         |  WHERE o_orderkey % 13 = 0
         |     OR (o_orderkey % 13 <> 0 AND o_orderkey % 17 = 0)
         |     OR (o_orderkey % 13 <> 0 AND o_orderkey % 17 <> 0
         |         AND o_orderkey % 19 = 0)),
         |bk AS (SELECT DISTINCT o_custkey AS k FROM orders
         |       WHERE o_orderkey % 13 <> 0),
         |nk AS (SELECT DISTINCT k FROM ns),
         |bc AS (SELECT CAST(count(*) AS BIGINT) AS mv_keys_before FROM bk),
         |ac AS (SELECT CAST(count(*) AS BIGINT) AS mv_keys_after FROM nk),
         |vc AS (SELECT CAST(count(*) AS BIGINT) AS n_keys_vanished
         |       FROM bk WHERE k NOT IN (SELECT k FROM nk))
         |SELECT * FROM cc CROSS JOIN tk CROSS JOIN bc
         |CROSS JOIN ac CROSS JOIN vc""".stripMargin,
    // the a15d hash family verbatim (Dashboard.cmsBuckets), rebuilt from
    // the post-changelog state — zero merge algebra on this side
    "ivm_cms_merge" ->
      s"""$newStateCte,
         |g AS (SELECT ((k % 1000000007) + 1000000007) % 1000000007 AS gv
         |      FROM ns),
         |b AS (
         |  SELECT d.d AS depth,
         |         CASE d.d
         |           WHEN 0 THEN (gv * 1315423911 % 1000000007 + 31)
         |                       % 1000000007 % 64
         |           WHEN 1 THEN (gv * 2654435761 % 1000000007 + 151)
         |                       % 1000000007 % 64
         |           ELSE (gv * 97787 % 1000000007 + 997) % 1000000007 % 64
         |         END AS bucket
         |  FROM g CROSS JOIN (VALUES (0), (1), (2)) d(d))
         |SELECT CAST(depth AS BIGINT) AS depth, CAST(bucket AS BIGINT) AS bucket,
         |       CAST(count(*) AS BIGINT) AS cnt
         |FROM b GROUP BY 1, 2""".stripMargin)
}
