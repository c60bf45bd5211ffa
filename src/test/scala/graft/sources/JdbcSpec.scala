package graft.sources

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** S8/S9 against a REAL database: embedded Derby (on Spark's own
  * classpath) stands in for the reference's Postgres mirror
  * (etl/flows/sync_daily_enhanced.py:156-197, database/
  * change_tracking.py:369-434). This executes the exact adapter the
  * production path uses — range-partitioned parallel reads, predicate
  * pushdown into the database, and the MERGE-shaped watermark
  * write-back — rather than compile-checking it. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE db_mirror (case_ref BIGINT NOT NULL, " +
          "tenant_id BIGINT NOT NULL, last_serialno BIGINT NOT NULL)")
      val ins = conn.prepareStatement(
        "INSERT INTO db_mirror VALUES (?, ?, ?)")
      (1L to 1000L).foreach { i =>
        ins.setLong(1, i)
        ins.setLong(2, i % 4)
        ins.setLong(3, (i * 48271) % 100000)
        ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    } finally conn.close()
  }

  test("S8 live: range-partitioned JDBC read returns the mirror in N splits") {
    seeded
    val df = Adapters.jdbcSnapshot(spark, url, "db_mirror",
      partitionColumn = "case_ref", lowerBound = 1L, upperBound = 1001L,
      numPartitions = 4)
    // the range split is real parallelism: one partition per bound stripe
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000)
    // values round-trip exactly (Derby uppercases unquoted identifiers)
    val row = df.filter(col("CASE_REF") === 7L).head()
    assert(row.getAs[Long]("TENANT_ID") == 3L)
    assert(row.getAs[Long]("LAST_SERIALNO") == (7L * 48271) % 100000)
  }

  test("S8 live: tenant predicate is pushed into the database, not scanned") {
    seeded
    val df = Adapters.jdbcSnapshot(spark, url, "db_mirror",
      partitionColumn = "case_ref", lowerBound = 1L, upperBound = 1001L,
      numPartitions = 4)
      .filter(col("TENANT_ID") === 1L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(TENANT_ID,1)"),
      s"tenant filter must ship to the database as WHERE:\n$plan")
    assert(df.count() == 250)
  }

  test("S9 dialect upsert: batched upsert is idempotent against live Derby") {
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        "CREATE TABLE watermarks (tenant_id BIGINT NOT NULL, " +
          "case_ref BIGINT NOT NULL, last_serialno BIGINT NOT NULL, " +
          "PRIMARY KEY (tenant_id, case_ref))")
      conn.createStatement().executeUpdate(
        "INSERT INTO watermarks VALUES (0, 1, 10), (0, 2, 20)")
    } finally conn.close()

    def readBack(): Map[(Long, Long), Long] =
      spark.read.jdbc(url, "watermarks", new java.util.Properties())
        .collect()
        .map(r => (r.getAs[Long]("TENANT_ID"), r.getAs[Long]("CASE_REF")) ->
          r.getAs[Long]("LAST_SERIALNO")).toMap

    // 1 exists (moves forward), 3 and 4 are new
    val batch = Seq((0L, 1L, 999L), (0L, 3L, 30L), (1L, 4L, 40L))
      .toDF("tenant_id", "case_ref", "last_serialno")
    Upsert.upsert(batch, url, "watermarks",
      Seq("tenant_id", "case_ref"), Upsert.UpdateThenInsert)
    val expected = Map((0L, 1L) -> 999L, (0L, 2L) -> 20L,
      (0L, 3L) -> 30L, (1L, 4L) -> 40L)
    assert(readBack() == expected)

    // re-running the SAME batch is a no-op (the primary key would reject
    // duplicate inserts, so this proves misses vs hits are re-classified)
    Upsert.upsert(batch, url, "watermarks",
      Seq("tenant_id", "case_ref"), Upsert.UpdateThenInsert)
    assert(readBack() == expected)

    // a later batch advances in place
    Upsert.upsert(Seq((0L, 3L, 31L)).toDF("tenant_id", "case_ref", "last_serialno"),
      url, "watermarks", Seq("tenant_id", "case_ref"), Upsert.UpdateThenInsert)
    assert(readBack() == expected.updated((0L, 3L), 31L))
  }

  test("S9 dialect upsert: null values bind with declared SQL types") {
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE notes (tenant_id BIGINT NOT NULL, case_ref BIGINT NOT " +
        "NULL, note VARCHAR(64), PRIMARY KEY (tenant_id, case_ref))")
    finally conn.close()
    val batch = Seq((0L, 1L, Option("hello")), (0L, 2L, Option.empty[String]))
      .toDF("tenant_id", "case_ref", "note")
    // both the insert path and (on re-run) the update path must bind the
    // null through setNull with the declared VARCHAR type — Derby rejects
    // a bare setObject(i, null)
    Upsert.upsert(batch, url, "notes",
      Seq("tenant_id", "case_ref"), Upsert.UpdateThenInsert)
    Upsert.upsert(batch, url, "notes",
      Seq("tenant_id", "case_ref"), Upsert.UpdateThenInsert)
    val back = spark.read.jdbc(url, "notes", new java.util.Properties())
      .collect().map(r => r.getAs[Long]("CASE_REF") ->
        Option(r.getAs[String]("NOTE"))).toMap
    assert(back == Map(1L -> Some("hello"), 2L -> None))
  }

  test("S9 dialect upsert: duplicate conflict keys inside one batch collapse safely") {
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE dupes (tenant_id BIGINT NOT NULL, case_ref BIGINT NOT " +
        "NULL, last_serialno BIGINT NOT NULL, PRIMARY KEY (tenant_id, case_ref))")
    finally conn.close()
    // two change events for the same case in one batch: without the
    // key-level dedupe both would miss the UPDATE and collide on INSERT
    val batch = Seq((0L, 1L, 10L), (0L, 1L, 11L), (0L, 2L, 20L))
      .toDF("tenant_id", "case_ref", "last_serialno")
    Upsert.upsert(batch, url, "dupes",
      Seq("tenant_id", "case_ref"), Upsert.UpdateThenInsert)
    val back = spark.read.jdbc(url, "dupes", new java.util.Properties())
    assert(back.count() == 2)
    val v = back.filter(col("CASE_REF") === 1L)
      .head().getAs[Long]("LAST_SERIALNO")
    assert(v == 10L || v == 11L) // one of the duplicates, exactly one row
  }

  test("S9 dialect upsert: whole-row conflict keys render DO NOTHING / fail fast") {
    val sql = Upsert.Postgres.upsertSql("seen",
      Seq("tenant_id", "case_ref"), Seq("tenant_id", "case_ref")).get
    assert(sql == "INSERT INTO seen (tenant_id, case_ref) VALUES (?, ?) " +
      "ON CONFLICT (tenant_id, case_ref) DO NOTHING")
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      Upsert.upsert(Seq((0L, 1L)).toDF("tenant_id", "case_ref"),
        url, "seen", Seq("tenant_id", "case_ref"), Upsert.UpdateThenInsert)
    }
    assert(e.getMessage.contains("non-key column"))
  }

  test("S9 dialect upsert: Postgres renders the reference's ON CONFLICT form") {
    val sql = Upsert.Postgres.upsertSql("cases",
      Seq("tenant_id", "case_ref", "last_serialno", "is_active"),
      Seq("tenant_id", "case_ref")).get
    assert(sql ==
      "INSERT INTO cases (tenant_id, case_ref, last_serialno, is_active) " +
        "VALUES (?, ?, ?, ?) ON CONFLICT (tenant_id, case_ref) DO UPDATE SET " +
        "last_serialno = EXCLUDED.last_serialno, is_active = EXCLUDED.is_active")
  }

  test("S9 live: MERGE-shaped watermark advance round-trips through JDBC") {
    seeded
    import spark.implicits._
    val db = Adapters.jdbcSnapshot(spark, url, "db_mirror",
      partitionColumn = "case_ref", lowerBound = 1L, upperBound = 1001L,
      numPartitions = 4)
      .select(col("CASE_REF").as("case_ref"), col("TENANT_ID").as("tenant_id"),
        col("LAST_SERIALNO").as("last_serialno"))
    // processed cases move their watermark forward
    val processed = Seq((1L, 5L, 999999L), (2L, 10L, 888888L))
      .toDF("tenant_id", "case_ref", "serialno")
    val advanced = graft.sync.Reconcile.advanceOf(db, processed)
    // publish the merged snapshot back through the same JDBC channel
    advanced.write.mode("overwrite")
      .jdbc(url, "db_mirror_next", new java.util.Properties())
    // Spark QUOTES identifiers on CREATE, so the published table keeps
    // the frame's lowercase names (unlike the hand-DDL'd uppercase source)
    val back = spark.read.jdbc(url, "db_mirror_next", new java.util.Properties())
    assert(back.count() == 1000)
    val moved = back.filter(col("case_ref") === 5L).head()
    assert(moved.getAs[Long]("last_serialno") == 999999L)
    val kept = back.filter(col("case_ref") === 7L).head()
    assert(kept.getAs[Long]("last_serialno") == (7L * 48271) % 100000)
  }
}
