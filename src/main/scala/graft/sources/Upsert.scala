package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** S9 dialect-aware JDBC upsert — the write shape a Postgres-mirror user
  * reaches for (reference database/change_tracking.py:369-390:
  * `INSERT INTO cases … ON CONFLICT (tenant_id, case_ref) DO UPDATE SET
  * last_serialno = EXCLUDED.last_serialno, …`). The reference executes it
  * per case in a Python loop (change_tracking.py:411-434); here the frame
  * is repartitioned on the conflict key so each key is owned by exactly
  * one task (no cross-writer conflicts, no serialization failures to
  * retry), and each task streams prepared-statement BATCHES over one
  * connection — thousands of upserts per round trip instead of one.
  *
  * Engines without ON CONFLICT get [[UpdateThenInsert]]: batch UPDATEs,
  * read the per-row update counts, batch INSERTs for the misses — the
  * same two-statement emulation JDBC dialect layers use, correct under
  * the same single-writer-per-key partitioning. The Derby-executed spec
  * drives the full executor machinery through this dialect; the Postgres
  * dialect differs only in the SQL string it emits. */
object Upsert {

  /** A dialect either renders the one-statement native upsert, or None to
    * request the portable update-then-insert emulation. */
  sealed trait Dialect extends Serializable {
    def upsertSql(table: String, cols: Seq[String], keys: Seq[String]): Option[String]
  }

  /** Postgres `INSERT … ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c`
    * (change_tracking.py:372-379); a whole-row key (presence table)
    * renders DO NOTHING — an empty SET list is a syntax error. */
  case object Postgres extends Dialect {
    override def upsertSql(table: String, cols: Seq[String],
                           keys: Seq[String]): Option[String] = {
      val nonKeys = cols.filterNot(keys.contains)
      val action =
        if (nonKeys.isEmpty) "DO NOTHING"
        else "DO UPDATE SET " +
          nonKeys.map(c => s"$c = EXCLUDED.$c").mkString(", ")
      Some(s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
        s"ON CONFLICT (${keys.mkString(", ")}) $action")
    }
  }

  /** Portable emulation for engines without a native upsert (embedded
    * Derby in the spec): batched UPDATE, then batched INSERT of the rows
    * whose update count was 0. */
  case object UpdateThenInsert extends Dialect {
    override def upsertSql(table: String, cols: Seq[String],
                           keys: Seq[String]): Option[String] = None
  }

  /** Upsert `df` into `table` on the `keys` conflict target. Repartitions
    * on the keys first: one writer per key is what makes both the native
    * and emulated paths race-free without engine-level retries. */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
             dialect: Dialect, batchSize: Int = 1000): Unit = {
    val cols = df.columns.toSeq
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"conflict keys $keys must be columns of $cols")
    require(dialect.upsertSql(table, cols, keys).isDefined ||
      cols.exists(!keys.contains(_)),
      "the update-then-insert emulation needs at least one non-key column; " +
        "for a whole-row key use a native dialect (Postgres renders DO NOTHING)")
    // null binding needs a declared SQL type on strict drivers (Derby
    // rejects a bare setObject(i, null)); derive per-column types once
    val sqlTypes: Map[String, Int] = df.schema.fields.map(f =>
      f.name -> jdbcType(f.dataType)).toMap
    // one physical row per conflict key per batch: duplicate keys in one
    // chunk would otherwise both miss the UPDATE and collide on INSERT in
    // the emulated path (and land in unspecified order in the native one
    // — row order inside a frame is arbitrary either way, so collapsing
    // duplicates makes the two dialects agree instead of diverging)
    df.dropDuplicates(keys)
      .repartition(keys.map(col): _*).foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          dialect.upsertSql(table, cols, keys) match {
            case Some(sql) => runNative(conn, sql, cols, sqlTypes, rows, batchSize)
            case None => runEmulated(conn, table, cols, keys, sqlTypes, rows, batchSize)
          }
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }

  private def jdbcType(dt: org.apache.spark.sql.types.DataType): Int = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => java.sql.Types.BIGINT
      case IntegerType => java.sql.Types.INTEGER
      case ShortType => java.sql.Types.SMALLINT
      case DoubleType => java.sql.Types.DOUBLE
      case FloatType => java.sql.Types.REAL
      case BooleanType => java.sql.Types.BOOLEAN
      case DateType => java.sql.Types.DATE
      case _: TimestampType => java.sql.Types.TIMESTAMP
      case _: DecimalType => java.sql.Types.DECIMAL
      case BinaryType => java.sql.Types.BINARY
      case _ => java.sql.Types.VARCHAR
    }
  }

  private def bind(st: PreparedStatement, row: Row, cols: Seq[String],
                   sqlTypes: Map[String, Int], offset: Int = 0): Unit =
    cols.zipWithIndex.foreach { case (c, i) =>
      row.getAs[Any](c) match {
        case null => st.setNull(offset + i + 1, sqlTypes(c))
        case v => st.setObject(offset + i + 1, v)
      }
    }

  private def runNative(conn: Connection, sql: String, cols: Seq[String],
                        sqlTypes: Map[String, Int], rows: Iterator[Row],
                        batchSize: Int): Unit = {
    val st = conn.prepareStatement(sql)
    try {
      var pending = 0
      rows.foreach { r =>
        bind(st, r, cols, sqlTypes)
        st.addBatch()
        pending += 1
        if (pending >= batchSize) { st.executeBatch(); pending = 0 }
      }
      if (pending > 0) st.executeBatch()
    } finally st.close()
  }

  private def runEmulated(conn: Connection, table: String, cols: Seq[String],
                          keys: Seq[String], sqlTypes: Map[String, Int],
                          rows: Iterator[Row], batchSize: Int): Unit = {
    val nonKeys = cols.filterNot(keys.contains)
    val upd = conn.prepareStatement(
      s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keys.map(k => s"$k = ?").mkString(" AND ")}")
    val ins = conn.prepareStatement(
      s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})")
    try {
      rows.grouped(batchSize).foreach { chunk =>
        chunk.foreach { r =>
          bind(upd, r, nonKeys, sqlTypes)
          bind(upd, r, keys, sqlTypes, offset = nonKeys.length)
          upd.addBatch()
        }
        val counts = upd.executeBatch()
        var inserts = 0
        chunk.iterator.zip(counts.iterator).foreach { case (r, n) =>
          // SUCCESS_NO_INFO drivers don't report batched update counts:
          // re-run that row's update singly to learn hit vs miss — slower
          // on such drivers, but never silently drops a missed insert
          val updated =
            if (n != java.sql.Statement.SUCCESS_NO_INFO) n
            else {
              bind(upd, r, nonKeys, sqlTypes)
              bind(upd, r, keys, sqlTypes, offset = nonKeys.length)
              upd.executeUpdate()
            }
          if (updated == 0) {
            bind(ins, r, cols, sqlTypes); ins.addBatch(); inserts += 1
          }
        }
        if (inserts > 0) ins.executeBatch()
      }
    } finally { upd.close(); ins.close() }
  }
}
