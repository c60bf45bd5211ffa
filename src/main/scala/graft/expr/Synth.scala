package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic synthesis of the reference's string-shaped inputs
  * (currency strings, free-text notes) from numeric testdata columns —
  * with the exact DuckDB SQL that reproduces the same bytes. Shared by the
  * expression queries and the case-document pipeline.
  */
object Synth {

  /** "£1,234.56"-style rendering of o_totalprice (values are all in
    * [1000, 1M) so one thousands separator suffices). floor/cast dance
    * avoids engine-specific double->int rounding (DuckDB rounds, Spark
    * truncates — floor first makes them agree). */
  def moneyStr(totalprice: Column): Column = {
    val v = totalprice.cast("decimal(12,2)")
    val i = floor(v).cast("long")
    val f = (v * 100).cast("long") % 100
    concat(
      lit("£"),
      when(i >= 1000,
        concat((i / 1000).cast("long").cast("string"), lit(","),
          lpad((i % 1000).cast("string"), 3, "0")))
        .otherwise(i.cast("string")),
      lit("."), lpad(f.cast("string"), 2, "0"))
  }

  /** DuckDB equivalent of [[moneyStr]] over columns i/f (see [[moneyCte]]).
    * Single line: interpolated into stripMargin strings where embedded
    * newlines would collide with margin stripping. */
  val moneyStrSql: String =
    "'£' || CASE WHEN i >= 1000 THEN (i // 1000)::VARCHAR || ',' || lpad((i % 1000)::VARCHAR, 3, '0') ELSE i::VARCHAR END || '.' || lpad(f::VARCHAR, 2, '0')"

  /** CTE computing the integer/fraction parts feeding [[moneyStrSql]]. */
  val moneyCte: String =
    """WITH b AS (
      |  SELECT o_orderkey,
      |         CAST(floor(CAST(o_totalprice AS DECIMAL(12,2))) AS BIGINT) AS i,
      |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) % 100 AS f
      |  FROM orders)""".stripMargin
}
