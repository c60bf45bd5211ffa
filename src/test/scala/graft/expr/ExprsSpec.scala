package graft.expr

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Unit + property tests for the expression library. Columns are evaluated
  * by selecting over small in-memory DataFrames (the expressions are pure,
  * so one row per input case suffices). Property cases are drawn from
  * ScalaCheck generators with a fixed seed (no scalatest-plus bridge in
  * the offline cache), then evaluated in one batched select per property.
  */
class ExprsSpec extends SparkSpec {
  import spark.implicits._

  /** n deterministic samples from a generator. */
  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def evalStr(input: Seq[String],
                      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] =
    input.toDF("c").select(f(col("c")).as("r")).collect().map(_.get(0)).toSeq

  test("parseCurrency handles £, commas, [Empty], null") {
    val got = evalStr(Seq("£4,781.40", "1,000,000.00", "[Empty]", "12.50"),
      Exprs.parseCurrency)
    assert(got(0) == new java.math.BigDecimal("4781.40"))
    assert(got(1) == new java.math.BigDecimal("1000000.00"))
    assert(got(2) == null)
    assert(got(3) == new java.math.BigDecimal("12.50"))
  }

  test("multiFormatDate parses UK slash, ISO, long-form and ordinals") {
    val got = evalStr(
      Seq("18/09/2024", "2024-09-18", "18 September 2024", "4th October 2024",
        "1st January 2020", "not a date", "32/01/2024"),
      Exprs.multiFormatDate)
    val d = java.sql.Date.valueOf("2024-09-18")
    assert(got(0) == d && got(1) == d && got(2) == d)
    assert(got(3) == java.sql.Date.valueOf("2024-10-04"))
    assert(got(4) == java.sql.Date.valueOf("2020-01-01"))
    assert(got(5) == null)
    assert(got(6) == null)
  }

  test("multiFormatDate round-trips any date rendered in its formats (property)") {
    val dates = samples(Gen.choose(0L, 20000L)) // epoch days, 1970..2024
      .map(java.time.LocalDate.ofEpochDay)
    val rendered = dates.flatMap(d => Seq(
      (f"${d.getDayOfMonth}/${d.getMonthValue}/${d.getYear}", d),
      (d.toString, d)))
    val got = evalStr(rendered.map(_._1), Exprs.multiFormatDate)
    got.zip(rendered).foreach { case (g, (s, d)) =>
      assert(g == java.sql.Date.valueOf(d), s"render '$s' of $d")
    }
  }

  test("extractMoney finds the amount inside free text") {
    val got = evalStr(Seq("Settlement agreed £4,781.40 on file", "no money here"),
      Exprs.extractMoney)
    assert(got(0) == new java.math.BigDecimal("4781.40"))
    assert(got(1) == null)
  }

  test("clamp01 clamps into [0,1] (property)") {
    val xs = samples(Gen.choose(-10.0, 10.0))
    val got = xs.toDF("c").select(Exprs.clamp01(col("c"))).collect()
      .map(_.getDouble(0)).toSeq
    xs.zip(got).foreach { case (x, r) =>
      assert(r >= 0.0 && r <= 1.0)
      if (x >= 0.0 && x <= 1.0) assert(r == x)
    }
  }

  test("serialOf is deterministic, non-negative, < 100000 (property)") {
    val ks = samples(Gen.choose(0L, 10000000L))
    val got = ks.toDF("c").select(Exprs.serialOf(col("c"))).collect()
      .map(_.getLong(0)).toSeq
    val again = ks.toDF("c").select(Exprs.serialOf(col("c"))).collect()
      .map(_.getLong(0)).toSeq
    assert(got == again)
    got.foreach(v => assert(v >= 0 && v < 100000))
  }

  test("activeCase excludes closed/complete regardless of is_active") {
    val rows = Seq((true, "active"), (true, "Complete"), (true, "closed"),
      (false, "active")).toDF("ia", "st")
    val got = rows.select(Exprs.activeCase(col("ia"), col("st"))).collect()
      .map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false, false, false))
  }

  test("statusIsLive: keyword containment beats the closed-date fallback") {
    val rows = Seq(
      ("In Progress", null.asInstanceOf[String]),
      ("Settled - payment agreed", null.asInstanceOf[String]),
      ("Case Closed", null.asInstanceOf[String]),
      ("Active", "2024-01-01"),
      ("Active", null.asInstanceOf[String])).toDF("st", "closed")
    val got = rows.select(Exprs.statusIsLive(col("st"), col("closed")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false, false, false, true))
  }

  test("containsAny matches any term, case-insensitively") {
    val got = evalStr(Seq("the JOIN operator", "nothing here"),
      c => Exprs.containsAny(c, Seq("join", "filter")))
    assert(got == Seq(true, false))
  }

  test("interpolate: full-string refs resolve, everything else kept verbatim") {
    val vars = Map("API_KEY" -> "sk-123", "HOST" -> "db.internal")
    val got = evalStr(Seq(
      "${API_KEY}",        // resolves
      "${HOST}",           // resolves
      "${MISSING}",        // unresolvable -> kept (warn-and-keep)
      "plain value",       // not a reference
      "${API_KEY}suffix",  // partial match is NOT a reference
      "pre${API_KEY}",     // ditto
      ""),                 // empty string untouched
      c => Exprs.interpolate(c, vars))
    assert(got == Seq("sk-123", "db.internal", "${MISSING}", "plain value",
      "${API_KEY}suffix", "pre${API_KEY}", ""))
    // empty map: identity
    val id = evalStr(Seq("${API_KEY}", "x"), c => Exprs.interpolate(c, Map.empty))
    assert(id == Seq("${API_KEY}", "x"))
  }

  test("interpolate: resolved values with regex/escape metacharacters pass " +
    "through literally") {
    // the lookup is element_at on a literal map — no regex replacement
    // path exists, so $, backslash, and brace characters in VALUES must
    // survive byte-for-byte
    val vars = Map("P" -> "pa$$\\w{2}rd", "Q" -> "${NESTED}")
    val got = evalStr(Seq("${P}", "${Q}"), c => Exprs.interpolate(c, vars))
    assert(got == Seq("pa$$\\w{2}rd", "${NESTED}"))
  }
}
