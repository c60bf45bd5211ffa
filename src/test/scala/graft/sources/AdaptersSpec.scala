package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Adapter round-trips over temp files shaped like the reference's real
  * inputs (FDM CSV header, nested dossier JSON, raw binary docs). */
class AdaptersSpec extends SparkSpec {

  test("S1: CSV snapshot applies the reference column mapping") {
    val dir = Files.createTempDirectory("graft-csv")
    val csv = dir.resolve("cases.csv")
    Files.writeString(csv,
      """Solicitor Reference,Status,Category,Client,Handler,Opened
        |NBC200993.001,Active,Housing Disrepair,Smith,JD,4th October 2024
        | NBC200994.001 ,Complete,Housing Disrepair,Jones,JD,18/09/2024
        |NBC200995.001,Active,Clinical Negligence,Brown,KL,2024-01-15
        |""".stripMargin)
    val df = Adapters.csvSnapshot(spark, csv.toString, "fdm_solicitors")
    val rows = df.orderBy("case_ref").collect()
    assert(rows.length == 3)
    val first = rows.head
    assert(first.getAs[String]("case_ref") == "NBC200993.001")
    assert(first.getAs[Boolean]("is_active"))
    assert(first.getAs[java.sql.Date]("opened_date") ==
      java.sql.Date.valueOf("2024-10-04"))
    // trimmed ref + inactive complete row
    assert(rows(1).getAs[String]("case_ref") == "NBC200994.001")
    assert(!rows(1).getAs[Boolean]("is_active"))
    // serialno stable and bounded
    rows.foreach { r =>
      val s = r.getAs[Long]("serialno")
      assert(s >= 0 && s < 100000)
    }
    assert(df.filter(col("tenant_id") =!= "fdm_solicitors").count() == 0)
  }

  test("S2/S13: YAML case list scan and JSON report export") {
    val dir = Files.createTempDirectory("graft-yaml")
    Files.writeString(dir.resolve("cases.yaml"),
      """# onboarding list
        |case_numbers:
        |  - NBC200993.001
        |  - 'NBC200994.001'
        |  - NBC200995.001   # trailing comment-ish
        |""".stripMargin)
    val df = Adapters.yamlCaseList(spark, dir.toString, "fdm")
    val refs = df.collect().map(_.getAs[String]("case_ref")).sorted.toSeq
    assert(refs == Seq("NBC200993.001", "NBC200994.001", "NBC200995.001"))
    assert(df.filter(!col("is_active")).count() == 0)

    // adversarial file: document separator, unrelated lists, and keys
    // after the block must NOT fabricate cases
    val dir2 = Files.createTempDirectory("graft-yaml2")
    Files.writeString(dir2.resolve("cases.yaml"),
      """---
        |tags:
        |  - internal
        |case_numbers:
        |  - NBC200996.001
        |owner: ops
        |excluded:
        |  - NOPE.001
        |""".stripMargin)
    val refs2 = Adapters.yamlCaseList(spark, dir2.toString, "fdm")
      .collect().map(_.getAs[String]("case_ref")).toSeq
    assert(refs2 == Seq("NBC200996.001"), s"got $refs2")

    val out = Files.createTempDirectory("graft-report").toString + "/report"
    Adapters.exportReportJson(df, out)
    assert(spark.read.json(out).count() == 3)
  }

  test("S3: nested dossier JSON reads with declared schema") {
    val dir = Files.createTempDirectory("graft-json")
    Files.writeString(dir.resolve("d1.json"),
      """{"case_ref":"NBC200993.001","tenant_id":"fdm","status":"active",
        |"core_details":{"case_status":"Active","handler_name":"JD","client_name":"Smith","date_opened":"18/09/2024"},
        |"history":[{"description":"Case opened","notes":"","date":"18/09/2024"},{"description":"Letter sent","notes":"n","date":"19/09/2024"}],
        |"parties":[{"type":"CL","name":"Smith"},{"type":"DF","name":"Acme Ltd"}],
        |"document_manifest":[{"code":"D1","format":"PDF","filename":"claim.pdf"}]}""".stripMargin.replace("\n", ""))
    val df = Adapters.jsonDossiers(spark, dir.toString)
    val r = df.collect().head
    assert(r.getAs[String]("case_ref") == "NBC200993.001")
    assert(r.getStruct(r.fieldIndex("core_details")).getAs[String]("client_name") == "Smith")
    assert(df.select(explode(col("history"))).count() == 2)
    val cl = df.select(
      element_at(filter(col("parties"), p => lower(p.getField("type")) === "cl"), 1)
        .getField("name")).collect().head.getString(0)
    assert(cl == "Smith")
  }

  test("S5/S6/S10: binary scan, partitioned sink, payload round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("a.bin"), "alpha-doc".getBytes)
    Files.write(dir.resolve("b.bin"), "beta".getBytes)
    val bin = Adapters.binaryDocuments(spark, dir.toString)
    val rows = bin.collect()
    assert(rows.length == 2)
    assert(rows.map(r => new String(r.getAs[Array[Byte]]("content"))).toSet ==
      Set("alpha-doc", "beta"))
    assert(rows.forall(_.getAs[Long]("length") > 0))

    // partitioned sink + pruned read-back
    val out = Files.createTempDirectory("graft-out").toString
    val jobs = Seq(
      (0L, 101L, 7L, 1, "full_rebuild"), (1L, 102L, 8L, 2, "incremental"))
      .toDF("tenant_id", "case_ref", "serialno", "priority", "job_type")
    Adapters.writePartitioned(jobs, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    assert(back.filter(col("tenant_id") === 0).count() == 1) // partition pruning path

    // queue payload round-trip
    val payloads = Adapters.jobPayloads(jobs)
    assert(payloads.columns.toSeq == Seq("priority", "payload"))
    val parsed = Adapters.parsePayloads(payloads)
      .orderBy("case_ref").collect()
    assert(parsed.map(_.getAs[Long]("case_ref")).toSeq == Seq(101L, 102L))
    assert(parsed.head.getAs[String]("job_type") == "full_rebuild")
  }
}
