package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The incremental-repair theorem the takedown design rests on:
  * re-packing only the DIRTY shards equals a full curation-flagship
  * rebuild on the revocation-filtered corpus — restricted to dirty
  * shards — AND the rebuild is bit-identical to the original manifest
  * on every clean shard (the dirty set is complete: nothing outside it
  * changes). Exact whenever the contamination df-cap set is stable
  * under the revocation — true by construction here (df ≪ cap) and
  * frozen as a published corpus artifact in production. */
class TakedownRepackSpec extends SparkSpec {

  private def key(r: Row) = (r.getAs[String]("split"), r.getAs[Long]("shard"))
  private def stats(r: Row) = (r.getAs[Long]("n_docs"),
    r.getAs[Long]("n_tokens"), r.getAs[Long]("n_bins"))

  test("repair == rebuild on dirty shards; rebuild == original elsewhere") {
    val docs = graft.Tables.documents(spark, sf)
    val dirty = Takedown.manifestOf(docs).collect().map(key).toSet
    assert(dirty.nonEmpty, "testdata must produce at least one dirty shard")
    val repack = Takedown.repackOf(docs).collect()
      .map(r => key(r) -> stats(r)).toMap
    // full rebuild: revoked docs removed from the CORPUS side only (the
    // eval slice is a published benchmark, not user data)
    val rebuilt = Lineage.curationFlagshipOf(
      docs.filter(!(col("doc_id") % 131 === 5 && col("doc_id") % 97 =!= 0)))
      .collect().map(r => key(r) -> stats(r)).toMap
    val orig = Lineage.curationFlagshipOf(docs).collect()
      .map(r => key(r) -> stats(r)).toMap
    assert(repack == rebuilt.filter { case (k, _) => dirty(k) })
    assert(rebuilt.filterNot { case (k, _) => dirty(k) } ==
      orig.filterNot { case (k, _) => dirty(k) })
    // every repacked shard respects the fill rule's bin arithmetic
    repack.values.foreach { case (n, toks, bins) =>
      assert(bins >= 1 && bins <= n)
      assert(toks >= n * 10) // gate floor: >= 10 tokens per doc
    }
  }

  test("planted geometry: only the surviving dirty shard reappears") {
    import spark.implicits._
    // same planted world as TakedownSpec: R re-elects 136 -> 150,
    // D drops, U/M untouched, X contaminated
    val textR = "apple banana cherry damson elder fig grape honey iris jasmine"
    val textD = "stone river mountain valley forest desert ocean island cloud storm"
    val textU = "red orange yellow green blue indigo violet black white gray"
    val textM = "one two three four five six seven eight nine ten"
    val textX = "lorem ipsum dolor sitam amet consect adipis elitsed dolore magna"
    val planted = Seq(
      194L -> textX,
      136L -> textR, 150L -> textR,
      267L -> textD, 398L -> textD,
      20L -> textU, 21L -> textU,
      30L -> textM, 529L -> textM,
      660L -> textX, 661L -> textX
    ).toDF("doc_id", "text").withColumn("source", lit("planted"))
    val repack = Takedown.repackOf(planted).collect()
      .map(r => key(r) -> stats(r)).toMap
    // dirty shards are (train,0) [136 left], (train,6) [150 arrived],
    // (train,3) [267 dropped]; post-takedown content: (train,6) holds
    // representatives 150 and 30 (30 % 8 == 6), the others emptied
    assert(repack == Map(("train", 6L) -> ((2L, 20L, 1L))))
  }
}
