package graft.ml

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Verifies the hash-based dedup paths (MinHash/SimHash — not
  * SQL-oracle-expressible) against exact n-gram Jaccard, plus golden
  * behavior on a crafted corpus with known duplicates. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Crafted corpus written as a documents.parquet dir: exact dup pair,
    * near-dup pair (one token changed), and unrelated docs. */
  lazy val craftedDir: String = {
    val dir = Files.createTempDirectory("graft-dedup").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src0", base.length.toLong),          // exact dup of 0
      (2L, near, "en", "src0", near.length.toLong),          // near dup of 0
      (3L, "completely different words here entirely", "en", "src1", 42L),
      (4L, "another unrelated document body text", "en", "src1", 36L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup collapses identical texts to the lowest doc_id") {
    val groups = Dedup.exactGroups(spark, craftedDir).collect()
    val dupGroup = groups.find(_.getAs[Long]("n_docs") > 1)
    assert(dupGroup.isDefined)
    assert(dupGroup.get.getAs[Long]("keep_id") == 0L)
    assert(Dedup.exactSurvivors(spark, craftedDir).count() == 4)
  }

  test("ngram Jaccard finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(spark, craftedDir, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 1L))) // exact dup
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH recovers the exact-Jaccard pairs (recall) without " +
    "flooding (precision) on real data") {
    val exact = Dedup.ngramJaccardPairs(spark, sf, threshold = 0.7)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val mh = Dedup.minhashPairs(spark, sf, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    val recall = exact.count(mh.contains).toDouble / exact.size
    assert(recall >= 0.8, s"minhash recall $recall over ${exact.size} pairs")
    assert(mh.size <= exact.size * 5 + 10, s"minhash flooded: ${mh.size} pairs")
  }

  test("simhash: exact dups at hamming 0, near dups within threshold") {
    val pairs = Dedup.simhashPairs(spark, craftedDir, maxHamming = 10)
      .collect().map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Int]("hamming"))).toMap
    assert(pairs.get((0L, 1L)).contains(0))
    assert(pairs.contains((0L, 2L)))
  }

  test("winnowing fingerprints catch the crafted near-dups and agree with " +
    "n-gram Jaccard on real data") {
    val pairs = Dedup.winnowPairsOf(
        spark.read.parquet(s"$craftedDir/documents.parquet"), threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 1L)), s"exact dup must share all fingerprints: $pairs")
    assert(pairs.contains((0L, 2L)), s"near dup must overlap: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))

    // on the real corpus: winnow pairs at 0.5 should recover most exact
    // ngram pairs at 0.7 (different granularity — expect high overlap)
    val exact = Dedup.ngramJaccardPairs(spark, sf, threshold = 0.7)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val winnow = Dedup.winnowPairs(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val recall = exact.count(winnow.contains).toDouble / math.max(exact.size, 1)
    assert(recall >= 0.7, s"winnow recall vs ngram: $recall")
  }

  test("clusters: transitive closure of pairs, min doc_id is the cluster id") {
    import spark.implicits._
    // chain 1-2, 2-3 plus isolated pair 7-8: {1,2,3} and {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val got = Dedup.clustersOf(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))

    // crafted corpus: exact+near dups {0,1,2} cluster; 3 and 4 have no pairs
    val crafted = Dedup.clustersOf(
      Dedup.ngramJaccardPairs(spark, craftedDir, threshold = 0.5)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(crafted == Map(0L -> 0L, 1L -> 0L, 2L -> 0L))

    // a 60-hop chain exceeds any plausible hop-per-round budget — pointer
    // jumping must still converge it (within the default maxIters)
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val chained = Dedup.clustersOf(chain).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    assert(chained.length == 61 && chained.forall(_._2 == 0L))

    // a corpus with no duplicates at all is a legal input, not a crash
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.clustersOf(none).count() == 0)

    // null tokens in the public simhash kernel carry no vote, no NPE
    val sig = spark.range(1).select(
      graft.functions.ArrayOps.simhash_sig(
        array(lit("a"), lit(null).cast("string"), lit("b"))).as("s"),
      graft.functions.ArrayOps.simhash_sig(array(lit("a"), lit("b"))).as("t"))
      .head()
    assert(sig.getLong(0) == sig.getLong(1))
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val pairs = Dedup.embeddingPairs(spark, sf).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Double]("cosine") > 0.39) // integer-gate ~= 0.4
    }
  }

  test("LSH-blocked embedding pairs: subset of exact, near-total recall") {
    val emb = graft.Tables.embeddings(spark, sf)
    val exact = Dedup.embeddingPairsExactOf(emb).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val blocked = Dedup.embeddingPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    // blocking only removes candidates; the threshold is identical — the
    // blocked result can never contain a pair the exact form lacks
    assert(blocked.subsetOf(exact),
      s"blocked produced non-pairs: ${blocked.diff(exact).take(5)}")
    // 2-bit x 8-table OR amplification: worst-case (cos exactly 0.4) miss
    // probability is ~1.7% per pair; on this corpus measured recall is 1.0
    // — gate at 0.9 to stay robust to testdata regeneration
    assert(blocked.size >= (exact.size * 0.9).toInt,
      s"recall too low: ${blocked.size}/${exact.size}")
  }
}
