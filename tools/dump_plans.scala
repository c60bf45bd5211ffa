import org.apache.spark.sql.SparkSession
val spark = SparkSession.builder().master("local[8]").config("spark.sql.shuffle.partitions","8").config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").config(graft.Tables.NanosAsLongConf,"true").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
val sf = "/root/testdata/sf0.01"
def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = { df.collect(); val tree = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head; println(s"PLAN_BEGIN $name"); println(tree); println(s"PLAN_END $name") }
dump("recon_categories", graft.sync.Reconcile.categories(spark, sf))
dump("q1_pricing_summary", graft.metrics.Dashboard.pricingSummary(spark, sf))
dump("j5_revenue_by_supplier", graft.metrics.Dashboard.revenueBySupplier(spark, sf))
dump("t1_asof", graft.operators.Temporal.purchaseAsofBrowse(spark, sf))
dump("t1b_asof_salted", graft.operators.Temporal.purchaseAsofBrowseSalted(spark, sf))
dump("text_token_drift", graft.ml.TextOps.tokenDrift(spark, sf))
dump("dedup_ngram_pairs", graft.ml.Dedup.ngramJaccardPairs(spark, sf))
dump("curation_span_dedup", graft.ml.Dedup.spanDedupStats(spark, sf))
dump("text_bpe_merges", graft.ml.TextOps.bpeMerges(spark, sf))
dump("e2e_flagship_lineage", graft.pipeline.Lineage.flagship(spark, sf))
dump("sim_topk_tenant", graft.ml.Similarity.tenantAnnTopK(spark, sf))
dump("dedup_blocking_recall", graft.ml.Dedup.blockingRecall(spark, sf))
sys.exit(0)
