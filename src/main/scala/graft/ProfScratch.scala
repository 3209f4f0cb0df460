package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ann.AnnOps

/** Dev-only scratch profiler (delete before round end). */
object ProfScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .repartition(32).cache()
    time("load")(emb.count())

    val dim = 64
    val centroids = (0 until 8).map(i => Seq.tabulate(dim)(j => if (j == i) 1.0 else 0.0))
    val cbs = AnnOps.pqCodebooks(m = 8, k = 16, subDim = 8, seed = 7L)
    val e = emb.withColumn("v", col("embedding").cast("array<double>"))
    time("warm")(e.count())
    time("cell only")(e.withColumn("_cell", AnnOps.ivfAssign(col("v"), centroids))
      .select(col("vec_id"), col("_cell")).count())
    time("codes only")(e.withColumn("_codes", AnnOps.pqEncode(col("v"), cbs).getField("codes"))
      .select(col("vec_id"), col("_codes")).count())
    time("cell+codes")(e.withColumn("_cell", AnnOps.ivfAssign(col("v"), centroids))
      .withColumn("_codes", AnnOps.pqEncode(col("v"), cbs).getField("codes"))
      .select(col("vec_id"), col("_cell"), col("_codes")).count())
    val corpus = e.select(col("vec_id").as("cid"), col("v").as("cv"))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    time("full e8")(AnnOps.ivfPqTopK(corpus, "cid", "cv", queries, "qid", "qv",
      centroids, cbs, nProbe = 2, k = 5).count())

    // bisect inside ivfPqTopK
    val m = cbs.size; val subDim = cbs.head.head.size
    val assigned = corpus
      .withColumn("_cell", AnnOps.ivfAssign(col("cv"), centroids))
      .withColumn("_codes", AnnOps.pqEncode(col("cv"), cbs).getField("codes"))
      .select(col("cid"), col("_cell"), col("_codes"))
    val lut = array(cbs.zipWithIndex.map { case (cb, s) =>
      array(cb.map { c =>
        (0 until subDim).map { j =>
          val x = element_at(col("qv"), s * subDim + j + 1) - lit(c(j))
          x * x
        }.reduce(_ + _)
      }: _*)
    }: _*)
    val probed = queries
      .withColumn("_cell", explode(AnnOps.ivfProbes(col("qv"), centroids, 2)))
      .withColumn("_lut", lut)
      .select(col("qid"), col("_cell"), col("_lut"))
    time("probed")(probed.count())
    val joined = assigned.join(broadcast(probed), "_cell")
    time("join only")(joined.count())
    val adc = (0 until m).map(s =>
      element_at(element_at(col("_lut"), s + 1), element_at(col("_codes"), s + 1) + 1))
      .reduce(_ + _)
    time("join+adc")(joined.withColumn("adc", adc).agg(sum("adc")).count())
    val pinnedA = assigned.cache(); val pinnedP = probed.cache()
    time("pin assigned")(pinnedA.count()); time("pin probed")(pinnedP.count())
    val joined2 = pinnedA.join(broadcast(pinnedP), "_cell")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("cid"))
    time("full pinned")(joined2.withColumn("adc", adc)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("qid"), col("cid"), round(col("adc"), 6).as("adc"), col("rank")).count())
    spark.stop()
  }
}
