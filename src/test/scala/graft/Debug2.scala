package graft

object Debug2 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.pipeline.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug2] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val shingled = docs.select(col("doc_id").as("id"),
      Dedup.wordShingles(col("text"), 2).as("shingles"))
    time("shingle+count")(println("docs=" + shingled.count()))
    val buckets = shingled
      .withColumn("__h", transform(col("shingles"), s => xxhash64(s)))
      .select(col("id"),
        explode(Dedup.lshBands(Dedup.minhashSignatureFromHashes(col("__h"), 32), 16, 2)).as("b"))
      .select(col("id"), col("b.band"), col("b.bucket"))
    time("buckets")(println("buckets=" + buckets.count()))
    val pairs = buckets.as("x").join(buckets.as("y"),
      col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    println(pairs.queryExecution.executedPlan.treeString.split("\n")
      .map(_.take(120)).take(30).mkString("\n"))
  }
}
