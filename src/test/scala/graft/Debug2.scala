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
    time("shingles full write")(
      shingled.write.mode("overwrite").format("noop").save())
    val withSig = shingled
      .withColumn("__h", transform(col("shingles"), s => xxhash64(s)))
      .withColumn("__sig", Dedup.minhashSignatureFromHashes(col("__h"), 32))
      .select("id", "__sig")
    time("signatures full write")(
      withSig.write.mode("overwrite").format("noop").save())
    time("full minhashNearDups")(println("pairs=" +
      Dedup.minhashNearDups(docs, "text", "doc_id", 2, 32, 8, 0.5).count()))
  }
}
