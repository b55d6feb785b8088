package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe (deleted before commit). */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val withSets = docs.select(col("doc_id"), Dedup.shingles(col("text"), 2).as("_sh"))
      .where(size(col("_sh")) > 0)
    timed("shingle sets + stats") {
      withSets.agg(count(lit(1)), avg(size(col("_sh"))), max(size(col("_sh")))).show()
    }

    val numBands = 32; val rowsPerBand = 2
    val bands = withSets
      .withColumn("_sig", Dedup.minhashSignature(col("_sh"), numBands * rowsPerBand))
      .select(col("doc_id"), explode(transform(sequence(lit(0), lit(numBands - 1)),
        j => struct(j.as("idx"), xxhash64(j, slice(col("_sig"), j * rowsPerBand + lit(1), lit(rowsPerBand))).as("h")))).as("_band"))
      .select(col("doc_id"), col("_band.idx").as("_bidx"), col("_band.h").as("_bhash"))

    timed("signature+bands compute") { println(bands.count()) }
    timed("bucket size distribution") {
      bands.groupBy("_bidx", "_bhash").agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1) / 2).as("total_pairs"), max("n").as("max_bucket")).show()
    }
    val cand = {
      val a = bands.select(col("doc_id").as("id_a"), col("_bidx"), col("_bhash"))
      val b = bands.select(col("doc_id").as("id_b"), col("_bidx"), col("_bhash"))
      a.join(b, Seq("_bidx", "_bhash")).where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    }
    timed("candidate pairs (deduped)") { println(cand.count()) }
    spark.stop()
  }
}
