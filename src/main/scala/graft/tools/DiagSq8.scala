package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ext.Similarity
import graft.tables.Tables

/** Round-8 measurement for the x63 claim "the stored SQ8 index shrinks
  * the ANN payload": writes the sf0.1 embedding column three ways —
  * raw float vectors, the exact kernel's ×2^20 fixed-point longs, and
  * SQ8 codes — to parquet (the at-rest / shipped-index representation)
  * and prints the byte sizes. In-flight Spark arrays are widened longs
  * either way (the integer-dot kernel's input type); the compression
  * claim is about what a stored/shuffled index costs, which parquet's
  * bit-packing realizes for the int8-range codes. */
object DiagSq8 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val out = Files.createTempDirectory("graft_sq8_diag_")
    def sizeOf(p: Path): Long = {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum
      finally s.close()
    }
    val e = Tables.embeddings(spark, dir)
    val raw = out.resolve("raw")
    e.select(col("vec_id"), col("embedding"))
      .write.parquet(raw.toString)
    val fixed = out.resolve("fixed")
    e.select(col("vec_id"), Similarity.quantize(col("embedding")).as("vq"))
      .write.parquet(fixed.toString)
    val sq8 = out.resolve("sq8")
    Similarity.sq8Codes(e, "vec_id", "embedding")
      .write.parquet(sq8.toString)
    val (r, f, q) = (sizeOf(raw), sizeOf(fixed), sizeOf(sq8))
    println(f"[sq8] raw_float=$r%d B  fixed_point=$f%d B  sq8=$q%d B  " +
      f"sq8_vs_raw=${r.toDouble / q}%.2fx  sq8_vs_fixed=${f.toDouble / q}%.2fx")
    spark.stop()
  }
}
