package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.{GraftSession, SparkEntry}

/** Round-17 optimization evidence: dump `.explain("formatted")` of the
  * named registry queries to `plans/r17/<query>_<tag>.txt` (tag =
  * second arg convention: "before" / "after"). Same contract as
  * [[R16Plan]]; plans are captured against the tiny sf dir by default
  * because plan SHAPE (exchanges, join strategies, pushdown) is
  * SF-independent for these operators.
  *
  * Usage: sbt "runMain graft.tools.R17Plan before x99_graph_foldin ..."
  */
object R17Plan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R17Plan <tag> <query> [query...]")
    val tag = args.head
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r17"))
    args.tail.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.write(Paths.get(s"plans/r17/${name}_$tag.txt"),
          (s"# $name ($tag) — $dir\n" + txt).getBytes("UTF-8"))
        println(s"[r17plan] wrote plans/r17/${name}_$tag.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[r17plan] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
