package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for a named set of contract queries to
  * per-query files — the before/after plan evidence the optimization
  * rounds commit under `plans/rNN/`.
  *
  * Usage: sbt "runMain graft.tools.PlanSnap <outDir> <suffix> q01,q02,..."
  * (query names may be full ids or unique prefixes). Session config
  * mirrors Bench (AQE on, shuffle.partitions = cores, 64m broadcast
  * threshold) so the dumped plans are the ones the bench actually runs;
  * SPARK_GRAFT_SF_DIR picks the corpus (default sf0.1).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanSnap <outDir> <suffix> <names,comma-sep>")
    val (outDir, suffix, namesArg) = (args(0), args(1), args(2))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.queries.Fixtures.scratchIndexDir("graft-warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.SparkEntry.queries
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    namesArg.split(',').map(_.trim).filter(_.nonEmpty).foreach { want =>
      val name = all.keys.find(_ == want)
        .orElse(all.keys.filter(_.startsWith(want)).toList match {
          case one :: Nil => Some(one)
          case _ => None
        })
        .getOrElse(sys.error(s"no unique query matches '$want'"))
      val df = all(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        .flatMap(c => if (c < ' ' && c != '\n' && c != '\t') f"\\u${c.toInt}%04x" else c.toString)
      val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.writeString(p, txt + "\n")
      println(s"wrote $p")
    }
    spark.stop()
  }
}
