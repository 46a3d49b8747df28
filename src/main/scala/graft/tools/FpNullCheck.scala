package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off cross-engine audit for the q230/q234 null sentinel: prints the
  * fingerprint row-strings for rows with nulls in each position, to diff
  * against the DuckDB twin (same rows through `fpRowSql`) by hand.
  * Dev tool, not part of the contract.
  */
object FpNullCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rows = Seq(
      (1L, null.asInstanceOf[String], "x", 10L, "t"),
      (1L, "x", null.asInstanceOf[String], 10L, "t"),
      (1L, null.asInstanceOf[String], null.asInstanceOf[String], 10L,
        null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    rows.select(graft.queries.QualityQueries.fpRowString.as("s"))
      .collect().foreach(r => println(r.getString(0).replace("\u0000", "<NUL>")))
    spark.stop()
  }
}
