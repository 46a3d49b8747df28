package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** CSV metadata source + append sink (SURVEY §2.1 S4/S5, §2.9 K1/K4,
  * §2.4 X14).
  *
  * Reference (/root/reference/src/irdai_scraper/storage/csv_writer.py):
  *  - K1 append sink, header once, fixed column order (:58-96)
  *  - X14 None→"" at the sink (:44-51)
  *  - S5 count scan skipping the header (:98-110)
  *  - K4 clear (:112-126)
  *  and scripts/delta_download.py:41-51 (S4 existing-URL scan).
  *
  * Fidelity note (SURVEY §7.4): the reference appends to ONE file with ONE
  * header. Spark's CSV sink writes a directory of part files with a header
  * per part, so [[append]] writes parts distributed, then merges them into
  * the single target file driver-side with a streamed Hadoop-FS copy (no
  * `collect()` — bytes stream through a fixed buffer regardless of size).
  */
object CsvMeta {

  /** Ordered output columns per product table — the single source of truth
    * (reference declares this twice: config.py:49-125 + pydantic models).
    * Orders are golden-matched to the shipped corpus headers
    * (the data/metadata CSVs; verified by CsvGoldenSpec): no product_type
    * column (implied by the file), local_file_path/r2_url present,
    * `scraped_at` appended by the sink (csv_writer.py:53-54).
    */
  val columns: Map[String, Seq[String]] = Map(
    "life" -> Seq("archive_status", "financial_year", "insurer", "product_name",
      "uin", "type_of_product", "launch_modification_date",
      "closing_withdrawal_date", "protection_savings_retirement", "par_nonpar",
      "individual_group", "remarks", "document_url", "document_filename",
      "local_file_path", "r2_url", "scraped_at"),
    "life_list" -> Seq("archive_status", "short_description", "last_updated",
      "sub_title", "document_url", "document_filename", "local_file_path",
      "r2_url", "scraped_at"),
    "nonlife" -> Seq("s_no", "financial_year", "insurer", "product_name",
      "type_of_product", "uin", "date_of_approval", "document_url",
      "document_filename", "local_file_path", "r2_url", "archive_status",
      "scraped_at"),
    "health" -> Seq("financial_year", "insurer", "uin", "product_name",
      "date_of_approval", "document_url", "document_filename",
      "local_file_path", "r2_url", "type_of_product", "archive_status",
      "scraped_at"))

  /** S4: project the existing-URL set out of a metadata CSV
    * (delta_download.py:41-51); empty/missing file → empty set.
    */
  def loadExistingUrls(spark: SparkSession, csvPath: String): DataFrame = {
    val fs = new Path(csvPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(csvPath)))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("document_url string"))
    spark.read.option("header", "true").csv(csvPath)
      .select("document_url")
      .where(col("document_url").isNotNull && col("document_url") =!= "")
      .distinct()
  }

  /** S5: data-row count of an existing CSV (csv_writer.py:98-110). */
  def count(spark: SparkSession, csvPath: String): Long = {
    val fs = new Path(csvPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(csvPath))) 0L
    else spark.read.option("header", "true").csv(csvPath).count()
  }

  /** K1+X14: append `df` to a single CSV file at `csvPath` with the fixed
    * column order for `productType`; header written only when the file
    * doesn't exist yet; missing columns become empty strings
    * (extrasaction=ignore + None→"" parity, csv_writer.py:44-51, 79-94).
    */
  def append(df: DataFrame, productType: String, csvPath: String): Unit = {
    val spark = df.sparkSession
    val cols = columns(productType)
    val ordered = df.select(cols.map(c =>
      if (df.columns.contains(c)) coalesce(col(c).cast("string"), lit("")).as(c)
      else lit("").as(c)): _*)

    val target = new Path(csvPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(target) && fs.getFileStatus(target).getLen > 0

    val partsDir = new Path(csvPath + ".parts.tmp")
    ordered.write.mode(SaveMode.Overwrite)
      .option("header", "false").option("emptyValue", "").option("nullValue", "")
      .csv(partsDir.toString)

    // Driver-side streamed merge: copy-on-append into a temp file, then an
    // atomic rename over the target (local FS doesn't support fs.append;
    // this is also crash-safe — readers see old or new, never half).
    val buf = new Array[Byte](1 << 16)
    def copy(src: Path, out: java.io.OutputStream): Unit = {
      val in = fs.open(src)
      try {
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
    }
    val merged = new Path(csvPath + ".merged.tmp")
    val out = fs.create(merged, true)
    try {
      if (exists) copy(target, out)
      else out.write((cols.mkString(",") + "\n").getBytes("UTF-8"))
      fs.listStatus(partsDir).filter(_.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
        .foreach(p => copy(p.getPath, out))
    } finally out.close()
    if (fs.exists(target)) fs.delete(target, false)
    fs.rename(merged, target)
    fs.delete(partsDir, true)
    ()
  }

  /** K4: clear one metadata CSV (csv_writer.py:112-126). */
  def clear(spark: SparkSession, csvPath: String): Unit = {
    val target = new Path(csvPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(target)) fs.delete(target, false)
    ()
  }
}
