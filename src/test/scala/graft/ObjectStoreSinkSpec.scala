package graft

import graft.sources.ObjectStoreSink
import java.nio.file.{Files, Paths}

/** K3 object-store sink over the local Hadoop FileSystem. */
class ObjectStoreSinkSpec extends SparkSpec {
  import spark.implicits._

  test("upload writes, verifies, and derives key/url/content-type (K3/X10/X11)") {
    val src = Files.createTempDirectory("graft-k3-src")
    val store = Files.createTempDirectory("graft-k3-store").toString
    Files.write(src.resolve("a.pdf"), "pdfbytes".getBytes)
    Files.write(src.resolve("b.xlsx"), "xlsxbytes".getBytes)

    val files = Seq(
      (s"$src/a.pdf", "life/2020/a.pdf"),
      (s"$src/b.xlsx", "life/2020/b.xlsx")).toDF("local_path", "key")
    val out = ObjectStoreSink.upload(files, store, "bucket.example.dev").collect()

    assert(out.forall(_.verified))
    assert(out.forall(_.error == null))
    val byKey = out.map(r => r.key -> r).toMap
    assert(byKey("life/2020/a.pdf").content_type == "application/pdf")
    assert(byKey("life/2020/b.xlsx").content_type ==
      "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet")
    assert(byKey("life/2020/a.pdf").public_url ==
      "https://bucket.example.dev/life/2020/a.pdf")
    assert(Files.readAllBytes(Paths.get(s"$store/life/2020/a.pdf"))
      .sameElements("pdfbytes".getBytes))
  }

  test("uploadBytes writes in-memory payloads without local staging (upload_fileobj parity)") {
    val store = Files.createTempDirectory("graft-k3-bytes").toString
    val blobs = Seq(
      ("inmem-pdf".getBytes, "life/2021/m.pdf"),
      ("inmem-doc".getBytes, "life/2021/n.docx")).toDF("content", "key")
    val out = ObjectStoreSink.uploadBytes(blobs, store, "bucket.example.dev").collect()
    assert(out.forall(_.verified) && out.forall(_.error == null))
    assert(out.forall(_.local_path == null)) // no file staging involved
    assert(Files.readAllBytes(Paths.get(s"$store/life/2021/m.pdf"))
      .sameElements("inmem-pdf".getBytes))
    assert(out.map(_.public_url).toSet
      .contains("https://bucket.example.dev/life/2021/n.docx"))
  }

  test("missing local file → failure row, not an exception") {
    val store = Files.createTempDirectory("graft-k3-store2").toString
    val files = Seq(("/does/not/exist.pdf", "x/exist.pdf")).toDF("local_path", "key")
    val out = ObjectStoreSink.upload(files, store, "h").collect()
    assert(out.length == 1 && !out.head.verified && out.head.error != null)
  }

  test("list with prefix and delete (r2_uploader.py:110-158)") {
    val src = Files.createTempDirectory("graft-k3-src3")
    val store = Files.createTempDirectory("graft-k3-store3").toString
    Files.write(src.resolve("f.pdf"), "x".getBytes)
    val files = Seq(
      (s"$src/f.pdf", "life/f.pdf"),
      (s"$src/f.pdf", "health/g.pdf")).toDF("local_path", "key")
    ObjectStoreSink.upload(files, store, "h").collect()

    assert(ObjectStoreSink.list(spark, store) == Seq("health/g.pdf", "life/f.pdf"))
    assert(ObjectStoreSink.list(spark, store, "life/") == Seq("life/f.pdf"))
    assert(ObjectStoreSink.delete(spark, store, "life/f.pdf"))
    assert(!ObjectStoreSink.delete(spark, store, "life/f.pdf")) // already gone
    assert(ObjectStoreSink.list(spark, store) == Seq("health/g.pdf"))
  }
}
