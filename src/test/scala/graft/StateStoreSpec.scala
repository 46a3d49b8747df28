package graft

import graft.state.StateStore
import java.nio.file.Files

/** Direct state-store semantics (T2-T4) beyond the job-level coverage. */
class StateStoreSpec extends SparkSpec {
  import spark.implicits._

  private def store() =
    new StateStore(spark, Files.createTempDirectory("graft-state").toString)

  test("sessions: start → progress → complete → reset lifecycle (T2)") {
    val st = store()
    st.startSession("life", totalPages = 10)
    assert(st.resumePage("life") == 1)
    st.updateProgress("life", page = 4, newProducts = 120)
    assert(st.resumePage("life") == 5)
    // progress is monotone: a stale smaller page cannot move it backwards
    st.updateProgress("life", page = 2, newProducts = 0)
    assert(st.resumePage("life") == 5)
    st.completeSession("life")
    val row = st.sessions.collect().head
    assert(row.getAs[String]("status") == "completed")
    assert(row.getAs[Long]("total_products") == 120L)
    st.resetSession("life")
    assert(st.sessions.count() == 0)
    assert(st.resumePage("life") == 1)
  }

  test("restart preserves last_completed_page (resume across sessions)") {
    val st = store()
    st.startSession("life", 10)
    st.updateProgress("life", 7, 60)
    st.startSession("life", 12) // new run: offsets survive
    assert(st.resumePage("life") == 8)
  }

  test("markFailed increments retries per url and keeps latest error (T4)") {
    val st = store()
    st.markFailed(Seq(("u1", "timeout")).toDF("url", "error"))
    st.markFailed(Seq(("u1", "http 500"), ("u2", "dns")).toDF("url", "error"))
    val dlq = st.failed.collect().map(r =>
      r.getAs[String]("url") -> (r.getAs[Int]("retries"), r.getAs[String]("error"))).toMap
    assert(dlq("u1") == (2, "http 500"))
    assert(dlq("u2") == (1, "dns"))
    st.clearSucceeded(Seq("u1").toDF("url"))
    assert(st.failed.collect().map(_.getAs[String]("url")).toSeq == Seq("u2"))
  }

  test("completed set is idempotent and guards pending tasks (T3/J2)") {
    val st = store()
    st.markCompleted(Seq("a", "b", "a").toDF("url"))
    st.markCompleted(Seq("b").toDF("url"))
    assert(st.completed.count() == 2)
    val pending = st.filterPending(Seq("a", "c").toDF("url"), "url")
    assert(pending.as[String].collect().toSeq == Seq("c"))
  }
}
