package graft.streaming

import graft.SparkSpec

/** The streaming gate's core claim, pinned locally as well as at the
  * oracle: serving the trained quality model per micro-batch produces
  * EXACTLY the batch apply's per-source gating — same counts, same
  * keep rates, bit-for-bit (both run the shared scoring kernel; decimal
  * sums make the arithmetic partitioning-independent). */
class StreamGateSpec extends SparkSpec {

  test("streaming gate output equals the batch train->apply output") {
    val dir = "/root/testdata/sf0.001"
    val stream = graft.SparkEntry.queries("stream_quality_gate")(spark, dir)
      .orderBy("source").collect()
    val batch = graft.SparkEntry.queries("text_quality_apply")(spark, dir)
      .orderBy("source").collect()
    assert(stream.toSeq == batch.toSeq)
  }
}
