package graft.streaming

import graft.SparkSpec
import graft.model.NodeRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class GraphStreamSpec extends SparkSpec {

  test("streaming upsert dedupes keys across micro-batches (M2 per batch)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val input = MemoryStream[NodeRow]
    val q = GraphStream.upsertStream(input.toDS(), dir, s"$dir/ckpt")

    input.addData(
      NodeRow("taxonnode_a", "taxonnode", "A", "{}"),
      NodeRow("taxonnode_b", "taxonnode", "B", "{}"))
    q.processAllAvailable()

    input.addData(
      NodeRow("taxonnode_b", "taxonnode", "B-CHANGED", "{}"), // existing key → skipped
      NodeRow("taxonnode_c", "taxonnode", "C", "{}"),
      NodeRow("taxonnode_c", "taxonnode", "C-DUP-IN-BATCH", "{}")) // in-batch dup → one survives
    q.processAllAvailable()
    q.stop()

    val store = GraphStream.loadStore(spark, dir).collect().map(n => n.key -> n.prettyName).toMap
    assert(store.keySet == Set("taxonnode_a", "taxonnode_b", "taxonnode_c"))
    assert(store("taxonnode_b") == "B") // first write wins, replay-safe
  }
}
