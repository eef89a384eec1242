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

    // Assert on raw rows, not a keyed Map: a Map would hide duplicate keys
    // (last file-read-order occurrence wins) and green-light broken dedup.
    val rows = GraphStream.loadStore(spark, dir).collect()
    assert(rows.length == 3, s"expected 3 rows, got ${rows.map(r => r.key -> r.prettyName).toList}")
    assert(rows.map(_.key).distinct.length == rows.length, "duplicate keys in store")
    assert(rows.map(_.key).toSet == Set("taxonnode_a", "taxonnode_b", "taxonnode_c"))
    assert(rows.find(_.key == "taxonnode_b").get.prettyName == "B") // first write wins, replay-safe
  }
}
