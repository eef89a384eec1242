package graft

import org.apache.spark.sql.functions._

class GraftFacadeSpec extends SparkSpec {

  test("session() wires SQL functions and strategies onto the active session") {
    val s = Graft.session() // getOrCreate returns the shared test session
    assert(s.sql("SELECT fnv64('k') IS NOT NULL").head().getBoolean(0))
    assert(s.sql("SELECT size(winnowing_fp('hello world of graphs', 5, 8)) > 0")
      .head().getBoolean(0))
    assert(s.sql("SELECT max_run_count(array('a','b','a','a'))").head().getInt(0) == 3)
    assert(s.sql("SELECT max_bigram_run(array('x','y','x','y','x','y'))").head().getInt(0) == 3)
    assert(s.sql("SELECT dup_gram_count(array('a','b','a','b'), 2)").head().getInt(0) == 2)
    assert(s.experimental.extraStrategies.contains(graft.plans.TopKPerGroupStrategy))
  }

  test("SQL-text traversal over registered graph views, with engine functions") {
    import spark.implicits._
    graft.plans.GraftExtensions.registerAll(spark)
    val g = graft.core.GraphState(
      Seq(graft.model.NodeRow("a_1", "a", "A One", "{}"),
        graft.model.NodeRow("b_1", "b", "B One", "{}")).toDS(),
      Seq(graft.model.EdgeRow("a_1", "b_1", 1, "Points", "{}")).toDS())
    g.createOrReplaceViews("t")
    val r = spark.sql("""
      SELECT n2.prettyName AS target, fnv64(n2.key) AS h
      FROM t_edges e
      JOIN t_nodes n2 ON e.dst = n2.key
      WHERE e.relType = 'Points'""").head()
    assert(r.getString(0) == "B One")
    assert(r.getLong(1) == graft.plans.GraphAnalytics.fnv64("b_1"))
  }

  test("openOrSeed seeds a fresh store once, then loads it (ref Library.fs:320-325)") {
    val dir = java.nio.file.Files.createTempDirectory("graftstore").toString + "/db"
    val g1 = Graft.openOrSeed(spark, dir)
    assert(g1.nodes.count() == 14082L) // year dim + labels + outcomes + Life
    assert(g1.edges.count() == 2L)
    // second open loads, not re-seeds: mutate then re-open and observe
    val g2 = Graft.openOrSeed(spark, dir)
    assert(g2.nodes.filter(col("nodeType") === "qualitativelabelnode").count() == 1L)
  }
}
