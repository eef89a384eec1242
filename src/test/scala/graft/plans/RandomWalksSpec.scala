package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomWalksSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(pairs: Seq[(Long, Long)]) = pairs.toDF("u", "v")

  test("a single-successor chain is walked literally") {
    // 1→2→3→4→5: degree 1 everywhere, the hash mod 1 is always 0, so
    // the walk is forced — pins the path rendering and step order
    val e = edgesDf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val out = RandomWalks.walks(e, Seq(1L).toDF("start"),
        walksPerStart = 1, steps = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 0, 5L, "1->2->3->4->5")))
  }

  test("walks are deterministic and partition-invariant") {
    val rng = new scala.util.Random(20260814L)
    val pairs = (0 until 200).map(_ => (rng.nextInt(30).toLong, rng.nextInt(30).toLong))
      .filter(p => p._1 != p._2)
    val und = (pairs ++ pairs.map(_.swap)).distinct
    val starts = Seq(0L, 5L, 10L).toDF("start")
    def run(parts: Int) = RandomWalks.walks(
        edgesDf(und).repartition(parts), starts, walksPerStart = 3, steps = 5)
      .orderBy("start", "walk").collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }

  test("walks match the sequential reference recurrence") {
    val rng = new scala.util.Random(77L)
    val directed = (0 until 150).map(_ => (rng.nextInt(20).toLong, rng.nextInt(20).toLong))
      .filter(p => p._1 != p._2)
    // undirected closure: every reached node has out-degree >= 1, so the
    // sequential reference never hits a sink mid-walk
    val pairs = (directed ++ directed.map(_.swap)).distinct
    val adj = pairs.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).distinct.sorted }
    def md5mod(s: String, m: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(d.take(7), 16) % m).toInt
    }
    val starts = adj.keys.toSeq.sorted.take(5)
    val want = (for (start <- starts; w <- 0 until 2) yield {
      var cur = start
      val path = new StringBuilder(cur.toString)
      for (step <- 1 to 3) {
        val ns = adj(cur)
        cur = ns(md5mod(s"rw:$start:$w:$step:$cur", ns.size))
        path ++= s"->$cur"
      }
      (start, w, cur, path.toString)
    }).sortBy(t => (t._1, t._2))
    val got = RandomWalks.walks(edgesDf(pairs), starts.toDF("start"),
        walksPerStart = 2, steps = 3)
      .orderBy("start", "walk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == want)
  }

  test("a start with no outgoing edge drops out; others keep walking") {
    val e = edgesDf(Seq((1L, 2L), (2L, 1L)))
    val out = RandomWalks.walks(e, Seq(1L, 99L).toDF("start"),
        walksPerStart = 1, steps = 2)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(out == Seq((1L, "1->2->1")))
  }

  test("contextPairs: windowed skip-gram pairs, aggregated over repeated nodes") {
    val walks = Seq((1L, 0, 4L, "1->2->3->4"), (9L, 0, 1L, "1->2->1"))
      .toDF("start", "walk", "end_node", "path")
    val got = RandomWalks.contextPairs(walks, window = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // walk 1 (1,2,3,4), w=2: 1→{2,3}, 2→{1,3,4}, 3→{1,2,4}, 4→{2,3}
    // walk 2 (1,2,1): (1,2)×2, (1,1)×2, (2,1)×2 — repeated node aggregates
    assert(got == Map(
      (1L, 2L) -> 3L, (1L, 3L) -> 1L, (1L, 1L) -> 2L,
      (2L, 1L) -> 3L, (2L, 3L) -> 1L, (2L, 4L) -> 1L,
      (3L, 1L) -> 1L, (3L, 2L) -> 1L, (3L, 4L) -> 1L,
      (4L, 2L) -> 1L, (4L, 3L) -> 1L))
  }
}
