package graft.functions

import graft.SparkSpec
import graft.functions.expressions.DeflateLen
import org.apache.spark.sql.functions._

class DeflateLenSpec extends SparkSpec {
  import spark.implicits._

  private def len(s: String): Int =
    Seq(s).toDF("t").select(DeflateLen.deflateLenCol(col("t"))).head().getInt(0)

  test("repetitive text deflates far below random text of the same length") {
    val rng = new scala.util.Random(3)
    val rep = "spam spam spam " * 100
    val rand = (0 until rep.length).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    assert(rep.length == rand.length)
    val (lr, ln) = (len(rep), len(rand))
    assert(lr < ln / 3, s"repetitive=$lr random=$ln")
    assert(ln <= rand.length + 16) // deflate never blows up much on text
  }

  test("deterministic across invocations and row order") {
    val docs = Seq("alpha beta gamma", "alpha beta gamma", "delta " * 50)
    val a = docs.toDF("t").select(DeflateLen.deflateLenCol(col("t"))).collect().map(_.getInt(0))
    val b = docs.reverse.toDF("t").select(DeflateLen.deflateLenCol(col("t"))).collect().map(_.getInt(0))
    assert(a.toSeq == b.reverse.toSeq)
    assert(a(0) == a(1)) // identical input, identical length
  }

  test("nulls propagate; empty string compresses to a small positive length") {
    val r = Seq[Option[String]](None, Some("")).toDF("t")
      .select(DeflateLen.deflateLenCol(col("t"))).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getInt(0) >= 0 && r(1).getInt(0) <= 8)
  }
}
