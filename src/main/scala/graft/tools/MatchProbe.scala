package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: time the matching round-select variants (joined vs
  * join-free) and the residual anti-join on the real co-purchase input.
  */
object MatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e0 = graft.sources.TpchGraph.copurchaseEdges(spark, sfDir)
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .select(col("u"), col("v"),
        md5(concat(lit("match:"), col("u").cast("string"), lit(":"),
          col("v").cast("string"))).as("pe"))
    println(s"[probe] edges = ${e0.count()}")
    val e = e0.localCheckpoint(true)

    def t(label: String)(df: DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $label run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    // OLD shape: vmin + two joins back
    val incOld = e.select(col("u").as("x"), col("pe"))
      .unionAll(e.select(col("v").as("x"), col("pe")))
    val vmin = incOld.groupBy("x").agg(min(col("pe")).as("mpe"))
    val oldSel = e.join(vmin.select(col("x").as("u"), col("mpe").as("mu")), "u")
      .join(vmin.select(col("x").as("v"), col("mpe").as("mv")), "v")
      .filter(col("pe") === col("mu") && col("pe") === col("mv"))
      .select(col("u"), col("v"))
    t("old-join-select")(oldSel)

    // NEW shape: min_by wins-twice
    val tag = concat_ws(":", col("pe"), col("u").cast("string"), col("v").cast("string"))
    val inc = e.select(col("u").as("x"), struct(col("u"), col("v")).as("edge"), tag.as("tg"))
      .unionAll(e.select(col("v").as("x"), struct(col("u"), col("v")).as("edge"), tag.as("tg")))
    val newSel = inc.groupBy("x").agg(min_by(col("edge"), col("tg")).as("edge"))
      .groupBy("edge").agg(count(lit(1)).as("c"))
      .filter(col("c") === 2)
      .select(col("edge.u").as("u"), col("edge.v").as("v"))
    t("new-minby-select")(newSel)

    // NEW shape variant: packed single min(string) then parse
    val vminTag = e.select(col("u").as("x"), tag.as("tg"))
      .unionAll(e.select(col("v").as("x"), tag.as("tg")))
      .groupBy("x").agg(min(col("tg")).as("mtg"))
    val newSel2 = vminTag.groupBy("mtg").agg(count(lit(1)).as("c"))
      .filter(col("c") === 2)
      .select(split(col("mtg"), ":").as("p"))
      .select(element_at(col("p"), 2).cast("long").as("u"),
        element_at(col("p"), 3).cast("long").as("v"))
    t("new-mintag-select")(newSel2)

    println(s"[probe] oldSel rows=${oldSel.count()} newSel rows=${newSel.count()} newSel2 rows=${newSel2.count()}")
    spark.stop()
  }
}
