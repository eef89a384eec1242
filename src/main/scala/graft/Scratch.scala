package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    val name = args.headOption.getOrElse("p19_winnowing_fingerprints")
    if (name == "cachebuild") {
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[scratch] $label time=${(System.nanoTime() - t0) / 1e9}%.3f s")
        r
      }
      import org.apache.spark.storage.StorageLevel
      val li = sources.TpchGraph.lineitemDeduped(spark, sfDir).persist(StorageLevel.MEMORY_AND_DISK)
      t("li_dedup_persist")(li.count())
      val n = sources.TpchGraph.nodes(spark, sfDir, withPayload = false, li0 = Some(li))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("nodes_persist")(n.count())
      val e = sources.TpchGraph.edges(spark, sfDir, withPayload = false, li0 = Some(li))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("edges_persist")(e.count())
      t("nodes_reread")(n.count())
    } else if (name == "dedup") {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val orderCols = Seq("l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      val keys = Seq("l_orderkey", "l_linenumber")
      def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select((keys ++ orderCols).map(col): _*)
      def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        for (i <- 1 to 2) {
          val t0 = System.nanoTime()
          val n = df.count()
          println(f"[scratch] $label run$i rows=$n time=${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
      time("minstruct") {
        li.groupBy(keys.map(col): _*)
          .agg(min(struct(orderCols.map(col): _*)).as("m"))
          .select(keys.map(col) ++ orderCols.map(c => col(s"m.$c")): _*)
      }
      time("sortfirst") {
        li.repartition(32, keys.map(col): _*)
          .sortWithinPartitions((keys ++ orderCols).map(col): _*)
          .groupBy(keys.map(col): _*)
          .agg(first(orderCols.head).as(orderCols.head), orderCols.tail.map(c => first(c).as(c)): _*)
      }
      time("window") {
        li.withColumn("rn", row_number().over(
            Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)))
          .filter(col("rn") === 1).drop("rn")
      }
      val a = li.groupBy(keys.map(col): _*)
        .agg(min(struct(orderCols.map(col): _*)).as("m"))
        .select(keys.map(col) ++ orderCols.map(c => col(s"m.$c")): _*)
      val b = li.repartition(32, keys.map(col): _*)
        .sortWithinPartitions((keys ++ orderCols).map(col): _*)
        .groupBy(keys.map(col): _*)
        .agg(first(orderCols.head).as(orderCols.head), orderCols.tail.map(c => first(c).as(c)): _*)
      println(s"[scratch] content diff a-b=${a.exceptAll(b).count()} b-a=${b.exceptAll(a).count()}")
    } else if (name.startsWith("explain:")) {
      val q = name.stripPrefix("explain:")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    } else {
      val fn = SparkEntry.queries(name)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[scratch] $name run$i rows=$n time=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
