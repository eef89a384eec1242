package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ): split each vector into M contiguous
  * subvectors, learn a small codebook per subspace, and represent every
  * vector as M small codes. Queries then rank candidates by ADC
  * (asymmetric distance computation): the query's distance to each
  * codebook entry is precomputed once, so scoring a vector is M table
  * lookups instead of a dim-length float scan — the memory/compute trick
  * behind IVF-PQ indexes (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search").
  *
  * Scale shape: codebooks and the per-query distance table are
  * broadcast-constant driver state (M×K×(dim/M) and M×K doubles).
  * Training is one posexplode aggregate (partially combined map-side);
  * encode and ADC scoring are pure map-side codegen over broadcast
  * literals — the corpus never shuffles, and the top-k is TakeOrdered.
  *
  * Cross-engine determinism (repo convention): codebook means use the
  * integer-exact accumulation pattern ([[Clustering.sphericalKMeans]]),
  * distances compare at 6-dp rounding with a code-ascending tie-break,
  * and every squared distance is decomposed as `ss − 2·sc + cc` with
  * left-to-right addition so an oracle re-running the identical FP op
  * sequence lands on identical doubles.
  */
object Pq {

  /** Per-subspace codebooks from per-label subvector means: subspace `m`
    * of `numSubspaces` covers dims `[m·dim/M, (m+1)·dim/M)`; the code for
    * a label is the label itself. Means are accumulation-order
    * independent (components pre-rounded to a 1e-6 integer grid, summed
    * as exact longs, divided, rounded to 4 dp). Driver-collected:
    * K×dim doubles — broadcast-constant scale.
    */
  def trainCodebooks(df: DataFrame, label: Column, vec: Column,
                     numSubspaces: Int): Seq[Seq[(Int, Seq[Double])]] = {
    require(numSubspaces >= 1, "trainCodebooks needs numSubspaces >= 1")
    val rows = df
      .select(label.cast("int").as("label"),
        posexplode(vec.cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(round(sum(round(col("x") * lit(1e6)).cast("long")).cast("double")
        / (count(lit(1)) * lit(1e6)), 4).as("c"))
      .collect()
    require(rows.nonEmpty, "trainCodebooks needs a non-empty corpus")
    val dim = rows.map(_.getInt(1)).max + 1
    require(dim % numSubspaces == 0,
      s"dim $dim is not divisible into $numSubspaces subspaces")
    val sub = dim / numSubspaces
    val byLabel = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (l, rs) =>
      l -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
    }
    (0 until numSubspaces).map { m =>
      byLabel.map { case (l, c) => l -> c.slice(m * sub, (m + 1) * sub) }
    }
  }

  /** Squared L2 between a subvector column and a literal centroid,
    * decomposed as `ss − 2·sc + cc` (each dot product a left-to-right
    * native [[Similarity.dot]] scan / Scala fold) so Spark and an oracle
    * running the same op sequence produce bit-identical doubles. Rounded
    * to 6 dp; `+ 0.0` folds a possible IEEE −0.0 to +0.0 (engines order
    * signed zeros differently).
    */
  private def sqDistCol(subv: Column, c: Seq[Double]): Column = {
    val cc = c.map(x => x * x).sum
    round(Similarity.dot(subv, subv)
      - lit(2.0) * Similarity.dot(subv, array(c.map(lit): _*))
      + lit(cc), 6) + lit(0.0)
  }

  private def sqDistScalar(a: Seq[Double], b: Seq[Double]): Double = {
    val ss = a.map(x => x * x).sum
    val sc = a.zip(b).map { case (x, y) => x * y }.sum
    val cc = b.map(x => x * x).sum
    val d = ss - 2.0 * sc + cc
    BigDecimal(d).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
  }

  /** Encode every vector: per subspace, the argmin-squared-distance code
    * (6-dp rounded, ties toward the smaller code). Emits `id` plus one
    * `code_m` int column per subspace — all inside one codegen stage.
    */
  def encode(df: DataFrame, id: Column, vec: Column,
             books: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    require(books.nonEmpty && books.forall(_.nonEmpty), "encode needs non-empty codebooks")
    val sub = books.head.head._2.length
    val v = vec.cast("array<double>")
    val codeCols = books.zipWithIndex.map { case (book, m) =>
      val sv = slice(v, m * sub + 1, sub)
      val scored = book.map { case (code, c) =>
        struct(sqDistCol(sv, c).as("d"), lit(code).as("code"))
      }
      val best = if (scored.size == 1) scored.head else least(scored: _*)
      best.getField("code").as(s"code_$m")
    }
    df.select(id.as("id") +: codeCols: _*)
  }

  /** ADC top-k: precompute the query's 6-dp squared distance to every
    * codebook entry (M×K literal doubles), score each encoded vector as
    * the left-to-right sum of its M lookups, return the k smallest
    * (ties toward the smaller id). Output `(id, codes, adc)` — `codes`
    * is the comma-joined code string for inspection.
    */
  def adcTopK(df: DataFrame, id: Column, vec: Column,
              books: Seq[Seq[(Int, Seq[Double])]], query: Seq[Double],
              k: Int): DataFrame = {
    val sub = books.head.head._2.length
    require(query.length == books.length * sub,
      s"query dim ${query.length} != ${books.length} x $sub")
    val distMaps = books.zipWithIndex.map { case (book, m) =>
      val q = query.slice(m * sub, (m + 1) * sub)
      map(book.flatMap { case (code, c) =>
        Seq(lit(code), lit(sqDistScalar(q, c)))
      }: _*)
    }
    val encoded = encode(df, id, vec, books)
    val terms = distMaps.zipWithIndex.map { case (dm, m) =>
      element_at(dm, col(s"code_$m"))
    }
    val codeStr = concat_ws(",", books.indices.map(m => col(s"code_$m").cast("string")): _*)
    encoded
      .select(col("id"), codeStr.as("codes"),
        round(terms.reduceLeft(_ + _), 6).as("adc"))
      .orderBy(col("adc"), col("id"))
      .limit(k)
  }
}
