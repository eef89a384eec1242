package graft.operators

import graft.core.GraphState
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GraphFrames-style motif finding: compile a structural pattern into a
  * join tree over the nodes/edges tables.
  *
  * Pattern grammar (a GraphFrames-compatible subset):
  * {{{
  *   (a)-[e:RelType]->(b); (b)-[:RelType]->(c); !(x)-[:RelType]->(a)
  * }}}
  *   - terms separated by `;`
  *   - vertex names bind across terms; `()` is anonymous (fresh variable,
  *     not in the output)
  *   - the edge name and the `:RelType` filter are each optional
  *   - `!` negates a term: no such edge may exist. A variable appearing
  *     only in a negated term is existential ("no edge to ANY x");
  *     at least one endpoint must be bound by a positive term.
  *   - `?` makes a term OPTIONAL (Cypher's OPTIONAL MATCH): matches
  *     extend the row, absence leaves the term's vertices/edge null —
  *     a left outer join on the shared vertices. An optional term must
  *     share at least one vertex with the positive pattern; multiple
  *     optional matches multiply rows exactly like positive ones.
  *   - an edge written `-[...]-`(no arrowhead) is UNDIRECTED (Cypher's
  *     direction-agnostic relationship): the term matches the edge in
  *     either orientation — compiled as the union of both directions
  *     before the join, so the rest of the pattern is unaffected. A
  *     named undirected edge reports the edge row in its STORED
  *     orientation. Undirected composes with `!`/`?` but not `*`.
  *   - a vertex may carry a TYPE ascription `(c:customer)` (Cypher's
  *     label predicate): the match is restricted to nodes of that
  *     `nodeType`. Ascriptions on a named vertex may appear on any of
  *     its occurrences but must agree; anonymous vertices may be typed
  *     too (`(:nation)`), enforced with a semi-join since they carry no
  *     output column.
  *   - `[:RelType*lo..hi]` is a VARIABLE-LENGTH path (Cypher's `*`):
  *     the term matches (src, dst) pairs connected by a `lo`..`hi`-hop
  *     chain of `RelType` edges. Semantics are DISTINCT endpoint pairs
  *     (reachability, not path enumeration — at graph scale paths
  *     explode, endpoint pairs don't); compiled as a union of k-hop
  *     self-join chains, each a plain equi-join Catalyst plans like any
  *     other. Ranged terms are positive-only and cannot bind an edge
  *     name (a multi-edge path has no single edge row).
  *
  * Output: one struct column per named vertex `(key, nodeType,
  * prettyName)` and per named edge `(src, dst, weight, relType,
  * relPayload)`.
  *
  * This is the declarative generalization of the reference's hand-written
  * hyperedge read-back (J6, `Library.fs:204-251` walks
  * HasProxyInfo→InferredFrom/Using/As chains imperatively): each term is
  * an equi-join on vertex keys, so Catalyst plans hash joins with the
  * relType filters pushed into the edge scans, AQE picks
  * broadcast/shuffle per term, and negated terms become anti-joins — the
  * whole motif is one distributed plan instead of per-atom traversal.
  */
object Motif {

  private[operators] final case class Term(src: String, edgeName: Option[String],
                                           relType: Option[String], dst: String,
                                           negated: Boolean, optional: Boolean = false,
                                           range: Option[(Int, Int)] = None,
                                           srcType: Option[String] = None,
                                           dstType: Option[String] = None,
                                           directed: Boolean = true)

  private val TermRe =
    """^(!|\?)?\s*\((\w*)(?::(\w+))?\)\s*-\s*\[(\w*)(?::(\w+))?(?:\*(\d+)\.\.(\d+))?\]\s*(->|-)\s*\((\w*)(?::(\w+))?\)$""".r

  /** Parse a motif pattern; visible for tests. */
  private[operators] def parse(pattern: String): Seq[Term] = {
    var anon = 0
    pattern.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case TermRe(mark, src, srcTy, e, rel, lo, hi, arrow, dst, dstTy) =>
        def v(name: String): String =
          if (name.nonEmpty) name else { anon += 1; s"__anon$anon" }
        val range = Option(lo).map { l =>
          val (a, b) = (l.toInt, hi.toInt)
          require(a >= 1 && b >= a && b <= 10,
            s"variable-length range must satisfy 1 <= lo <= hi <= 10: *$a..$b")
          (a, b)
        }
        val t = Term(v(src), Option(e).filter(_.nonEmpty), Option(rel), v(dst),
          negated = mark == "!", optional = mark == "?", range = range,
          srcType = Option(srcTy), dstType = Option(dstTy),
          directed = arrow == "->")
        require(!(t.negated && t.edgeName.nonEmpty),
          s"negated term may not bind an edge name: $pattern")
        require(t.range.isEmpty || (!t.negated && !t.optional && t.edgeName.isEmpty),
          s"variable-length term must be positive and unnamed: $pattern")
        require(t.directed || t.range.isEmpty,
          s"variable-length term must be directed: $pattern")
        t
      case other => throw new IllegalArgumentException(s"cannot parse motif term '$other'")
    }
  }

  private def kcol(v: String) = s"__${v}_key"

  /** Find all matches of `pattern` in the graph. */
  def find(g: GraphState, pattern: String): DataFrame = {
    val terms = parse(pattern)
    val neg = terms.filter(_.negated)
    val opt = terms.filter(_.optional)
    val pos = terms.filterNot(t => t.negated || t.optional)
    require(pos.nonEmpty, "motif needs at least one positive term")
    val edgeNames = (pos ++ opt).flatMap(_.edgeName)
    require(edgeNames.distinct.size == edgeNames.size,
      s"duplicate edge name in pattern '$pattern'")

    val edges = g.edges.toDF()
    val nodes = g.nodes.toDF()

    // vertex-type ascriptions, agreement-checked across occurrences
    val vType: Map[String, String] = terms
      .flatMap(t => Seq(t.src -> t.srcType, t.dst -> t.dstType))
      .collect { case (v, Some(ty)) => v -> ty }
      .groupBy(_._1).map { case (v, ps) =>
        val tys = ps.map(_._2).distinct
        require(tys.size == 1,
          s"conflicting type ascriptions for ($v): ${tys.mkString(", ")}")
        v -> tys.head
      }

    /** Semi-join an edge set down to endpoints whose vertex variable
      * carries a type ascription. Runs inside each term's plan, so the
      * restriction applies to anonymous vertices too.
      */
    def restrictKeys(df: DataFrame, binds: Seq[(String, String)]): DataFrame =
      binds.foldLeft(df) { case (acc, (c, v)) =>
        vType.get(v).fold(acc) { ty =>
          acc.join(nodes.filter(col("nodeType") === ty)
            .select(col("key").as(c)), Seq(c), "left_semi")
        }
      }

    /** Distinct (src, dst) pairs connected by a lo..hi-hop chain: union
      * of k-hop self-join chains over the deduped base edge set. Type
      * ascriptions restrict the ENDPOINTS only (intermediate hops match
      * any vertex, like Cypher).
      */
    def rangedPairs(t: Term): DataFrame = {
      val (lo, hi) = t.range.get
      val base = t.relType.map(r => edges.filter(col("relType") === r)).getOrElse(edges)
        .select(col("src").as("u"), col("dst").as("v")).distinct()
      val step = base.select(col("u").as("v"), col("v").as("w"))
      var hop = base
      val parts = collection.mutable.ArrayBuffer.empty[DataFrame]
      if (lo <= 1) parts += hop
      for (k <- 2 to hi) {
        hop = hop.join(step, "v").select(col("u"), col("w").as("v"))
        if (k >= lo) parts += hop
      }
      restrictKeys(parts.reduce(_ unionByName _).distinct()
        .withColumnsRenamed(Map("u" -> "src", "v" -> "dst")),
        Seq("src" -> t.src, "dst" -> t.dst))
    }

    def termDf(t: Term): DataFrame = {
      val selfLoop = t.src == t.dst
      if (t.range.nonEmpty) {
        val pairs = rangedPairs(t)
        return if (selfLoop)
          pairs.filter(col("src") === col("dst")).select(col("src").as(kcol(t.src)))
        else
          pairs.select(col("src").as(kcol(t.src)), col("dst").as(kcol(t.dst)))
      }
      val base = t.relType.map(r => edges.filter(col("relType") === r)).getOrElse(edges)
      val filtered = if (selfLoop) base.filter(col("src") === col("dst")) else base
      // edge attributes always report the STORED orientation
      val eCols = t.edgeName.toSeq.flatMap(e => Seq(
        col("src").as(s"__${e}_src"), col("dst").as(s"__${e}_dst"),
        col("weight").as(s"__${e}_weight"), col("relType").as(s"__${e}_relType"),
        col("relPayload").as(s"__${e}_relPayload")))
      def oriented(flip: Boolean): DataFrame = {
        val (sCol, dCol) = if (flip) (col("dst"), col("src")) else (col("src"), col("dst"))
        val keyCols =
          if (selfLoop) Seq(sCol.as(kcol(t.src)))
          else Seq(sCol.as(kcol(t.src)), dCol.as(kcol(t.dst)))
        // the reversed copy skips self-edges (already matched forward)
        val f = if (flip) filtered.filter(col("src") =!= col("dst")) else filtered
        f.select(keyCols ++ eCols: _*)
      }
      val out =
        if (t.directed || selfLoop) oriented(flip = false)
        else oriented(flip = false).unionByName(oriented(flip = true))
      // type restriction on the BOUND key columns (orientation-correct)
      restrictKeys(out,
        if (selfLoop) Seq(kcol(t.src) -> t.src)
        else Seq(kcol(t.src) -> t.src, kcol(t.dst) -> t.dst))
    }

    // fold positive terms: join each on the vertex variables it shares
    // with the accumulated plan (cross join if disjoint, like GraphFrames)
    var joined = termDf(pos.head)
    for (t <- pos.tail) {
      val df = termDf(t)
      val common = df.columns.toSet.intersect(joined.columns.toSet).toSeq.sorted
      joined =
        if (common.nonEmpty) joined.join(df, common, "inner")
        else joined.crossJoin(df)
    }

    // optional terms → left outer joins on the shared vertices (Cypher
    // OPTIONAL MATCH): run after the positive fold so absence can only
    // null-extend, never drop, a positive match
    for (t <- opt) {
      val df = termDf(t)
      val common = df.columns.toSet.intersect(joined.columns.toSet).toSeq.sorted
      require(common.nonEmpty,
        s"optional term (${t.src})->(${t.dst}) shares no vertex with the positive pattern")
      joined = joined.join(df, common, "left_outer")
    }

    // negated terms → anti-joins on the endpoints bound by positive terms
    for (t <- neg) {
      val bound = joined.columns.toSet
      val srcBound = bound.contains(kcol(t.src))
      val dstBound = bound.contains(kcol(t.dst))
      require(srcBound || dstBound,
        s"negated term (${t.src})->(${t.dst}) binds no positive-term vertex")
      val base0 = t.relType.map(r => edges.filter(col("relType") === r)).getOrElse(edges)
        .select(col("src"), col("dst"))
      // undirected negation forbids the edge in EITHER orientation
      val base =
        if (t.directed) base0
        else base0.unionByName(base0.filter(col("src") =!= col("dst"))
          .select(col("dst").as("src"), col("src").as("dst")))
      // negated self-loop: one key column, and the probe must only carry
      // genuine self-edges
      val (probe0, keys) =
        if (t.src == t.dst)
          (base.filter(col("src") === col("dst")).select(col("src").as(kcol(t.src))),
            Seq(kcol(t.src)))
        else
          (base.select(
            (if (srcBound) Seq(col("src").as(kcol(t.src))) else Nil) ++
              (if (dstBound) Seq(col("dst").as(kcol(t.dst))) else Nil): _*),
            (if (srcBound) Seq(kcol(t.src)) else Nil) ++
              (if (dstBound) Seq(kcol(t.dst)) else Nil))
      val probe = restrictKeys(probe0,
        (if (srcBound) Seq(kcol(t.src) -> t.src) else Nil) ++
          (if (dstBound && t.src != t.dst) Seq(kcol(t.dst) -> t.dst) else Nil))
      joined = joined.join(probe, keys, "left_anti")
    }

    // attach node attributes for named (non-anonymous) vertices, then
    // project to GraphFrames-shaped struct columns. Vertices bound only
    // by optional terms may be null → their attribute join is left outer
    val posVs = pos.flatMap(t => Seq(t.src, t.dst)).distinct.filterNot(_.startsWith("__anon"))
    val optVs = opt.flatMap(t => Seq(t.src, t.dst)).distinct
      .filterNot(_.startsWith("__anon")).filterNot(posVs.contains)
    for (v <- posVs ++ optVs) {
      val attrs = nodes.select(col("key").as(kcol(v)),
        col("nodeType").as(s"__${v}_nodeType"), col("prettyName").as(s"__${v}_prettyName"))
      joined = joined.join(attrs, Seq(kcol(v)),
        if (optVs.contains(v)) "left_outer" else "inner")
    }
    val vStructs: Seq[Column] = (posVs ++ optVs).map(v => struct(
      col(kcol(v)).as("key"), col(s"__${v}_nodeType").as("nodeType"),
      col(s"__${v}_prettyName").as("prettyName")).as(v))
    val eStructs: Seq[Column] = (pos ++ opt).flatMap(_.edgeName).map(e => struct(
      col(s"__${e}_src").as("src"), col(s"__${e}_dst").as("dst"),
      col(s"__${e}_weight").as("weight"), col(s"__${e}_relType").as("relType"),
      col(s"__${e}_relPayload").as("relPayload")).as(e))
    joined.select(vStructs ++ eStructs: _*)
  }
}
