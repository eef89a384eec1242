package graft.plans

/** Deterministic random multigraph generator for property tests: a
  * seeded LCG (so runs are reproducible without wall-clock randomness)
  * emitting `m` directed edge draws over `n` vertices — duplicates,
  * reversed pairs, and self-loops all occur by construction, which is
  * exactly what the canonicalization paths must absorb.
  */
object GraphGen {
  def randGraph(seed: Long, n: Int, m: Int): Seq[(Long, Long)] = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 33 }
    (0 until m).map(_ => (next() % n, next() % n))
  }
}
