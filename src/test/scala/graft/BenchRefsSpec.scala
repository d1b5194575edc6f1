package graft

/** The embedded frozen-ref table and the bench suite must stay in lockstep
  * (r13 directive 1's self-adjudicating artifact is only self-adjudicating
  * if every row it times has a reference): a new bench face without a
  * frozen ref, or a renamed face orphaning one, fails HERE instead of
  * silently weakening the in-artifact gate. */
class BenchRefsSpec extends SparkSpec {

  test("every bench face has a frozen ref; every ref names a live bench face") {
    val faces = SparkEntry.benchQueries.keySet
    val refs = BenchRefs.refs.keySet
    val unreferenced = faces.diff(refs)
    assert(unreferenced.isEmpty,
      s"bench faces without a frozen ref (add to BenchRefs + BASELINE.md): " +
        unreferenced.toSeq.sorted.mkString(", "))
    val orphaned = refs.diff(faces)
    assert(orphaned.isEmpty,
      s"frozen refs naming no bench face (renamed or removed query?): " +
        orphaned.toSeq.sorted.mkString(", "))
  }

  test("refs are sane: positive medians, non-negative cpu_frac, streaming faces known") {
    BenchRefs.refs.foreach { case (name, (med, cpu)) =>
      assert(med > 0, s"$name: non-positive frozen median $med")
      assert(cpu >= 0, s"$name: negative reference cpu_frac $cpu")
    }
    // the section split drives the gate's noise floors — a streaming face
    // missing from Bench.StreamingFaces would gate against the core floor
    val streaming = SparkEntry.benchQueries.keySet
      .filter(n => n.contains("_stream") || n.contains("interval_join"))
    assert(streaming == Bench.StreamingFaces,
      s"streaming-face set drifted: only-in-suite=${streaming.diff(Bench.StreamingFaces).toSeq.sorted} " +
        s"only-declared=${Bench.StreamingFaces.diff(streaming).toSeq.sorted}")
  }
}
