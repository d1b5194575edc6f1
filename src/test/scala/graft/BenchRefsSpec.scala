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

  test("gate math: section pairing, noisier-window rule, sub-100ms floor, triage rule") {
    // section pairing: a streaming face gates against the streaming floors
    assert(Bench.gateFor("q77_interval_join_stream", 0.10, 0.10) == 2.0 * 1.30) // nfRef streaming 0.30 wins
    assert(Bench.gateFor("q01_groupby_agg", 0.10, 0.50) == 2.0 * 1.17) // nfRef core 0.17 wins; streaming floor ignored
    // noisier-window rule: the run's own section floor wins when larger
    assert(Bench.gateFor("q01_groupby_agg", 0.25, 0.0) == 2.0 * 1.25)
    assert(Bench.gateFor("q73_sessionize_stream", 0.0, 0.40) == 2.0 * 1.40)
    // sub-100ms floor: a 90 ms ref gates as if it were 100 ms
    assert(math.abs(Bench.ratioFor(0.3, 0.09) - 3.0) < 1e-9)
    assert(math.abs(Bench.ratioFor(0.3, 0.15) - 2.0) < 1e-9)
    // triage: cpu collapse below 0.6x of the clean reference, or load1 > 4
    assert(Bench.loadSuspectFor(cpuFrac = 4.0, refCpuFrac = 8.0, load1 = 1.0))
    assert(!Bench.loadSuspectFor(cpuFrac = 5.0, refCpuFrac = 8.0, load1 = 1.0))
    assert(Bench.loadSuspectFor(cpuFrac = 8.0, refCpuFrac = 8.0, load1 = 4.5))
    assert(!Bench.loadSuspectFor(cpuFrac = 8.0, refCpuFrac = 0.0, load1 = 2.0))
  }
}
