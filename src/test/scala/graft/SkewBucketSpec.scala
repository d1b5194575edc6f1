package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Skew salting + bucketed co-located join — the manual scale levers. */
class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg matches plain agg on a hot-key distribution") {
    val df = ((1 to 10000).map(_ => ("hot", 1.0)) ++ (1 to 100).map(i => (s"k$i", 2.0)))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .orderBy("k").collect()
    val salted = Skew.saltedAgg(df, Seq("k"), nSalts = 8)(
        ("n", count(lit(1)), sum), ("total", sum(col("v")), sum))
      .orderBy("k").collect()
    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getString(0) == s.getString(0))
      assert(p.getLong(1) == s.getLong(1))
      assert(p.getDouble(2) == s.getDouble(2))
    }
    // phase-1 plan really aggregates on (key, salt): 2 exchanges, 4 aggregates
    val plan = Skew.saltedAgg(df, Seq("k"), 8)(("n", count(lit(1)), sum))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
  }

  test("saltedJoin matches plain join and spreads the hot key") {
    val left = ((1 to 5000).map(_ => 1L) ++ (2L to 50L)).toDF("id")
    val right = (1L to 50L).map(i => (i, s"dim$i")).toDF("id", "name")
    val plain = left.join(right, "id").groupBy("name").count().orderBy("name").collect()
    val salted = Skew.saltedJoin(left, right, "id", nSalts = 4)
      .groupBy("name").count().orderBy("name").collect()
    assert(plain.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      salted.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("AQE skew-join splits the hot key of a shingle-shaped self-join") {
    // the realistic 100 TB failure mode of ngramJaccardPairs/LSH buckets: one
    // hot shingle/bucket key dwarfs the rest of the shuffle. With AQE's skew
    // handling, the hot partition is split into advisory-sized chunks at
    // runtime — assert the executed plan actually did it (skew=true).
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // pad must survive shuffle compression, so make it incompressible
      val rnd = new scala.util.Random(7)
      val left = ((1 to 8000).map(i => ("hot", i.toLong)) ++
        (1 to 2000).map(i => (s"s$i", i.toLong))).map { case (k, i) =>
        (k, i, rnd.alphanumeric.take(96).mkString)
      }.toDF("shingle", "id", "pad")
      val right = ((1 to 40).map(i => ("hot", i.toLong)) ++
        (1 to 2000).map(i => (s"s$i", i.toLong))).toDF("shingle", "rid")
      val joined = left.join(right, "shingle")
      // execute THIS plan (not a derived count plan) so AQE finalizes it
      val n = joined.queryExecution.toRdd.count()
      assert(n == 8000L * 40 + 2000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not split the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE splits the hot prefix-shingle of ngramJaccardPairsPrefix (qd16 shape)") {
    // adversarial corpus for the prefix-filter join: a family of 1200
    // near-identical boilerplate docs whose shared shingle survives the
    // df>=2 prune INSIDE the prefix. Shape arithmetic: 9 tokens → 5
    // shingles, t=0.8 → prefix length 2 = [the doc's unique tail shingle
    // (df=1, pruned), ONE corpus-hot shared shingle] — so the candidate
    // self-join concentrates C(1200,2) pair work on a single key, hot on
    // BOTH sides (a self-join's skew is always two-sided; AQE handles it
    // by splitting each side and joining the sub-partition cartesian).
    // 100 3-doc families keep the median partition tiny so the hot key is
    // detectably skewed; 16 shuffle partitions keep the median free of it.
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.shuffle.partitions", "16")
      val base = (1 to 8).map(i => s"base$i").mkString(" ")
      val hotFamily = (0 until 1200).map(i => (i.toLong, s"$base tail$i"))
      val smallFamilies = for (g <- 0 until 100; m <- 0 until 3) yield {
        val b = (1 to 8).map(i => s"g${g}w$i").mkString(" ")
        (10000L + g * 10 + m, s"$b tail$m")
      }
      val docs = (hotFamily ++ smallFamilies).toDF("id", "text")
      val pairs = graft.dedup.Dedup.ngramJaccardPairsPrefix(
        docs, "id", "text", shingleK = 5, threshold = 0.8)
      pairs.queryExecution.toRdd.count() // execute THIS plan so AQE finalizes it
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot prefix shingle:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("saltedSelfJoin == plain self-join and spreads the hot key with AQE OFF") {
    // the explicit fallback for clusters running without AQE: a corpus-hot
    // blocking key makes the plain self-join one straggler task (df(hot)^2
    // comparisons). The salted plan must (a) produce the identical pair
    // multiset and (b) actually spread the hot key over >= nSalts-ish
    // reducers, with no AQE involved.
    val conf = spark.conf
    val keys = Seq("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      conf.set("spark.sql.shuffle.partitions", "32")
      val nSalts = 8
      val docs = ((1 to 400).map(i => ("hot", i.toLong)) ++
        (1 to 300).map(i => (s"k${i % 60}", 1000L + i))).toDF("bucket", "id")
      val salted = Skew.saltedSelfJoin(docs, "bucket", "id", nSalts)
      val plain = docs.as("a").join(
        docs.select(col("bucket"), col("id").as("id_b")), "bucket")
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("id") < col("id_b"))
          .select("bucket", "id", "id_b").as[(String, Long, Long)].collect().toSet
      val sp = pairs(salted)
      assert(sp == pairs(plain), "salted self-join pair set diverged from plain")
      assert(sp.count(_._1 == "hot") == 400 * 399 / 2)
      // the plan is salt-partitioned, not AQE-rewritten: the hot key's output
      // rows come from >= nSalts/2 distinct reducer partitions (a few salts
      // may hash-collide into one partition), and no AQE node is present
      val hotParts = salted.filter(col("bucket") === "hot")
        .select(spark_partition_id()).distinct().count()
      assert(hotParts >= nSalts / 2,
        s"hot key handled by only $hotParts partitions — salt did not spread it")
      val plainParts = plain.filter(col("bucket") === "hot")
        .select(spark_partition_id()).distinct().count()
      assert(plainParts == 1, s"control: unsalted hot key should be one partition, was $plainParts")
      assert(!salted.queryExecution.executedPlan.toString.contains("AdaptiveSparkPlan"))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("saltedSelfJoin == plain self-join (randomized: dup rows, null keys, varying salts)") {
    // exact ordered-pair MULTISET equality on random corpora: duplicate ids
    // in one bucket must pair the same number of times, null keys must drop
    // on both sides (equi-join semantics), and the equality must hold for
    // every nSalts (incl. 1 = degenerate no-spread case).
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(seed)
      val nSalts = 1 + rnd.nextInt(9)
      val rows = (0 until 200 + rnd.nextInt(300)).map { i =>
        val k = rnd.nextInt(10) match {
          case 0 => null
          case 1 | 2 | 3 | 4 => "hot"
          case n => s"k${n % 3}"
        }
        // duplicate ids on purpose: multiset semantics must survive salting
        (k, (i % 150).toLong)
      }
      val df = rows.toDF("bucket", "id")
      def multiset(d: org.apache.spark.sql.DataFrame) =
        d.select("bucket", "id", "id_b").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .groupBy(identity).view.mapValues(_.length).toMap
      val salted = multiset(Skew.saltedSelfJoin(df, "bucket", "id", nSalts))
      val plain = multiset(df.join(
        df.select(col("bucket"), col("id").as("id_b")), "bucket"))
      assert(salted == plain, s"seed=$seed nSalts=$nSalts")
      assert(plain.nonEmpty && !plain.keySet.exists(_._1 == null))
    }
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val a = (1L to 1000L).map(i => (i, i * 2.0)).toDF("id", "x")
    val b = (1L to 1000L).map(i => (i, s"n$i")).toDF("id", "name")
    spark.sql("DROP TABLE IF EXISTS graft_buck_a")
    spark.sql("DROP TABLE IF EXISTS graft_buck_b")
    try {
      a.write.bucketBy(8, "id").sortBy("id").saveAsTable("graft_buck_a")
      b.write.bucketBy(8, "id").sortBy("id").saveAsTable("graft_buck_b")
      val joined = spark.table("graft_buck_a").join(spark.table("graft_buck_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_buck_a")
      spark.sql("DROP TABLE IF EXISTS graft_buck_b")
    }
  }
}
