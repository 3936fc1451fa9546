package graft

import org.apache.spark.sql.SparkSession

/** Scratch audit tool (not part of the driver contract):
  *   runMain graft.Scratch <sfDir> [queryNames...]   → formatted plans
  *   runMain graft.Scratch <sfDir> --time            → cold/warm timings
  *   runMain graft.Scratch <sfDir> --scale [family] → replication scaling probe
  *     (family ∈ events|lineitem|documents; run ONE family per JVM for
  *      honest numbers — a long-lived probe JVM accumulates codegen
  *      classes and GC debt that distorts late probes superlinearly)
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    if (args.contains("--probe")) {
      // host-state stamp without starting Spark — run before/after any
      // timing session to prove what the host was doing
      val (loopMs, eff) = HostProbe.cpu()
      val dio = HostProbe.directIoWriteMbps()
      println(f"[probe] loop_ms=$loopMs eff_cores=$eff%.1f dio_w_mbps=$dio%.1f")
      return
    }
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions",
        classOf[graft.sources.GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 1 && args(1) == "--scale") {
      scaleProbe(spark, d, if (args.length > 2) Some(args(2)) else None)
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "--wprobe") {
      // isolate the committer cost of a many-slot tiny-file write: same
      // shape as the s30 fixture insert (~360 slots × 4 files), written
      // directly (no store), v1 vs v2 committer
      import org.apache.spark.sql.functions._
      val df = spark.range(0, 40000)
        .select((col("id") % 360).as("gpart"), (col("id") % 4).as("gbucket"),
          col("id").as("v"))
      df.persist().count()
      for (algo <- Seq("1", "2", "1", "2")) {
        val out = s"/tmp/wprobe_${algo}_${System.nanoTime()}"
        val t0 = System.nanoTime()
        df.repartition(32, col("gpart"), col("gbucket"))
          .write.option("mapreduce.fileoutputcommitter.algorithm.version", algo)
          .partitionBy("gpart", "gbucket").parquet(out)
        println(f"[wprobe] v$algo ${(System.nanoTime() - t0) / 1e9}%.2f s")
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
        try {
          import scala.jdk.CollectionConverters._
          walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .iterator().asScala.foreach(java.nio.file.Files.delete)
        } finally walk.close()
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "--partprof") {
      // phase breakdown of the s30 bench row (many-slot fixture insert +
      // pruned-query batch)
      import org.apache.spark.sql.functions._
      operators.DmlFixture.register(spark)
      val prof = new JobProf(spark)
      for (iter <- 1 to 2) {
        println(s"--- iteration $iter ---")
        prof.time("src") {
          Tables.events(spark, d).filter(col("event_id") % 170 === 0)
            .withColumn("__r", explode(sequence(lit(0), lit(59))))
            .select((col("event_id") * 120 + col("__r")).as("k"),
              (col("ts") + expr("make_interval(0,0,0,__r,0,0,0)")).as("ts"),
              round(col("value") * 100).cast("long").as("cents"))
            .createOrReplaceTempView("bp_src")
          spark.sql("DROP TABLE IF EXISTS graftdml.bench_part")
          spark.sql("""CREATE TABLE graftdml.bench_part
            (k BIGINT NOT NULL, ts TIMESTAMP, cents BIGINT) USING graft
            PARTITIONED BY (days(ts))
            TBLPROPERTIES ('merge_key'='k', 'buckets'='4')""")
        }
        val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        val minPartKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
        val saved = spark.conf.getOption(advisoryKey)
        val savedMin = spark.conf.getOption(minPartKey)
        spark.conf.set(advisoryKey, "64KB") // match the bench fixture
        spark.conf.set(minPartKey, "64KB")
        try prof.time("INSERT") {
          spark.sql("INSERT INTO graftdml.bench_part SELECT * FROM bp_src")
        } finally {
          saved.fold(spark.conf.unset(advisoryKey))(
            spark.conf.set(advisoryKey, _))
          savedMin.fold(spark.conf.unset(minPartKey))(
            spark.conf.set(minPartKey, _))
        }
        val r = spark.sql("SELECT CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE) " +
          "FROM graftdml.bench_part").head()
        val (d0, d1) = (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate)
        val span = (d1.toEpochDay - d0.toEpochDay).toInt
        org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
        var phases = Map.empty[String, Long].withDefaultValue(0L)
        prof.time("24 queries") {
          (1 to 12).foreach { i =>
            val day = d0.plusDays(math.max(1L, i.toLong * span / 13))
            val q1 = spark.sql(s"SELECT SUM(cents) FROM graftdml.bench_part WHERE " +
              s"ts >= timestamp'$day 00:00:00' AND " +
              s"ts < timestamp'${day.plusDays(1)} 00:00:00'")
            q1.head()
            val q2 = spark.sql(s"SELECT * FROM graftdml.bench_part WHERE k = ${i * 1207} " +
              s"AND ts >= timestamp'$day 00:00:00' AND " +
              s"ts < timestamp'${day.plusDays(1)} 00:00:00'")
            q2.count()
            Seq(q1, q2).foreach(q => q.queryExecution.tracker.phases.foreach {
              case (ph, s) => phases += ph -> (phases(ph) + s.durationMs) })
          }
        }
        phases.toSeq.sortBy(-_._2).foreach { case (ph, ms) =>
          println(f"[prof-phase] $ph%-22s ${ms / 1e3}%6.2f s") }
        println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
          .linesIterator.take(18).mkString("\n"))
        prof.time("final agg") {
          spark.sql("SELECT SUM(cents) AS s, COUNT(*) AS n " +
            "FROM graftdml.bench_part").count()
        }
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "--mvprof") {
      // phase breakdown of the s39 bench row (MV lifecycle: fixture agg,
      // CREATE MV initial materialization, DML burst, incremental refresh)
      import org.apache.spark.sql.functions._
      operators.DmlFixture.register(spark)
      val prof = new JobProf(spark)
      for (iter <- 1 to 2) {
        println(s"--- iteration $iter ---")
        prof.time("fixture") {
          val ev = Tables.events(spark, d)
            .withColumn("cents", round(col("value") * 100).cast("long"))
          ev.groupBy(col("user_id")).agg(max_by(
              struct(col("event_id"), col("cents")),
              struct(col("ts"), col("event_id"))).as("r"))
            .select(col("user_id"), col("r.event_id").as("event_id"),
              col("r.cents").as("cents"))
            .createOrReplaceTempView("bmv_base")
          spark.sql("DROP MATERIALIZED VIEW IF EXISTS graftdml.bench_mv")
          spark.sql("DROP TABLE IF EXISTS graftdml.bench_mv_t")
          spark.sql("""CREATE TABLE graftdml.bench_mv_t
            (user_id BIGINT NOT NULL, event_id BIGINT, cents BIGINT) USING graft
            TBLPROPERTIES ('merge_key'='user_id', 'buckets'='8')""")
        }
        prof.time("INSERT") {
          spark.sql("INSERT INTO graftdml.bench_mv_t SELECT * FROM bmv_base")
        }
        prof.time("CREATE MV") {
          spark.sql("""CREATE MATERIALIZED VIEW graftdml.bench_mv AS
            SELECT user_id % 97 AS g, COUNT(*) AS n, SUM(cents) AS s
            FROM graftdml.bench_mv_t GROUP BY user_id % 97""")
        }
        prof.time("UPDATE") {
          spark.sql("UPDATE graftdml.bench_mv_t SET cents = cents + 100 " +
            "WHERE user_id % 7 = 0")
        }
        prof.time("DELETE") {
          spark.sql("DELETE FROM graftdml.bench_mv_t WHERE cents < 500")
        }
        prof.time("INSERT2") {
          spark.sql("INSERT INTO graftdml.bench_mv_t " +
            "SELECT -1 - id, id, id * 3 FROM range(0, 5000)")
        }
        prof.time("refresh") {
          val mode = spark.sql("CALL graftdml.refresh_mv(view => 'bench_mv')")
            .head().getString(1)
          require(mode == "incremental", s"bench_mv refresh ran '$mode'")
        }
        prof.time("read") {
          spark.sql("SELECT g, n, s FROM graftdml.bench_mv").count()
        }
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "--g4prof") {
      // stage-level breakdown of the g4 pipeline: edge build vs degree/
      // orientation vs adjacency vs intersection vs aggregate
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val prof = new JobProf(spark)
      for (iter <- 1 to 2) {
        println(s"--- iteration $iter ---")
        val li = Tables.lineitem(spark, d)
        val pairs = prof.time("pairs build") {
          operators.GraphQueries.coOccurrencePairs(li)
            .select($"u", $"v").localCheckpoint(true)
        }
        val e = pairs
        prof.time("edge count") { e.count() }
        val deg = e.select($"u".as("n")).union(e.select($"v".as("n")))
          .groupBy($"n").agg(count(lit(1)).as("deg"))
        val ew = e
          .join(deg.select($"n".as("u"), $"deg".as("du")), "u")
          .join(deg.select($"n".as("v"), $"deg".as("dv")), "v")
        val lower = $"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v")
        val oriented = prof.time("orient+ckpt") {
          ew.select(
            when(lower, $"u").otherwise($"v").as("src"),
            when(lower, $"v").otherwise($"u").as("dst"))
          .repartition(2 * spark.sparkContext.defaultParallelism)
          .localCheckpoint(true)
        }
        val adj = oriented.groupBy($"src")
          .agg(sort_array(collect_list($"dst")).as("nbr"))
          .localCheckpoint(true)
        prof.time("adj build") { adj.count() }
        val withCommon = oriented
          .join(broadcast(adj.select($"src", $"nbr".as("au"))), Seq("src"))
          .join(broadcast(adj.select($"src".as("dst"), $"nbr".as("av"))), Seq("dst"))
          .select($"src".as("u"), $"dst".as("v"),
            graft.functions.GraftFunctions.sorted_intersect($"au", $"av").as("ws"))
          .filter(size($"ws") > 0)
        prof.time("intersect") {
          withCommon.select(sum(size($"ws"))).head()
        }
        val contrib = withCommon.select(explode(concat(
            array(struct($"u".as("n"), size($"ws").cast("long").as("c")),
                  struct($"v".as("n"), size($"ws").cast("long").as("c"))),
            transform($"ws", w => struct(w.as("n"), lit(1L).as("c"))))).as("t"))
          .select($"t.n".as("n"), $"t.c".as("c"))
        prof.time("full agg") {
          contrib.groupBy($"n").agg(sum($"c").as("tri")).join(deg, "n").count()
        }
        pairs.unpersist(); oriented.unpersist(); adj.unpersist()
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "--dmlprof") {
      // per-statement breakdown of the s11 shape — where a store commit's
      // time goes at the bench SF (upstream agg vs each DML statement)
      dmlProf(spark, d)
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "--timeq") {
      // time specific queries (cold + warm), any registry entry
      val prof = new JobProf(spark)
      args.drop(2).foreach { n =>
        def run(l: String) = {
          val t0 = System.nanoTime()
          prof.time(l)(SparkEntry.queries(n)(spark, d).count())
          (System.nanoTime() - t0) / 1e9
        }
        val cold = run(s"$n cold"); val warm = run(s"$n warm")
        println(f"[timeq] $n%-28s cold=$cold%6.2f warm=$warm%6.2f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "--time") {
      SparkEntry.benchNames.foreach { n =>
        def run() = {
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, d).count()
          (System.nanoTime() - t0) / 1e9
        }
        val cold = run(); val warm = run(); val warm2 = run()
        println(f"[time] $n%-24s cold=$cold%6.2f warm=$warm%6.2f warm2=$warm2%6.2f")
      }
    } else {
      val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.benchNames
      names.foreach { n =>
        println(s"\n########## $n ##########")
        val df = SparkEntry.queries(n)(spark, d)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }

  /** Time each statement of the s11 bench query separately (two
    * iterations: cold catalog + warm JVM). */
  /** Job/stage/task profiler: quantifies how much of a statement's wall
    * time is Spark job time (scheduling + execution) vs driver-side work
    * between jobs (planning, commit metadata). */
  final class JobProf(spark: SparkSession) {
    private val jobs = new java.util.concurrent.atomic.AtomicInteger
    private val stages = new java.util.concurrent.atomic.AtomicInteger
    private val tasks = new java.util.concurrent.atomic.AtomicInteger
    private val taskMs = new java.util.concurrent.atomic.AtomicLong
    private val jobWallMs = new java.util.concurrent.atomic.AtomicLong
    private val jobStartTs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    private val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStartTs.put(j.jobId, j.time)
        if (sys.env.contains("GRAFT_PROF_JOBS"))
          println(s"[prof-job] ${j.jobId} stages=${j.stageInfos.size} " +
            j.stageInfos.map(si => s"${si.name.takeWhile(_ != '\n')}[${si.numTasks}]")
              .mkString(" | "))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStartTs.remove(j.jobId)
        if (t0 != 0L) jobWallMs.addAndGet(j.time - t0)
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        if (sys.env.contains("GRAFT_PROF_JOBS")) {
          val m = s.stageInfo.taskMetrics
          println(f"[prof-stage] ${s.stageInfo.stageId}%4d " +
            f"tasks=${s.stageInfo.numTasks}%4d run=${m.executorRunTime / 1e3}%7.2f s " +
            f"cpu=${m.executorCpuTime / 1e9}%7.2f s " +
            s"${s.stageInfo.name.takeWhile(_ != '\n').take(70)}")
        }
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
    }
    spark.sparkContext.addSparkListener(listener)
    /** Deregister the listener — repeated JobProf constructions in one
      * JVM would otherwise accumulate stale listeners on the bus (r16
      * ADVICE). */
    def close(): Unit = spark.sparkContext.removeSparkListener(listener)
    def time[A](l: String)(f: => A): A = {
      val (j0, s0, t0n, tm0, jw0) =
        (jobs.get, stages.get, tasks.get, taskMs.get, jobWallMs.get)
      val t0 = System.nanoTime(); val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      // settle the async listener bus before reading the counters
      Thread.sleep(150)
      println(f"[prof] $l%-16s $wall%6.2f s  jobs=${jobs.get - j0}%3d " +
        f"stages=${stages.get - s0}%3d tasks=${tasks.get - t0n}%4d " +
        f"taskTime=${(taskMs.get - tm0) / 1e3}%6.2f s " +
        f"jobWall=${(jobWallMs.get - jw0) / 1e3}%6.2f s")
      r
    }
  }

  def dmlProf(spark: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import spark.implicits._
    operators.DmlFixture.register(spark)
    val prof = new JobProf(spark)
    def time[A](l: String)(f: => A): A = prof.time(l)(f)
    val cutoff = lit("2024-01-16 00:00:00").cast(TimestampType)
    val ev = Tables.events(spark, d)
      .withColumn("cents", round($"value" * 100).cast("long"))
    def latest(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"user_id").agg(max_by(
        struct($"event_id", $"event_type", $"cents"),
        struct($"ts", $"event_id")).as("r"))
    for (iter <- 1 to 2) {
      println(s"--- iteration $iter ---")
      time("views") {
        latest(ev.filter($"ts" < cutoff && $"user_id" % 3 =!= 0))
          .select($"user_id", $"r.event_id".as("event_id"), $"r.cents".as("cents"))
          .createOrReplaceTempView("s11_base")
        latest(ev.filter($"ts" >= cutoff && $"user_id" % 5 =!= 1))
          .select($"user_id", $"r.event_id".as("c_event"),
            $"r.cents".as("c_cents"),
            when($"r.event_type" === "purchase", "delete")
              .otherwise("upsert").as("op"))
          .createOrReplaceTempView("s11_chg")
      }
      time("drop+create") {
        spark.sql("DROP TABLE IF EXISTS graftdml.user_state")
        spark.sql("""CREATE TABLE graftdml.user_state
          (user_id BIGINT NOT NULL, event_id BIGINT, cents BIGINT) USING graft
          TBLPROPERTIES ('merge_key'='user_id', 'buckets'='8')""")
      }
      time("INSERT") { spark.sql("INSERT INTO graftdml.user_state " +
        "SELECT user_id, event_id, cents FROM s11_base") }
      time("MERGE") { spark.sql("""MERGE INTO graftdml.user_state t
        USING s11_chg c ON t.user_id = c.user_id
        WHEN MATCHED AND c.op = 'delete' THEN DELETE
        WHEN MATCHED THEN UPDATE SET event_id = c.c_event, cents = c.c_cents
        WHEN NOT MATCHED AND c.op <> 'delete' THEN
          INSERT (user_id, event_id, cents) VALUES (c.user_id, c.c_event, c.c_cents)""") }
      time("UPDATE") { spark.sql("UPDATE graftdml.user_state " +
        "SET cents = cents + 100 WHERE user_id % 7 = 0") }
      time("DELETE") { spark.sql("DELETE FROM graftdml.user_state WHERE cents < 500") }
      time("read") { spark.sql("SELECT * FROM graftdml.user_state").count() }
      val dir = s"${operators.DmlFixture.warehouse}/user_state"
      val v = graft.sources.GraftStore.currentVersion(dir)
      (1L to v).foreach { vv =>
        val (b, f, by) = graft.sources.GraftStore.versionStats(dir, vv)
        println(s"[prof] v$vv: $b buckets, $f files, $by bytes")
      }
    }
  }

  /** Replicate the sf0.1 tables in-memory (keys re-salted so cardinality
    * grows with volume) and time the scale-critical operators at 1×/10×/
    * 100× events, 1×/4×/16× lineitem — evidence that the chosen plans
    * scale linearly, not a benchmark. */
  def scaleProbe(spark: org.apache.spark.sql.SparkSession, d: String,
                 family: Option[String] = None): Unit = {
    def want(f: String): Boolean = family.forall(_ == f)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def replicate(df: org.apache.spark.sql.DataFrame, k: Int, keyCols: Seq[String]) = {
      val r = df.withColumn("__r", explode(sequence(lit(0), lit(k - 1))))
      // single-file parquet yields ~3 input partitions; without this the
      // replicated cache builds (and on eviction REBUILDS) in 3 fat tasks
      // whose columnar-compression stats dominate every later timing — a
      // probe artifact a real multi-file table doesn't have
      keyCols.foldLeft(r)((acc, c) =>
        acc.withColumn(c, acc(c) * k + col("__r"))).drop("__r").repartition(32)
    }
    for (k <- Seq(1, 10, 100) if want("events")) {
      val ev = replicate(Tables.events(spark, d), k, Seq("event_id", "user_id")).cache()
      val n = ev.count()
      time(f"events x$k%3d ($n%9d rows) s6-style compaction") {
        ev.groupBy($"user_id")
          .agg(max_by(struct($"event_id", $"ts"), struct($"ts", $"event_id")))
          .count()
      }
      time(f"events x$k%3d ($n%9d rows) t1-style window agg") {
        ev.groupBy(window($"ts", "5 minutes"), $"event_type").count().count()
      }
      time(f"events x$k%3d ($n%9d rows) w3-style running window") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")
        ev.withColumn("rs", sum(round($"value" * 100).cast("long")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .agg(max($"rs")).count()
      }
      // the de-skewed e3 shape: per-type totals aggregate (5 rows) joined
      // back broadcast — must scale linearly where the old 5-reducer
      // whole-partition window would not
      time(f"events x$k%3d ($n%9d rows) e3-style agg + broadcast join-back") {
        val t = ev.groupBy($"event_type")
          .agg(sum(round($"value" * 100).cast("long")).as("tot"))
        ev.join(broadcast(t), "event_type")
          .select(($"value" / $"tot").as("share")).count()
      }
      // the de-skewed w1 shape: distributed two-pass rank over a 5-value key
      time(f"events x$k%3d ($n%9d rows) w1-style ranged row_number") {
        operators.SkewUtils.rangedRowNumber(
          ev.select($"event_type", $"event_id", $"value"),
          Seq("event_type"), Seq("value", "event_id"), 32, "rn")
          .agg(max($"rn")).count()
      }
      // the x18 shape: keyed two-pass prefix sum over a 5-value key
      time(f"events x$k%3d ($n%9d rows) x18-style keyed ranged cumsum") {
        operators.SkewUtils.rangedCumSumByKey(
          ev.select($"event_type", $"event_id",
            round($"value" * 100).cast("long").as("cents")),
          Seq("event_type"), Seq("event_id"), "cents", 32, "cum")
          .agg(max($"cum")).count()
      }
      // the j9 shape: point-in-interval bucket join, events as points
      // against 1-hour user-session intervals derived from the same table
      time(f"events x$k%3d ($n%9d rows) j9-style bucketed interval join") {
        val iv = ev.groupBy($"user_id").agg(min($"ts").as("s"))
          .select($"user_id", $"s", ($"s" + expr("INTERVAL 1 HOUR")).as("e"))
        operators.SkewUtils.pointInIntervalJoin(
          ev.select($"ts", $"event_id"), "ts", iv, "s", "e", 3600)
          .count()
      }
      ev.unpersist()
    }
    // the DML store's scale-critical paths: append commit, sub-percent
    // delta commit (cost must track touched buckets, not table size),
    // bucket-pruned point lookup, and the rebucket rewrite (∝ data, one
    // claimed commit). One catalog per k — catalog options freeze at
    // first use per name.
    for (k <- Seq(1, 10, 100) if want("dml")) {
      val cat = s"gscale$k"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_scale_dml").toString)
      val ev = replicate(Tables.events(spark, d), k, Seq("event_id", "user_id"))
      // one row per EVENT (event_id is the merge key): key count scales
      // with k — the layout paths need millions of keys to show shape
      val state = ev.groupBy($"event_id".as("k"))
        .agg(max(round($"value" * 100).cast("long")).as("cents")).cache()
      val n = state.count()
      state.createOrReplaceTempView(s"scale_src_$k")
      spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, " +
        "cents BIGINT) USING graft " +
        "TBLPROPERTIES ('merge_key'='k', 'buckets'='64')")
      time(f"dml x$k%3d ($n%9d keys) append commit") {
        spark.sql(s"INSERT INTO $cat.t SELECT * FROM scale_src_$k")
      }
      time(f"dml x$k%3d ($n%9d keys) 0.1%% delta commit (CoW)") {
        spark.sql(s"UPDATE $cat.t SET cents = cents + 1 WHERE k % 1000 = 0")
      }
      // one key → one bucket: the CoW rewrite's cost must track the
      // TOUCHED bucket (1/64 of the table), not the table
      time(f"dml x$k%3d ($n%9d keys) single-key delta commit (1 bucket)") {
        spark.sql(s"UPDATE $cat.t SET cents = cents + 1 WHERE k = 4242")
      }
      time(f"dml x$k%3d ($n%9d keys) point lookup (bucket-pruned)") {
        spark.sql(s"SELECT * FROM $cat.t WHERE k = 4242").count()
      }
      time(f"dml x$k%3d ($n%9d keys) full scan (for contrast)") {
        spark.sql(s"SELECT COUNT(*) FROM $cat.t").head()
      }
      time(f"dml x$k%3d ($n%9d keys) rebucket 64 -> 256") {
        spark.sql(s"CALL $cat.rebucket(table => 't', buckets => 256)")
      }
      time(f"dml x$k%3d ($n%9d keys) point lookup after rebucket") {
        spark.sql(s"SELECT * FROM $cat.t WHERE k = 4242").count()
      }
      state.unpersist()
    }
    // commit-metadata cost vs TABLE FILE COUNT — the r12 manifest-commit
    // claim: a single-key delta's commit time is flat as the table's live
    // file count grows (the pre-r12 layout hard-linked every untouched
    // file forward, so this same probe grew linearly). One table, grown by
    // small appends (each adds ~buckets files); at checkpoints, time a
    // one-bucket CoW update and report the live file count it paid for.
    for (k <- Seq(1) if want("files")) {
      import graft.sources.{GraftStore, GraftTableMeta}
      import org.apache.spark.sql.types._
      val dir = java.nio.file.Files.createTempDirectory("graft_scale_files")
        .toString + "/t"
      val schema = StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("cents", LongType, nullable = true)))
      GraftStore.create(dir, GraftTableMeta(schema, Seq("k"), buckets = 8))
      var appended = 0
      def appendOnce(): Unit = {
        val lo = appended * 100L
        GraftStore.applyChanges(spark, dir,
          spark.range(lo, lo + 100).select($"id".as("k"), ($"id" * 3).as("cents"))
            .withColumn(GraftStore.OpCol, lit("I")), allInserts = true)
        appended += 1
      }
      Seq(10, 50, 250).foreach { target =>
        while (appended < target) appendOnce()
        val v = GraftStore.currentVersion(dir)
        val (_, nFiles, _) = GraftStore.versionStats(dir, v)
        time(f"files  ($nFiles%5d live files, $appended%3d appends) single-key delta commit") {
          GraftStore.applyChanges(spark, dir,
            Seq((7L, 999L)).toDF("k", "cents")
              .withColumn(GraftStore.OpCol, lit("U")))
        }
        GraftStore.expireVersions(dir, keepLast = 2) // bound dir growth
      }
      GraftStore.dropTable(dir)
    }
    // PARTITIONED BY at scale: a days(ts)-partitioned store table grown
    // ×1/×10/×100 — the claims: a one-day range scan costs ∝ the DAY (flat
    // as the table grows, directory-level pruning before any file opens),
    // a point lookup composes partition ∩ bucket pruning, and
    // expire_partitions stays a flat metadata commit at every size.
    for (k <- Seq(1, 10, 100) if want("part")) {
      val cat = s"gpart$k"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_scale_part").toString)
      // replicate events; spread replicas across REPLICA-MANY DAYS so the
      // partition count grows with k (the retention/pruning shape)
      val ev = Tables.events(spark, d)
        .withColumn("__r", explode(sequence(lit(0), lit(k - 1))))
        .select(($"event_id" * k + $"__r").as("k"),
          ($"ts" + expr("make_interval(0,0,0,__r,0,0,0)")).as("ts"),
          round($"value" * 100).cast("long").as("cents"))
      ev.createOrReplaceTempView(s"part_src_$k")
      spark.sql(s"""CREATE TABLE $cat.t (k BIGINT NOT NULL, ts TIMESTAMP,
        cents BIGINT) USING graft PARTITIONED BY (days(ts))
        TBLPROPERTIES ('merge_key'='k', 'buckets'='16')""")
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM part_src_$k")
      val (d0, d1, days) = {
        val r = spark.sql(s"SELECT CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE), " +
          s"COUNT(DISTINCT CAST(ts AS DATE)) FROM $cat.t").head()
        (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate, r.getLong(2))
      }
      val n = spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0)
      val mid = d0.plusDays((d1.toEpochDay - d0.toEpochDay) / 2)
      time(f"part   x$k%3d ($n%9d rows, $days%4d days) full scan") {
        spark.sql(s"SELECT SUM(cents) FROM $cat.t").head()
      }
      time(f"part   x$k%3d ($n%9d rows, $days%4d days) one-day range scan (pruned)") {
        spark.sql(s"SELECT SUM(cents) FROM $cat.t WHERE " +
          s"ts >= timestamp'$mid 00:00:00' AND " +
          s"ts < timestamp'${mid.plusDays(1)} 00:00:00'").head()
      }
      time(f"part   x$k%3d ($n%9d rows, $days%4d days) point lookup (day ∩ bucket)") {
        spark.sql(s"SELECT * FROM $cat.t WHERE k = 4242 AND " +
          s"ts >= timestamp'$mid 00:00:00' AND " +
          s"ts < timestamp'${mid.plusDays(1)} 00:00:00'").count()
      }
      time(f"part   x$k%3d ($n%9d rows, $days%4d days) expire_partitions (metadata)") {
        spark.sql(s"CALL $cat.expire_partitions(table => 't', " +
          s"below => '${d0.plusDays(2).toEpochDay}')")
      }
    }
    // Per-column bloom filters (r13): two identical tables — one with
    // `bloom_filter_columns` on a high-cardinality SCATTERED column, one
    // without — compacted into row-group-bounded files, then needle `=`
    // and IN lookups on that column. Zone maps can't skip (every file's
    // min/max spans the domain — values are scattered by construction),
    // bucket pruning can't help (not the merge key): the bloomed table's
    // reader must win by row-group skipping alone.
    for (k <- Seq(1, 10) if want("bloom")) {
      val cat = s"gbloom$k"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_scale_bloom").toString)
      val ev = replicate(Tables.events(spark, d), k * 10, Seq("event_id"))
        .select($"event_id".as("k"),
          // scattered probe column: a multiplicative hash of the key —
          // high cardinality, uniform across every file's range
          (pmod($"event_id" * 2654435761L, lit(1000000007L))).as("probe"),
          round($"value" * 100).cast("long").as("cents"))
      ev.createOrReplaceTempView(s"bloom_src_$k")
      Seq("on" -> ", 'bloom_filter_columns'='probe'", "off" -> "").foreach {
        case (tag, prop) =>
          spark.sql(s"""CREATE TABLE $cat.t_$tag (k BIGINT NOT NULL,
            probe BIGINT, cents BIGINT) USING graft
            TBLPROPERTIES ('merge_key'='k', 'buckets'='4'$prop)""")
          spark.sql(s"INSERT INTO $cat.t_$tag SELECT * FROM bloom_src_$k")
          // bounded files → many row groups per bucket
          spark.sql(s"CALL $cat.optimize(table => 't_$tag', " +
            "max_files_per_bucket => 0, target_file_rows => 50000)")
      }
      val n = spark.sql(s"SELECT COUNT(*) FROM $cat.t_on").head().getLong(0)
      val needles = spark.sql(
        s"SELECT probe FROM $cat.t_on WHERE k % 100000 = 7 LIMIT 8")
        .collect().map(_.getLong(0))
      Seq("off", "on").foreach { tag =>
        time(f"bloom  x$k%3d ($n%9d rows) needle IN-lookup [$tag]") {
          (0 until 5).foreach { _ =>
            spark.sql(s"SELECT k, cents FROM $cat.t_$tag WHERE " +
              s"probe IN (${needles.mkString(",")})").collect()
          }
        }
      }
    }
    // Slot-scoped compaction (r13): a days(ts)-partitioned table grown
    // ×1/×10/×100 in HISTORY (day count), with a FIXED number of hot-day
    // appends fragmenting one day. The claim: optimize rewrites the hot
    // day's slots alone, so its cost is flat as history grows — the
    // pre-r13 per-bucket trigger would have rewritten every bucket across
    // ALL days (O(bucket × history)). Also pinned: cold-slot owner maps
    // unchanged by the compaction.
    // Rate-limited changelog drain (T14) across a ×4/×16/×64 BACKLOG: a
    // consumer restarting against k committed versions drains with
    // maxVersionsPerTrigger=8 under AvailableNow. The claims: (a) the
    // drain terminates in exactly ceil(k/8) version-aligned batches,
    // (b) PER-BATCH cost stays flat as the backlog grows (each batch
    // plans only its 8 slices — an unbounded first batch would grow
    // linearly and is printed alongside for contrast), (c) the
    // admission-control poll (slice footer row counts) never re-reads a
    // slice (process-wide cache, immutable slices).
    val streamKs = sys.props.get("graft.scale.ks")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(16, 64, 256))
    for (k <- streamKs if want("stream")) {
      val cat = s"gstream$k"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_scale_stream").toString)
      spark.sql(s"""CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT)
        USING graft TBLPROPERTIES ('merge_key'='k', 'buckets'='4')""")
      val dir = s"${spark.conf.get(s"spark.sql.catalog.$cat.warehouse")}/t"
      time(f"stream x$k%3d fixture: $k commits of 100 rows") {
        (0 until k).foreach { i =>
          graft.sources.GraftStore.applyChanges(spark, dir,
            spark.range(i * 100L, i * 100L + 100)
              .select($"id".as("k"), ($"id" * 7).as("v"))
              .withColumn(graft.sources.GraftStore.OpCol, lit("I")),
            allInserts = true)
        }
      }
      def drain(opts: Map[String, String], label: String): Unit = {
        val batches = new java.util.concurrent.atomic.AtomicLong()
        val rows = new java.util.concurrent.atomic.AtomicLong()
        val t0 = System.nanoTime()
        var r = spark.readStream
        opts.foreach { case (kk, vv) => r = r.option(kk, vv) }
        val q = r.table(s"$cat.`t$$changes`").writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val n = df.count()
            if (n > 0) { batches.incrementAndGet(); rows.addAndGet(n) }
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        require(q.awaitTermination(600000L), "drain did not terminate")
        q.stop()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scale] stream x$k%3d $label: $secs%.2f s, " +
          f"${batches.get()}%3d batches, ${rows.get()}%7d rows, " +
          f"${secs / math.max(batches.get(), 1)}%.3f s/batch")
      }
      drain(Map("maxVersionsPerTrigger" -> "8"), "rate-limited ( 8/batch)")
      drain(Map.empty, "unlimited    (1 batch )")
    }

    for (k <- Seq(1, 10, 100) if want("slotopt")) {
      val cat = s"gslotopt$k"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_scale_slotopt").toString)
      val ev = Tables.events(spark, d)
        .withColumn("__r", explode(sequence(lit(0), lit(k - 1))))
        .select(($"event_id" * k + $"__r").as("k"),
          ($"ts" + expr("make_interval(0,0,0,__r,0,0,0)")).as("ts"),
          round($"value" * 100).cast("long").as("cents"))
      ev.createOrReplaceTempView(s"slotopt_src_$k")
      spark.sql(s"""CREATE TABLE $cat.t (k BIGINT NOT NULL, ts TIMESTAMP,
        cents BIGINT) USING graft PARTITIONED BY (days(ts))
        TBLPROPERTIES ('merge_key'='k', 'buckets'='8')""")
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM slotopt_src_$k")
      val dir = s"${spark.conf.get(s"spark.sql.catalog.$cat.warehouse")}/t"
      val G = graft.sources.GraftStore
      val (d0, days) = {
        val r = spark.sql(s"SELECT CAST(MIN(ts) AS DATE), " +
          s"COUNT(DISTINCT CAST(ts AS DATE)) FROM $cat.t").head()
        (r.getDate(0).toLocalDate, r.getLong(1))
      }
      // fragment ONE day with 6 fixed-size appends
      (0 until 6).foreach { i =>
        spark.sql(s"INSERT INTO $cat.t SELECT -1000000 - ${i * 5000} - id, " +
          s"timestamp'$d0 0$i:30:00', id FROM range(0, 5000)")
      }
      val preOwners = G.ownersOf(dir, G.currentVersion(dir))
      val cold = preOwners.keySet.filterNot(_.startsWith(s"gpart=${d0.toEpochDay}/"))
      val n = spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0)
      time(f"slotopt x$k%3d ($n%9d rows, $days%4d days) hot-day optimize") {
        spark.sql(s"CALL $cat.optimize(table => 't', max_files_per_bucket => 2)")
      }
      val owners = G.ownersOf(dir, G.currentVersion(dir))
      val coldUntouched = cold.forall(s => owners.get(s) == preOwners.get(s))
      println(s"[scale] slotopt x$k cold slots untouched: $coldUntouched " +
        s"(${cold.size} cold slots)")
    }
    // materialized-view refresh at scale — the S39 claim: an incremental
    // refresh costs ∝ changes + |view|, never ∝ |table|. A FIXED 5k-row
    // slice lands on a table grown ×1/×10/×100 with a FIXED 1000-group
    // view: the refresh must stay ~flat while the full-recompute contrast
    // (what a view WITHOUT incremental maintenance pays) grows with the
    // table. The CREATE (initial materialization) is timed separately —
    // it IS a full recompute by definition.
    for (k <- Seq(1, 10, 100) if want("mv")) {
      val cat = s"gmvs$k"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_scale_mv").toString)
      val ev = replicate(Tables.events(spark, d), k, Seq("event_id", "user_id"))
      val state = ev.groupBy($"event_id".as("k"))
        .agg(max(round($"value" * 100).cast("long")).as("cents"))
        .withColumn("grp", pmod($"k", lit(1000L))).cache()
      val n = state.count()
      state.createOrReplaceTempView(s"mv_src_$k")
      spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, cents BIGINT, " +
        "grp BIGINT) USING graft TBLPROPERTIES ('merge_key'='k', 'buckets'='64')")
      spark.sql(s"INSERT INTO $cat.t SELECT k, cents, grp FROM mv_src_$k")
      time(f"mv x$k%3d ($n%9d rows) CREATE MATERIALIZED VIEW (initial full)") {
        spark.sql(s"CREATE MATERIALIZED VIEW $cat.mv AS SELECT grp, " +
          s"COUNT(*) AS n, SUM(cents) AS s FROM $cat.t GROUP BY grp")
      }
      // fixed-size slice: 5k fresh inserts + a narrow update
      spark.sql(s"INSERT INTO $cat.t SELECT -1 - id, id, id % 1000 " +
        "FROM range(0, 5000)")
      spark.sql(s"UPDATE $cat.t SET cents = cents + 1 WHERE k < 0 AND k % 7 = 0")
      time(f"mv x$k%3d ($n%9d rows) incremental refresh (fixed 5k slice)") {
        val mode = spark.sql(s"CALL $cat.refresh_mv(view => 'mv')")
          .head().getString(1)
        require(mode == "incremental", s"expected incremental, got $mode")
      }
      time(f"mv x$k%3d ($n%9d rows) full-recompute contrast") {
        spark.sql(s"SELECT grp, COUNT(*) AS n, SUM(cents) AS s " +
          s"FROM $cat.t GROUP BY grp").count()
      }
      state.unpersist()
    }
    // writable branches at scale — the S40 claims: create_branch is the
    // clone pass (hard links, O(current files) metadata), branch DML cost
    // matches main DML cost, and fast_forward is ∝ the BRANCH's own
    // commits (version-dir links + owner-map rewrites + pointer flip) —
    // flat as the TABLE grows ×1/×10/×100 under a fixed 3-commit branch.
    for (k <- Seq(1, 10, 100) if want("branch")) {
      val cat = s"gbr$k"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_scale_branch").toString)
      val ev = replicate(Tables.events(spark, d), k, Seq("event_id", "user_id"))
      val state = ev.groupBy($"event_id".as("k"))
        .agg(max(round($"value" * 100).cast("long")).as("cents")).cache()
      val n = state.count()
      state.createOrReplaceTempView(s"br_src_$k")
      spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, cents BIGINT) " +
        "USING graft TBLPROPERTIES ('merge_key'='k', 'buckets'='64')")
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM br_src_$k")
      time(f"branch x$k%3d ($n%9d keys) create_branch (zero-copy fork)") {
        spark.sql(s"CALL $cat.create_branch(table => 't', name => 'exp')")
      }
      time(f"branch x$k%3d ($n%9d keys) 3 branch commits (fixed size)") {
        spark.sql(s"INSERT INTO $cat.`t$$branch$$exp` " +
          "SELECT -1 - id, id FROM range(0, 5000)")
        spark.sql(s"UPDATE $cat.`t$$branch$$exp` SET cents = cents + 1 " +
          "WHERE k = 4242")
        spark.sql(s"DELETE FROM $cat.`t$$branch$$exp` WHERE k = -17")
      }
      time(f"branch x$k%3d ($n%9d keys) fast_forward publish") {
        spark.sql(s"CALL $cat.fast_forward(table => 't', name => 'exp')")
      }
      time(f"branch x$k%3d ($n%9d keys) post-publish point lookup") {
        spark.sql(s"SELECT * FROM $cat.t WHERE k = 4242").count()
      }
      state.unpersist()
    }
    // star-join MV maintenance at scale — the S39b claim: an incremental
    // refresh of fact⋈dim costs ∝ fact-changes ⋈ dim + |view|, never
    // ∝ |fact|. FIXED 1k-row dim and FIXED 5k-row fact slice against a
    // fact grown ×1/×10/×100: the fold must stay ~flat while the
    // recompute contrast (a dim commit's poison lane) grows with the
    // fact.
    for (k <- Seq(1, 10, 100) if want("mvjoin")) {
      val cat = s"gmvj$k"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_scale_mvjoin").toString)
      val ev = replicate(Tables.events(spark, d), k, Seq("event_id", "user_id"))
      val fact = ev.groupBy($"event_id".as("k"))
        .agg(max(round($"value" * 100).cast("long")).as("cents"))
        .withColumn("dk", pmod($"k", lit(1000L))).cache()
      val n = fact.count()
      fact.createOrReplaceTempView(s"mvj_src_$k")
      spark.sql(s"CREATE TABLE $cat.f (k BIGINT NOT NULL, cents BIGINT, " +
        "dk BIGINT) USING graft TBLPROPERTIES ('merge_key'='k', 'buckets'='64')")
      spark.sql(s"CREATE TABLE $cat.dim (dk BIGINT NOT NULL, grp BIGINT, " +
        "w BIGINT) USING graft TBLPROPERTIES ('merge_key'='dk', 'buckets'='4')")
      spark.sql(s"INSERT INTO $cat.f SELECT k, cents, dk FROM mvj_src_$k")
      spark.sql(s"INSERT INTO $cat.dim SELECT id, id % 37, id % 11 + 1 " +
        "FROM range(0, 1000)")
      time(f"mvjoin x$k%3d ($n%9d fact rows) CREATE (initial full)") {
        spark.sql(s"CREATE MATERIALIZED VIEW $cat.mv AS SELECT d.grp AS g, " +
          s"COUNT(*) AS n, SUM(f.cents * d.w) AS s FROM $cat.f f " +
          s"JOIN $cat.dim d ON f.dk = d.dk GROUP BY d.grp")
      }
      spark.sql(s"INSERT INTO $cat.f SELECT -1 - id, id, id % 1000 " +
        "FROM range(0, 5000)")
      spark.sql(s"UPDATE $cat.f SET cents = cents + 1 WHERE k < 0 AND k % 7 = 0")
      time(f"mvjoin x$k%3d ($n%9d fact rows) incremental fold (5k slice)") {
        val mode = spark.sql(s"CALL $cat.refresh_mv(view => 'mv')")
          .head().getString(1)
        require(mode == "incremental", s"expected incremental, got $mode")
      }
      spark.sql(s"UPDATE $cat.dim SET w = w + 1 WHERE dk = 3")
      time(f"mvjoin x$k%3d ($n%9d fact rows) dim-poison recompute contrast") {
        val mode = spark.sql(s"CALL $cat.refresh_mv(view => 'mv')")
          .head().getString(1)
        require(mode == "full", s"expected full, got $mode")
      }
      fact.unpersist()
    }
    // branch rebase at scale — the S40b claim: rebase costs the zero-copy
    // clone of main (hard links, O(files)) + key-overlap detection and
    // replay ∝ BOTH SIDES' CHANGES — never a data rewrite of either
    // history. Fixed 2-commit branch, fixed 1-commit main divergence,
    // table grown ×1/×10/×100: the rebase must track the clone's link
    // pass (O(file count)), not the data volume.
    for (k <- Seq(1, 10, 100) if want("rebase")) {
      val cat = s"grbs$k"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_scale_rebase").toString)
      val ev = replicate(Tables.events(spark, d), k, Seq("event_id", "user_id"))
      val state = ev.groupBy($"event_id".as("k"))
        .agg(max(round($"value" * 100).cast("long")).as("cents")).cache()
      val n = state.count()
      state.createOrReplaceTempView(s"rbs_src_$k")
      spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, cents BIGINT) " +
        "USING graft TBLPROPERTIES ('merge_key'='k', 'buckets'='64')")
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM rbs_src_$k")
      spark.sql(s"CALL $cat.create_branch(table => 't', name => 'exp')")
      spark.sql(s"INSERT INTO $cat.`t$$branch$$exp` " +
        "SELECT -1 - id, id FROM range(0, 5000)")
      spark.sql(s"UPDATE $cat.`t$$branch$$exp` SET cents = cents + 1 " +
        "WHERE k = -42")
      spark.sql(s"INSERT INTO $cat.t SELECT -1000000 - id, id FROM range(0, 5000)")
      time(f"rebase x$k%3d ($n%9d keys) rebase_branch (2 replayed commits)") {
        spark.sql(s"CALL $cat.rebase_branch(table => 't', name => 'exp')")
      }
      time(f"rebase x$k%3d ($n%9d keys) fast_forward after rebase") {
        spark.sql(s"CALL $cat.fast_forward(table => 't', name => 'exp')")
      }
      state.unpersist()
    }
    // merge-on-read vs copy-on-write on the documented worst case: a
    // FIXED 5k-key change batch whose keys spread across every bucket.
    // CoW must grow with the table (rewrites all 64 buckets); MoR must
    // stay ~flat (after-images + one delete slice, O(changed rows)). Also
    // measured: the read-side tax while slices are live, and OPTIMIZE
    // folding them away.
    for (k <- Seq(1, 10, 100) if want("mor")) {
      val cat = s"gmor$k"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft_scale_mor").toString)
      val ev = replicate(Tables.events(spark, d), k, Seq("event_id", "user_id"))
      // a ~256 B payload per row gives the copy-on-write rewrite real
      // bytes to move — without it the whole 1M-key table is ~8 MB and
      // every commit is overhead-bound, hiding the shape under test
      val state = ev.groupBy($"event_id".as("k"))
        .agg(max(round($"value" * 100).cast("long")).as("cents"))
        .withColumn("pay", lpad(conv($"k" * 2654435761L, 10, 16), 256, "x"))
        .cache()
      val n = state.count()
      state.createOrReplaceTempView(s"mor_src_$k")
      spark.sql(s"SELECT k, cents + 1 AS cents FROM mor_src_$k " +
        "ORDER BY k LIMIT 5000").cache()
        .createOrReplaceTempView(s"mor_chg_$k")
      spark.sql(s"SELECT COUNT(*) FROM mor_chg_$k").head() // materialize
      for (mode <- Seq("cow", "mor")) {
        spark.sql(s"CREATE TABLE $cat.t_$mode (k BIGINT NOT NULL, " +
          "cents BIGINT, pay STRING) USING graft TBLPROPERTIES " +
          s"('merge_key'='k', 'buckets'='64', 'merge_mode'='$mode')")
        spark.sql(s"INSERT INTO $cat.t_$mode SELECT * FROM mor_src_$k")
        time(f"mor x$k%3d ($n%9d keys) MERGE 5k spread updates ($mode)") {
          spark.sql(s"MERGE INTO $cat.t_$mode x USING mor_chg_$k s " +
            "ON x.k = s.k WHEN MATCHED THEN UPDATE SET cents = s.cents")
        }
        time(f"mor x$k%3d ($n%9d keys) full scan after merge ($mode)") {
          spark.sql(s"SELECT COUNT(*), SUM(cents) FROM $cat.t_$mode").head()
        }
        time(f"mor x$k%3d ($n%9d keys) point lookup after merge ($mode)") {
          spark.sql(s"SELECT * FROM $cat.t_$mode WHERE k = 4242").count()
        }
      }
      time(f"mor x$k%3d ($n%9d keys) OPTIMIZE folds the delete slices") {
        spark.sql(s"CALL $cat.optimize(table => 't_mor')")
      }
      time(f"mor x$k%3d ($n%9d keys) full scan after optimize (mor)") {
        spark.sql(s"SELECT COUNT(*), SUM(cents) FROM $cat.t_mor").head()
      }
      state.unpersist()
    }
    for (k <- Seq(1, 4, 16) if want("lineitem")) {
      val li = replicate(Tables.lineitem(spark, d), k, Seq("l_orderkey")).cache()
      val n = li.count()
      time(f"lineitem x$k%2d ($n%9d rows) q1-style aggregate") {
        li.groupBy($"l_returnflag", $"l_linestatus")
          .agg(sum($"l_quantity"), count(lit(1))).count()
      }
      // the j10 shape: keyed as-of match against a 3-version SCD2 dim
      time(f"lineitem x$k%2d ($n%9d rows) j10-style SCD2 as-of join") {
        val dim = Tables.supplier(spark, d)
          .select($"s_suppkey".as("l_suppkey"),
            explode(array(lit(0), lit(1), lit(2))).as("v"))
          .select($"l_suppkey", $"v",
            to_timestamp(concat(lit(1995) + $"v" * 2, lit("-01-01 00:00:00"))).as("eff"))
        graft.Graft.asofJoinLatest(
          li.select($"l_suppkey", $"l_shipdate", $"l_quantity"),
          "l_shipdate", "l_quantity", dim, "eff", "v", "l_suppkey", "v")
          .groupBy($"l_suppkey", $"v").count().count()
      }
      li.unpersist()
    }
    // the g3/g4 shapes: co-occurrence graph build + degree-oriented
    // triangle closure + large-star/small-star CC. Replicating lineitem
    // re-salts l_orderkey (baskets multiply, basket SIZE stays bounded) —
    // edges grow linearly, wedges ~linearly, so a superlinear timing here
    // would flag a plan regression, not data shape.
    for (k <- Seq(1, 4, 16) if want("graph")) {
      val li = replicate(
        Tables.lineitem(spark, d).select($"l_orderkey", $"l_partkey"),
        k, Seq("l_orderkey")).cache()
      val n = li.count()
      val e = operators.GraphQueries.coOccurrencePairs(li).select($"u", $"v")
      time(f"lineitem x$k%2d ($n%9d rows) g4-style edge build + triangle closure") {
        val ec = e.localCheckpoint(true)
        val deg = ec.select($"u".as("nd")).union(ec.select($"v".as("nd")))
          .groupBy($"nd").agg(count(lit(1)).as("deg"))
        val ew = ec
          .join(deg.select($"nd".as("u"), $"deg".as("du")), "u")
          .join(deg.select($"nd".as("v"), $"deg".as("dv")), "v")
        val c = $"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v")
        val o = ew.select(
          when(c, $"u").otherwise($"v").as("src"),
          when(c, $"v").otherwise($"u").as("dst"),
          when(c, $"dv").otherwise($"du").as("ddst")).localCheckpoint(true)
        val wedges = o.as("x").join(broadcast(o.as("y")),
            $"x.src" === $"y.src" &&
            ($"x.ddst" < $"y.ddst" || ($"x.ddst" === $"y.ddst" && $"x.dst" < $"y.dst")))
          .select($"x.dst".as("b"), $"y.dst".as("c"))
        wedges.join(broadcast(o.select((shiftleft($"src", 31) + $"dst").as("bc"))),
          (shiftleft($"b", 31) + $"c") === $"bc").count()
      }
      time(f"lineitem x$k%2d ($n%9d rows) g3-style large/small-star CC (thresholded)") {
        val et = operators.GraphQueries.coOccurrencePairs(li)
          .filter($"n_orders" >= 2).select($"u", $"v")
        val (labels, converged) = operators.GraphQueries.ccLargeSmallStar(et)
        require(converged); labels.count()
      }
      li.unpersist()
    }
    // DML-store cost model (S11/S14): the claims under test are (a) an
    // INSERT append costs ∝ NEW data, flat in table size (fast path: no
    // base read, links + new files); (b) a merge whose keys localize to
    // one bucket costs ∝ table/buckets; (c) a merge whose keys spread
    // across all buckets is the documented worst case, ∝ table (every
    // bucket rewritten). Fixed change-batch size, base scaled ×1/×10.
    for (k <- Seq(1, 10) if want("store")) {
      import graft.sources.{GraftStore, GraftTableMeta}
      import org.apache.spark.sql.types._
      val buckets = 64
      val dir = java.nio.file.Files.createTempDirectory(s"graft_scale_store_x$k")
        .toString + "/t"
      val schema = StructType(Seq(
        StructField("user_id", LongType, nullable = false),
        StructField("cents", LongType, nullable = true)))
      GraftStore.create(dir, GraftTableMeta(schema, Seq("user_id"), buckets))
      val base = replicate(
        Tables.events(spark, d).select($"event_id".as("user_id"),
          round($"value" * 100).cast("long").as("cents")),
        k, Seq("user_id")).cache()
      val n = base.count()
      time(f"store  x$k%2d ($n%9d keys, $buckets buckets) initial INSERT") {
        GraftStore.applyChanges(spark, dir,
          base.withColumn(GraftStore.OpCol, lit("I")), allInserts = true)
      }
      val batch = base.limit(5000).select($"user_id", ($"cents" + 1).as("cents"))
        .cache(); batch.count()
      time(f"store  x$k%2d ($n%9d keys) append 5k rows (flat expected)") {
        GraftStore.applyChanges(spark, dir,
          batch.withColumn(GraftStore.OpCol, lit("I")), allInserts = true)
      }
      val oneBucket = base
        .filter(GraftStore.bucketExpr(Seq("user_id"), buckets) === 0)
        .limit(5000).select($"user_id", ($"cents" + 2).as("cents"))
        .cache(); oneBucket.count()
      time(f"store  x$k%2d ($n%9d keys) merge 5k single-bucket updates (∝ table/$buckets)") {
        GraftStore.applyChanges(spark, dir,
          oneBucket.withColumn(GraftStore.OpCol, lit("U")))
      }
      time(f"store  x$k%2d ($n%9d keys) merge 5k spread updates (worst case, ∝ table)") {
        GraftStore.applyChanges(spark, dir,
          batch.withColumn(GraftStore.OpCol, lit("U")))
      }
      base.unpersist(); batch.unpersist(); oneBucket.unpersist()
      GraftStore.dropTable(dir)
    }
    // storage-partitioned join vs shuffle join on two co-bucketed store
    // tables — the claim under test: SPJ removes both Exchanges, so the
    // gap over the shuffle plan grows with data volume
    for (k <- Seq(1, 10, 40) if want("spj")) {
      val wh = java.nio.file.Files.createTempDirectory(s"graft_scale_spj_x$k").toString
      spark.conf.set("spark.sql.catalog.graftprobe",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graftprobe.warehouse", wh)
      val base = replicate(
        Tables.events(spark, d).select($"event_id".as("user_id"),
          round($"value" * 100).cast("long").as("cents")),
        k, Seq("user_id")).cache()
      val n = base.count()
      base.createOrReplaceTempView("spj_probe_src")
      Seq("a", "b").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS graftprobe.$t")
        spark.sql(s"""CREATE TABLE graftprobe.$t
          (user_id BIGINT NOT NULL, cents BIGINT) USING graft
          TBLPROPERTIES ('merge_key'='user_id', 'buckets'='64')""")
        spark.sql(s"INSERT INTO graftprobe.$t SELECT * FROM spj_probe_src")
        spark.sql(s"CALL graftprobe.optimize(table => '$t', max_files_per_bucket => 0)")
      }
      val q = """SELECT SUM(a.cents + b.cents) FROM graftprobe.a a
                 JOIN graftprobe.b b ON a.user_id = b.user_id"""
      val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.graft.store.spj", "spark.sql.sources.v2.bucketing.enabled")
        .map(c => c -> spark.conf.getOption(c)).toMap
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql(q).count() // warm codegen/JIT before timing either plan
      time(f"spj    x$k%2d ($n%9d keys/side) shuffle join (SPJ off)") {
        spark.sql(q).count()
      }
      spark.conf.set("spark.graft.store.spj", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.sql(q).count()
      time(f"spj    x$k%2d ($n%9d keys/side) storage-partitioned join") {
        spark.sql(q).count()
      }
      time(f"spj    x$k%2d ($n%9d keys/side) point lookup (bucket-pruned)") {
        spark.sql("SELECT * FROM graftprobe.a WHERE user_id = 7").count()
      }
      saved.foreach { case (c, v) =>
        v.fold(spark.conf.unset(c))(spark.conf.set(c, _)) }
      base.unpersist()
      Seq("a", "b").foreach(t => spark.sql(s"DROP TABLE IF EXISTS graftprobe.$t"))
    }
    // the x24 shape: chunk-with-overlap explode (map-side only)
    for (k <- Seq(1, 5, 20) if want("documents")) {
      val docs = Tables.documents(spark, d)
        .withColumn("__r", explode(sequence(lit(0), lit(k - 1))))
        .withColumn("doc_id", $"doc_id" * k + $"__r").drop("__r").cache()
      val n = docs.count()
      time(f"documents x$k%2d ($n%7d rows) x24-style chunk explode") {
        docs.select($"doc_id", split(trim($"text"), "\\s+").as("toks"))
          .withColumn("n", size($"toks"))
          .withColumn("nc", greatest(lit(1), ceil(($"n" - lit(16)) / lit(48.0)).cast("int")))
          .select($"doc_id", posexplode(expr("transform(sequence(0, nc - 1), i -> i * 48)")))
          .count()
      }
      docs.unpersist()
    }
    for (k <- Seq(1, 5, 20) if want("documents")) {
      val docs = Tables.documents(spark, d)
        .withColumn("__r", explode(sequence(lit(0), lit(k - 1))))
        .withColumn("doc_id", $"doc_id" * k + $"__r")
        // perturb replicated text so near-dup structure doesn't explode
        .withColumn("text", concat($"text", lit(" rep"), $"__r".cast("string")))
        .drop("__r")
      docs.createOrReplaceTempView("documents_scaled")
      val n = docs.count()
      time(f"documents x$k%2d ($n%7d rows) minhash-lsh candidates") {
        val sets = docs.select($"doc_id",
          transform(split(trim($"text"), " "), t => xxhash64(t)).as("toks"))
          .select($"doc_id", array_distinct(zip_with(
            zip_with(slice($"toks", lit(1), size($"toks") - 2),
              slice($"toks", lit(2), size($"toks") - 2), (a, b) => xxhash64(a, b)),
            slice($"toks", lit(3), size($"toks") - 2),
            (ab, c) => xxhash64(ab, c))).as("sh"))
        val sig = sets.withColumn("sig",
          graft.functions.GraftFunctions.minhash_signature($"sh", 128))
        val bands = sig.select($"doc_id",
          posexplode(transform(sequence(lit(0), lit(31)),
            b => hash(slice($"sig", b * 4 + 1, lit(4)))))).toDF("doc_id", "bid", "bh")
        bands.as("x").join(bands.as("y"),
          col("x.bid") === col("y.bid") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id")).count()
      }
    }
  }
}
