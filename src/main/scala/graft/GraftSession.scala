package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the engine's tuned defaults.
  *
  * The reference (spark_app/main.py:994-1010) enables AQE +
  * coalescePartitions + skewJoin and runs `local[4]`. We keep those
  * semantics, but size shuffle parallelism to the actual core count
  * instead of Spark's default 200 — on a real cluster this would come
  * from `spark.sql.shuffle.partitions` sized to ~2-3× total cores with
  * AQE coalescing down, which is exactly what AQE does for us here.
  */
object GraftSession {

  /** Run `body` with shuffle parallelism sized for STREAMING STATE
    * rather than batch scans: every stateful streaming operator opens
    * one state-store instance per shuffle partition (joins open four)
    * and pays a commit per instance per micro-batch, so a batch-sized
    * 32 means 32-128 store commits per trigger for streams whose state
    * fits in a handful. On a cluster this is the
    * `spark.sql.shuffle.partitions` you set on the streaming job,
    * independent of batch parallelism; here it is scoped to the query
    * and restored after. State-partition count only affects layout,
    * not results (the suite is green at 4 and 32 cores).
    */
  /** @param noDataBatch whether the terminating run keeps the final
    *   watermark-only no-data micro-batch. Measured (StreamFloorProbe,
    *   sf0.1): that batch costs 0.3–0.9 s of pure state-store
    *   open/commit for ZERO rows. Pass `false` ONLY where emissions
    *   cannot come from watermark or timer advancement — update- and
    *   complete-mode sinks, transformWithState under TimeMode.None,
    *   append-mode dedup (emits on first sight) and append-mode INNER
    *   interval joins (match-time emission): for those the batch only
    *   evicts state and the results are bit-identical without it.
    *   KEEP it (default) for append-mode left joins (null emission =
    *   state expiry), event-time timers (session close), append-mode
    *   windowed aggregation (watermark-close emission), and
    *   processing-time timeouts (the featurizer family). On a live
    *   cluster the flag flips back on for liveness; it is a
    *   terminating-run (AvailableNow) economy.
    */
  /** Default streaming state-partition count; overridable for probe
    * experiments via SPARK_GRAFT_STREAM_PARTS (callers passing an
    * explicit `n` are untouched).
    */
  private val DefaultStreamParts: Int =
    sys.env.get("SPARK_GRAFT_STREAM_PARTS").map(_.toInt).getOrElse(8)

  /** Floor for stream-stream JOIN state partitions: their measured
    * local optimum (r15 StreamFloorProbe: 8 partitions 2.9 s total, 2:
    * 1.9 s, 1 REGRESSED to 2.3 s — a join opens 4 stores per partition
    * and loses all parallelism below 2).
    */
  val MinStreamParts = 2

  /** Streamed-input bytes one state partition should own once the
    * input outgrows the floor. 8 MiB of micro-batch input per store
    * instance keeps per-partition commit cost amortized; below the
    * floor×8 MiB knee the floor binds, so at local test scale the rule
    * resolves to exactly the measured-optimal constants.
    */
  val StreamBytesPerPartition: Long = 8L << 20

  /** Probe/test hook: when set, [[adaptiveStreamParts]] returns this
    * value — lets one session interleave partition-count variants
    * (R21PartsProbe) so machine drift hits both sides of an A/B.
    * Callers passing an explicit `n` to [[withStreamingShuffle]] are
    * deliberately NOT affected.
    */
  @volatile var streamPartsOverride: Option[Int] = None

  private val streamBytes =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Input-size-ADAPTIVE streaming state-partition count (r21; the
    * optimization-round rule "derive partitioning from input size
    * rather than a constant tuned for either local mode or the
    * cluster"):
    *
    *   parts = max(floor, min(ceil(bytes / (8 MiB × storesPerPartition)),
    *                          defaultParallelism))
    *
    * The FLOOR is the measured local optimum, not a guess: the r21
    * three-point interleaved probe (R21PartsProbe, MEASUREMENT_r21)
    * read the 8-vs-4-vs-2 curve as flat within noise for most of the
    * streaming family but MONOTONICALLY WORSE below 8 for the
    * compute-per-key-heavy RocksDB queries (q_tws_top_event_type
    * 1.04/1.13/1.39 s at 8/4/2 — parallelism of per-key work, not
    * store commit count, is the binding cost), refuting the r20
    * degraded-window reading that fewer partitions win 0.3–1.0 s. So
    * locally the rule resolves to the incumbent constants at EVERY
    * core count and scale factor up to ~sf3 (the floor dominates the
    * cap too — low-core bench bases are unchanged), and the count
    * grows with the stream beyond that, capped at defaultParallelism.
    * `storesPerPartition` weights operators that open several stores
    * per partition (stream-stream joins: 4). Resolution order:
    * [[streamPartsOverride]] (in-session probe hook) >
    * SPARK_GRAFT_STREAM_PARTS (cluster-operator pin) > the size rule.
    * The table's byte size is one driver-side FS call, cached per
    * path. Results are unaffected — state-partition count only
    * changes layout (every streaming query is oracle-gated).
    */
  def adaptiveStreamParts(spark: SparkSession, sfDir: String,
      table: String = "events", storesPerPartition: Int = 1,
      floor: Int = -1): Int =
    streamPartsOverride.getOrElse {
      sys.env.get("SPARK_GRAFT_STREAM_PARTS").map(_.toInt).getOrElse {
        val path = s"$sfDir/$table.parquet"
        val bytes: Long = streamBytes.computeIfAbsent(path, { p =>
          try {
            val hp = new org.apache.hadoop.fs.Path(p)
            val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
          } catch { case _: Exception => 0L }
        })
        val raw = math.ceil(
          bytes.toDouble / (StreamBytesPerPartition.toDouble * storesPerPartition)).toInt
        val f = if (floor > 0) floor else DefaultStreamParts
        math.max(f, math.min(raw, spark.sparkContext.defaultParallelism))
      }
    }

  def withStreamingShuffle[A](spark: SparkSession, n: Int = -1,
      noDataBatch: Boolean = true)(body: => A): A = {
    val parts = if (n > 0) n else DefaultStreamParts
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      if (noDataBatch) body
      else withConf(spark,
        "spark.sql.streaming.noDataMicroBatches.enabled", "false")(body)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Scope one session conf to `body`, restoring the prior value —
    * the generic shape of [[withStreamingShuffle]] for per-query
    * streaming knobs.
    */
  def withConf[A](spark: SparkSession, key: String, value: String)(body: => A): A = {
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prior match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
  // Per-session registry of memory-sink view names handed out by
  // [[newSinkName]] — weak keys so a stopped session can never alias a
  // later one (the StageViews lifecycle).
  private val sinkNames =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Set[String]]()

  /** Unique memory-sink view name for a streaming catalog query, and
    * the ONLY way the engine mints one: the name is registered against
    * `spark` so [[dropStreamSinks]] drains exactly the sinks this
    * session created. (r15 ADVICE: cleanup previously pattern-matched
    * catalog names against `.*_\d{10,}` — a future fixed-name temp
    * view ending in 10+ digits would have been silently dropped
    * mid-session, and a sink deviating from the `<prefix>_<nanoTime>`
    * spelling silently leaked, with nothing tying the convention to
    * the regex. An explicit registry has neither failure mode.)
    */
  def newSinkName(spark: SparkSession, prefix: String): String = {
    val n = s"${prefix}_${System.nanoTime()}"
    sinkNames.synchronized {
      var s = sinkNames.get(spark)
      if (s == null) { s = scala.collection.mutable.Set.empty; sinkNames.put(spark, s) }
      s += n
    }
    n
  }

  /** Drop the memory-sink tables streaming catalog queries leave
    * behind: each terminating run registers a temp view over a
    * MemorySink whose rows live in DRIVER heap until the view is
    * dropped, and no catalog query can drop its own — the returned
    * DataFrame reads from it. A 198-query sweep otherwise accumulates
    * every streaming query's full emission set (at sf1 the MG stream
    * alone emits millions of rows) and the mounting heap pressure
    * inflates every query that runs after it — the uniform
    * sweep-vs-iso inflation SF1_r14 recorded. Harness loops (Bench,
    * Sf1Probe, Verify) call this AFTER consuming a query's result; it
    * drops exactly the names [[newSinkName]] registered for this
    * session (a name whose view was already dropped is a no-op).
    */
  def dropStreamSinks(spark: SparkSession): Unit = {
    val mine = sinkNames.synchronized {
      val s = sinkNames.get(spark)
      if (s == null) Seq.empty[String]
      else { val out = s.toSeq; s.clear(); out }
    }
    mine.foreach(spark.catalog.dropTempView(_))
  }

  def getOrCreate(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Schemas are fixed by the generator; we read them as-is so Catalyst
  * can push projection/predicates into the parquet scan. At cluster
  * scale the same calls read a partitioned table — nothing here
  * assumes single-file layout.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** File-STREAM source for table `name` under `sfDir`, correct for
    * both physical layouts a parquet table can have:
    *  - a directory table (`<name>.parquet/part-*.parquet`, what
    *    `df.write.parquet` produces — the Sf1Probe replicas, any real
    *    dataset) streams as its own directory;
    *  - a single-file table (driver testdata) streams the PARENT dir
    *    with a glob filter, because FileStreamSource rejects a bare
    *    file path ("basePath must be a directory").
    * An alternation glob matching both the directory and its children
    * is NOT equivalent: on a directory table it lists every file TWICE
    * (caught at sf1: stream counts exactly 2× batch). The layout check
    * is one driver-side Hadoop-FS `getFileStatus` call at plan time —
    * the Hadoop API (not `java.io.File`, which answers false for any
    * non-local URI) so the same branch is taken on hdfs:// or s3://
    * paths, where a false answer would silently stream zero files.
    */
  def streamTable(spark: SparkSession, sfDir: String, name: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val reader = spark.readStream.schema(schema)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val isDir = fs.exists(hPath) && fs.getFileStatus(hPath).isDirectory
    if (isDir) reader.parquet(path)
    else reader.option("pathGlobFilter", s"$name.parquet").parquet(sfDir)
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  /** Engine-wide contract: `events.ts` is epoch-NANOS BIGINT.
    *
    * The generator has shipped the column under two physical
    * encodings across testdata refreshes: TIMESTAMP(NANOS), which
    * Spark 4 reads as a nanos BIGINT under the legacy flag, and
    * TIMESTAMP(MICROS), which reads as TIMESTAMP_NTZ. Both normalize
    * HERE — no consumer ever sees the physical encoding. (The
    * micros case must be an explicit conversion: declaring LongType
    * over an INT64-micros file does not error, it silently yields
    * micros-as-long — a 1000× time-scale corruption.)
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(apply(spark, sfDir, "events"))
  }

  /** ts → epoch-nanos BIGINT whatever the read type. The NTZ→TZ cast
    * interprets the wall-clock in the session time zone, which every
    * session in this engine pins to UTC — the same instant the
    * generator wrote. That pin is now ENFORCED, not assumed (r11
    * ADVICE): a caller session on any other zone would not fail — it
    * would silently shift every event timestamp by the zone offset —
    * so the conversion refuses to run outside UTC.
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts NTZ→epoch conversion requires a UTC session time zone " +
            s"(got '$tz'); a non-UTC zone would silently shift every timestamp")
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) * 1000 AS BIGINT)"))
    }

  /** File-STREAM source for events under the same ts contract: the
    * declared schema is probed from the batch read (so it matches the
    * file's actual encoding — never LongType-over-micros), and the
    * nanos normalization is applied on the streaming DataFrame.
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = apply(spark, sfDir, "events").schema
    normalizeTs(streamTable(spark, sfDir, "events", fileSchema))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
