package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The events NTZ→epoch conversion guard (r11 ADVICE, enforced in
  * Tables.normalizeTs): when the parquet encodes `ts` as
  * TIMESTAMP_NTZ, the epoch conversion interprets the wall-clock in
  * the session time zone — correct ONLY under UTC. A non-UTC session
  * must therefore FAIL FAST instead of silently shifting every event
  * by the zone offset. This spec writes a real NTZ-encoded file and
  * pins both directions: exact nanos under UTC, refusal elsewhere.
  * (The driver testdata sometimes ships nanos-BIGINT instead, where
  * no conversion happens and the guard is rightly silent — the crafted
  * file exercises the conversion branch regardless of corpus
  * encoding.)
  */
class TimezoneGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val ntzDir: String = {
    val dir = Files.createTempDirectory("tz_guard").toString
    spark.sql(
      """SELECT TIMESTAMP_NTZ '2024-03-10 02:30:00' AS ts,
        |       CAST(1 AS BIGINT) AS event_id""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("UTC session: NTZ wall-clock converts to the exact epoch nanos") {
    val df = Tables.events(spark, ntzDir)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    val ns = df.collect().head.getLong(df.columns.indexOf("ts"))
    // 2024-03-10T02:30:00Z == 1710037800 epoch seconds
    assert(ns == 1710037800L * 1000000000L)
  }

  test("non-UTC session: the conversion refuses instead of shifting timestamps") {
    // 2024-03-10 02:30 wall-clock does not EXIST in America/New_York
    // (the spring-forward gap skips 02:00-03:00) — a silent conversion
    // there would not merely shift the instant, it would fabricate one
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalArgumentException] {
        Tables.events(spark, ntzDir).collect()
      }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    // restored: the same read works again
    assert(Tables.events(spark, ntzDir).count() == 1)
  }
}
