package graft

import graft.ingest.{CopySink, CopyTarget}
import org.scalatest.funsuite.AnyFunSuite

/** JVM-static recorder standing in for the reference test's PDO mock
  * (/root/reference/tests/ParquetImporterTest.php:19-28): copyInto runs
  * the factory inside executor tasks, which share this JVM in local mode.
  */
object RecordingCopyTarget {
  final case class Call(table: String, columns: Seq[String], lines: Seq[String],
      delimiter: String, nullAs: String)
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[Call]
  def reset(): Unit = calls.clear()

  class Recorder extends CopyTarget {
    override def copyIn(table: String, columns: Seq[String], lines: Seq[String],
        delimiter: String, nullAs: String): Long = {
      calls.add(Call(table, columns, lines, delimiter, nullAs))
      lines.size.toLong
    }
  }
}

/** Golden-value parity with the reference's COPY protocol tests
  * (/root/reference/tests/ParquetImporterTest.php:11-49 pins the exact
  * lines/delimiter/nullAs/columns handed to COPY;
  * /root/reference/src/ParquetImporter.php:151-179 defines the codec).
  */
class CopySinkSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("copy lines match the reference fixture exactly (1\\talice, 2\\tbob)") {
    val df = Seq((1, "alice"), (2, "bob")).toDF("id", "name")
    val got = CopySink.lines(df).as[String].collect().toSeq.sorted
    assert(got == Seq("1\talice", "2\tbob"))
  }

  test("codec: NULL -> \\N, bool -> 1/0, escapes backslash-first, ts + JSON") {
    val ts = java.sql.Timestamp.valueOf("2023-01-02 03:04:05.000000")
    val df = Seq(
      (Option.empty[String], true, "a\tb\nc\rd\\e", Some(ts), Some(("bar", 2))),
      (Some("plain"), false, "x", None, None))
      .toDF("s", "b", "esc", "ts", "obj")
    val got = CopySink.lines(df).as[String].collect().toSeq.sorted
    // reference codec: null -> \N (:154), bool -> 1/0 (:158), escape \ first
    // then \t \r \n (:166-169), ts 'Y-m-d H:i:s.uP' (:161), nested JSON (:163)
    assert(got == Seq(
      "\\N\t1\ta\\tb\\nc\\rd\\\\e\t2023-01-02 03:04:05.000000+00:00\t{\"_1\":\"bar\",\"_2\":2}",
      "plain\t0\tx\t\\N\t\\N"))
  }

  test("copyInto hands batched lines, columns, tab delimiter and \\N to the target") {
    RecordingCopyTarget.reset()
    val df = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"))
      .toDF("id", "name").coalesce(1)
    CopySink.copyInto(df, "public.users", () => new RecordingCopyTarget.Recorder, batchSize = 2)
    val calls = RecordingCopyTarget.calls.toArray(Array.empty[RecordingCopyTarget.Call])
    // reference flush cadence: one COPY per batchSize rows (ParquetImporter.php:62-69)
    assert(calls.map(_.lines.size).sorted.toSeq == Seq(1, 2, 2))
    assert(calls.forall(_.table == "public.users"))
    assert(calls.forall(_.columns == Seq("id", "name")))
    assert(calls.forall(_.delimiter == "\t"))
    assert(calls.forall(_.nullAs == "\\N"))
    assert(calls.flatMap(_.lines).sorted.toSeq ==
      Seq("1\ta", "2\tb", "3\tc", "4\td", "5\te"))
  }

  test("copyInto surfaces failures as 'COPY command failed' (reference :117-119)") {
    val df = Seq((1, "a")).toDF("id", "name")
    val boom = () => new CopyTarget {
      override def copyIn(table: String, columns: Seq[String], lines: Seq[String],
          delimiter: String, nullAs: String): Long =
        throw new RuntimeException("boom")
    }
    val e = intercept[org.apache.spark.SparkException] {
      CopySink.copyInto(df, "users", boom)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("COPY command failed: boom"), msgs)
  }

  test("copyInto rejects unsafe identifiers before any work") {
    val df = Seq((1, "a")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      CopySink.copyInto(df, "users;drop", () => new RecordingCopyTarget.Recorder)
    }
  }

  test("writeCopyFiles emits streamable COPY text parts (importParquet copyDir)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_copy").toString
    val res = graft.ingest.Importer.importParquet(
      spark, s"${TestSpark.sf}/region.parquet", "region_copy",
      truncate = true, copyDir = Some(tmp))
    assert(res.rowsImported == 5)
    val lines = spark.read.text(s"$tmp/region_copy").as[String].collect()
    assert(lines.length == 5)
    val nCols = spark.read.parquet(s"${TestSpark.sf}/region.parquet").columns.length
    assert(lines.forall(_.count(_ == '\t') == nCols - 1))
  }
}
