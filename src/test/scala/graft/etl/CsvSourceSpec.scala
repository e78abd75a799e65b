package graft.etl

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Port of CsvTripReaderServiceTests.cs:103-289 (SURVEY §5.1). */
class CsvSourceSpec extends SparkSpec {

  private def writeCsv(lines: Seq[String]): String = {
    val f = Files.createTempFile("csvsource", ".csv")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  private val fullHeader =
    "tpep_pickup_datetime,tpep_dropoff_datetime,passenger_count,trip_distance," +
      "store_and_fwd_flag,PULocationID,DOLocationID,fare_amount,tip_amount"

  test("maps columns by name, case-insensitively, regardless of order") {
    val path = writeCsv(Seq(
      "TIP_AMOUNT,TPEP_PICKUP_DATETIME,tpep_dropoff_datetime,passenger_count," +
        "trip_distance,store_and_fwd_flag,pulocationid,dolocationid,fare_amount",
      "9.99,A,B,1,2,N,3,4,5"))
    val row = CsvSource.read(spark, path).head()
    assert(row.getAs[String]("raw_tpep_pickup_datetime") == "A")
    assert(row.getAs[String]("raw_tip_amount") == "9.99")
  }

  test("duplicate header names: first occurrence wins") {
    val path = writeCsv(Seq(
      fullHeader + ",fare_amount", // second fare_amount at the end
      "A,B,1,2,N,3,4,first,1.0,second"))
    val row = CsvSource.read(spark, path).head()
    assert(row.getAs[String]("raw_fare_amount") == "first")
  }

  test("missing input file fails fast") {
    intercept[Exception](
      CsvSource.read(spark, "/tmp/definitely/does/not/exist.csv"))
  }

  test("empty input file fails fast (no header to resolve)") {
    val path = writeCsv(Seq(""))
    intercept[Exception](CsvSource.read(spark, path))
  }

  test("missing required column fails fast") {
    val path = writeCsv(Seq("tpep_pickup_datetime,foo", "x,y"))
    val e = intercept[IllegalArgumentException](CsvSource.read(spark, path))
    assert(e.getMessage.contains("tpep_dropoff_datetime"))
  }

  test("directory / multi-file input fails fast (header handling is per-file)") {
    val dir = Files.createTempDirectory("csvmulti")
    Files.writeString(dir.resolve("a.csv"), fullHeader + "\nA,B,1,2,N,3,4,5,6")
    Files.writeString(dir.resolve("b.csv"), fullHeader + "\nC,D,1,2,N,3,4,5,6")
    val e = intercept[IllegalArgumentException](
      CsvSource.read(spark, dir.toString))
    assert(e.getMessage.contains("exactly one input file"), e.getMessage)
  }

  test("custom delimiter") {
    val path = writeCsv(Seq(fullHeader.replace(",", ";"), "A;B;1;2;N;3;4;5;6"))
    val row = CsvSource.read(spark, path, delimiter = ";").head()
    assert(row.getAs[String]("raw_tpep_dropoff_datetime") == "B")
  }

  test("blank lines are skipped and do not consume a line number") {
    val path = writeCsv(Seq(fullHeader, "A,B,1,2,N,3,4,5,6", "", "   ",
      "C,D,1,2,N,3,4,5,6"))
    val rows = CsvSource.read(spark, path)
      .orderBy(CsvSource.LineNumberCol).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long](CsvSource.LineNumberCol) == 1L)
    assert(rows(1).getAs[Long](CsvSource.LineNumberCol) == 2L)
    assert(rows(1).getAs[String]("raw_tpep_pickup_datetime") == "C")
  }

  test("short rows are null-padded for missing trailing fields") {
    val path = writeCsv(Seq(fullHeader, "A,B,1"))
    val row = CsvSource.read(spark, path).head()
    assert(row.getAs[String]("raw_passenger_count") == "1")
    assert(row.getAs[String]("raw_tip_amount") == null)
  }

  test("no quote handling: quoted fields keep their quotes, embedded delimiter splits") {
    val path = writeCsv(Seq(fullHeader, "\"A\",B,1,2,N,3,4,5,6"))
    val row = CsvSource.read(spark, path).head()
    assert(row.getAs[String]("raw_tpep_pickup_datetime") == "\"A\"")
  }

  test("reads a multi-partition file with stable 1-based ordinals") {
    val many = (1 to 5000).map(i => s"P$i,D$i,1,2,N,3,4,5,6")
    val path = writeCsv(fullHeader +: many)
    val df = CsvSource.read(spark, path)
    assert(df.count() == 5000)
    val r4999 = df.filter(s"${CsvSource.LineNumberCol} = 4999").head()
    assert(r4999.getAs[String]("raw_tpep_pickup_datetime") == "P4999")
  }
}
