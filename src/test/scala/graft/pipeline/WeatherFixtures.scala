package graft.pipeline

import java.sql.Date
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** In-memory weather fixtures mirroring the bronze schema (FIXTURES.md §A). */
object WeatherFixtures {

  final case class BronzeRow(time: String, interval: Long, temperature_2m: java.lang.Double,
                             wind_speed_10m: Double, wind_direction_10m: Long,
                             weather_code: Long, city: String, date: Date)

  def bronzeRow(city: String, date: String, hour: Int = 9,
                temp: java.lang.Double = 10.5, wind: Double = 3.2,
                dir: Long = 180L, code: Long = 2L): BronzeRow =
    BronzeRow(f"${date}T$hour%02d:30", 900L, temp, wind, dir, code, city, Date.valueOf(date))

  def bronzeDf(spark: SparkSession, rows: Seq[BronzeRow]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }

  /** Write rows as a Hive-partitioned bronze directory. */
  def writeBronze(spark: SparkSession, rows: Seq[BronzeRow], root: String): Unit =
    bronzeDf(spark, rows).write
      .partitionBy("city", "date").mode("append").parquet(root)

  /** A fake Open-Meteo response body for ingestion/bronze tests. */
  def apiJson(temp: Double, wind: Double = 3.2, dir: Long = 180, code: Long = 2,
              time: String = "2026-02-13T09:30"): String =
    s"""{"latitude":1.0,"longitude":2.0,"current":{"time":"$time","interval":900,
       |"temperature_2m":$temp,"wind_speed_10m":$wind,"wind_direction_10m":$dir,
       |"weather_code":$code}}""".stripMargin.replace("\n", "")
}
