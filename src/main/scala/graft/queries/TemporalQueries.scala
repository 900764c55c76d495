package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Temporal expression surface (SURVEY §2.2 "Temporal", 27 functions;
  * reference serde/datetime.scala:83-679): date parts, time parts,
  * date arithmetic, unix-epoch conversions, formatting.
  *
  * Oracle-compat notes (verified against DuckDB):
  *  - Spark dayofweek is 1=Sunday..7; DuckDB dayofweek is 0=Sunday..6 → +1.
  *  - Spark weekday is 0=Monday..6; DuckDB isodow is 1=Monday..7 → -1.
  *  - DuckDB date-part functions return BIGINT; Spark returns INT → the
  *    Spark side casts to long so parquet types line up.
  *  - DuckDB epoch() returns DOUBLE with fractional seconds; Spark
  *    unix_timestamp floors → floor() before the BIGINT cast.
  *  - These are per-row scalar expressions: at 100 TB they run inside
  *    whole-stage codegen with zero shuffle; the only shuffle below is the
  *    final ORDER BY of an already-filtered small result.
  */
object TemporalQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q25_date_parts",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders").filter($"o_orderkey" < 200)
          .select($"o_orderkey",
            year($"o_orderdate").cast("long").as("y"),
            month($"o_orderdate").cast("long").as("mo"),
            dayofmonth($"o_orderdate").cast("long").as("dom"),
            dayofweek($"o_orderdate").cast("long").as("dow"),
            weekday($"o_orderdate").cast("long").as("wd"),
            dayofyear($"o_orderdate").cast("long").as("doy"),
            weekofyear($"o_orderdate").cast("long").as("woy"),
            quarter($"o_orderdate").cast("long").as("q"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
          year(o_orderdate) AS y, month(o_orderdate) AS mo,
          dayofmonth(o_orderdate) AS dom,
          dayofweek(o_orderdate) + 1 AS dow,
          isodow(o_orderdate) - 1 AS wd,
          dayofyear(o_orderdate) AS doy,
          weekofyear(o_orderdate) AS woy,
          quarter(o_orderdate) AS q
        FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"""),
      doc = "Date-part extraction: year/month/dayofmonth/dayofweek/weekday/dayofyear/weekofyear/quarter."),

    QueryDef(
      "q26_time_parts",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "events").filter($"event_id" < 300)
          .select($"event_id",
            hour($"ts").cast("long").as("h"),
            minute($"ts").cast("long").as("mi"),
            second($"ts").cast("long").as("sec"),
            date_trunc("hour", $"ts").as("trunc_hour"),
            date_trunc("day", $"ts").as("trunc_day"),
            unix_timestamp($"ts").as("epoch_sec"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id,
          hour(ts) AS h, minute(ts) AS mi, second(ts) AS sec,
          CAST(date_trunc('hour', ts) AS TIMESTAMP) AS trunc_hour,
          CAST(date_trunc('day', ts) AS TIMESTAMP) AS trunc_day,
          CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec
        FROM events WHERE event_id < 300 ORDER BY event_id"""),
      doc = "Time-part extraction + date_trunc + unix_timestamp over the events stream table (ns→µs loader)."),

    QueryDef(
      "q27_date_arith",
      (s, dir) => {
        import s.implicits._
        val d = to_date($"o_orderdate")
        Tables.t(s, dir, "orders").filter($"o_orderkey" < 200)
          .select($"o_orderkey",
            date_add(d, 30).as("plus30"),
            date_sub(d, 15).as("minus15"),
            datediff(d, lit("1995-01-01").cast("date")).cast("long").as("days_since_95"),
            last_day(d).as("eom"),
            next_day(d, "MON").as("next_mon"),
            trunc(d, "MM").as("som"),
            make_date(year(d), month(d), lit(1)).as("made"),
            add_months(d, 1).as("plus_month"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
          CAST(o_orderdate AS DATE) + 30 AS plus30,
          CAST(o_orderdate AS DATE) - 15 AS minus15,
          datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
          last_day(CAST(o_orderdate AS DATE)) AS eom,
          CAST(o_orderdate AS DATE)
            + CAST((7 + 1 - isodow(o_orderdate) - 1) % 7 + 1 AS INTEGER) AS next_mon,
          CAST(date_trunc('month', o_orderdate) AS DATE) AS som,
          make_date(year(o_orderdate), month(o_orderdate), 1) AS made,
          CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS plus_month
        FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"""),
      doc = "Date arithmetic: date_add/date_sub/datediff/last_day/next_day/trunc/make_date."),

    QueryDef(
      "q28_unix_format",
      (s, dir) => {
        import s.implicits._
        val d = to_date($"o_orderdate")
        Tables.t(s, dir, "orders").filter($"o_orderkey" < 200)
          .select($"o_orderkey",
            unix_date(d).cast("long").as("ud"),
            date_from_unix_date(unix_date(d) + 10).as("ud_plus10"),
            timestamp_seconds(unix_timestamp($"o_orderdate") + 3600).as("plus_1h"),
            date_format($"o_orderdate", "yyyy-MM-dd EEE").as("fmt"),
            from_unixtime(unix_timestamp($"o_orderdate")).as("fut"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
          datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS ud,
          DATE '1970-01-01'
            + CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 10 AS INTEGER) AS ud_plus10,
          make_timestamp((CAST(floor(epoch(o_orderdate)) AS BIGINT) + 3600) * 1000000) AS plus_1h,
          strftime(o_orderdate, '%Y-%m-%d %a') AS fmt,
          strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fut
        FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"""),
      doc = "Epoch conversions (unix_date/date_from_unix_date/timestamp_seconds/from_unixtime) + date_format.")
  )
}
