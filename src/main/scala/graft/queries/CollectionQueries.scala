// (VariantType + unpivot additions live at the end of `all`.)
package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Arrays / maps / structs / JSON expression surfaces (SURVEY §2.2;
  * reference serde/arrays.scala 814 LoC, maps.scala, structs.scala,
  * json handlers in strings.scala/structs.scala).
  *
  * Cross-engine comparison rules:
  *  - Operations whose output order Spark defines by input order (slice,
  *    filter, flatten) compare directly; set-like ops (distinct, union,
  *    intersect, except) are sorted on both sides because DuckDB's
  *    ordering is unspecified.
  *  - DuckDB list_position returns NULL for missing → coalesce(…, 0) to
  *    match Spark's 0.
  *  - Map results are projected to sorted keys / looked-up values —
  *    engines don't agree on map physical order, scalars always compare.
  */
object CollectionQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q42_arrays",
      (s, dir) => {
        import s.implicits._
        val words = split($"text", " ")
        // Every list-typed result is stringified via array_join before the
        // final projection: the driver's pandas harness can't hash raw list
        // columns. The array functions themselves stay fully exercised.
        def j(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          array_join(c, ",")
        Tables.t(s, dir, "documents").filter($"doc_id" < 20)
          .select($"doc_id",
            size(words).cast("long").as("n"),
            j(slice(words, 1, 5)).as("first5"),
            j(array_sort(array_distinct(words))).as("uniq"),
            array_contains(words, "data").as("has_data"),
            array_position(words, "data").as("pos_data"),
            element_at(words, 3).as("third"),
            array_max(words).as("mx"),
            array_min(words).as("mn"),
            array_join(slice(words, 1, 4), "|").as("joined"),
            arrays_overlap(words, array(lit("data"), lit("zz"))).as("ovl"),
            j(array_sort(array_intersect(words, array(lit("data"), lit("table"), lit("zz"))))).as("inter"),
            j(array_sort(array_union(slice(words, 1, 3), array(lit("zz"))))).as("uni"),
            j(array_sort(array_except(array_distinct(slice(words, 1, 6)), array(lit("a"), lit("the"))))).as("exc"),
            j(array_repeat(lit("z"), 3)).as("rep3"),
            j(array_append(slice(words, 1, 2), "tail")).as("app"),
            j(flatten(array(slice(words, 1, 2), slice(words, 3, 2)))).as("flat"),
            j(filter(words, w => length(w) > 4)).as("longwords"),
            j(array_compact(array(element_at(words, 1), lit(null), element_at(words, 2)))).as("compacted"),
            j(zip_with(slice(words, 1, 3), array_repeat(lit("z"), 3),
              (x, y) => concat(x, lit(":"), y))).as("zipped"),
            j(array_remove(slice(words, 1, 6), "a")).as("removed"),
            j(expr("array_insert(slice(split(text, ' '), 1, 3), 2, 'X')")).as("inserted"),
            j(reverse(slice(words, 1, 4))).as("rev4"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
          len(string_split(text, ' ')) AS n,
          coalesce(array_to_string((string_split(text, ' '))[1:5], ','), '') AS first5,
          coalesce(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ','), '') AS uniq,
          list_contains(string_split(text, ' '), 'data') AS has_data,
          coalesce(list_position(string_split(text, ' '), 'data'), 0) AS pos_data,
          (string_split(text, ' '))[3] AS third,
          list_max(string_split(text, ' ')) AS mx,
          list_min(string_split(text, ' ')) AS mn,
          coalesce(array_to_string((string_split(text, ' '))[1:4], '|'), '') AS joined,
          list_has_any(string_split(text, ' '), ['data', 'zz']) AS ovl,
          coalesce(array_to_string(list_sort(list_intersect(string_split(text, ' '), ['data', 'table', 'zz'])), ','), '') AS inter,
          coalesce(array_to_string(list_sort(list_distinct(list_concat((string_split(text, ' '))[1:3], ['zz']))), ','), '') AS uni,
          coalesce(array_to_string(list_sort(list_filter(list_distinct((string_split(text, ' '))[1:6]),
            x -> NOT list_contains(['a', 'the'], x))), ','), '') AS exc,
          coalesce(array_to_string(['z', 'z', 'z'], ','), '') AS rep3,
          coalesce(array_to_string(list_append((string_split(text, ' '))[1:2], 'tail'), ','), '') AS app,
          coalesce(array_to_string(list_concat((string_split(text, ' '))[1:2], (string_split(text, ' '))[3:4]), ','), '') AS flat,
          coalesce(array_to_string(list_filter(string_split(text, ' '), x -> len(x) > 4), ','), '') AS longwords,
          coalesce(array_to_string(list_filter([(string_split(text, ' '))[1], NULL, (string_split(text, ' '))[2]],
            x -> x IS NOT NULL), ','), '') AS compacted,
          coalesce(array_to_string(list_transform(range(1, 4), i -> (string_split(text, ' '))[i] || ':z'), ','), '') AS zipped,
          coalesce(array_to_string(list_filter((string_split(text, ' '))[1:6], x -> x != 'a'), ','), '') AS removed,
          coalesce(array_to_string(list_concat(list_concat((string_split(text, ' '))[1:1], ['X']),
            (string_split(text, ' '))[2:3]), ','), '') AS inserted,
          coalesce(array_to_string(list_reverse((string_split(text, ' '))[1:4]), ','), '') AS rev4
        FROM documents WHERE doc_id < 20 ORDER BY doc_id"""),
      doc = "Array surface: size/slice/distinct/contains/position/element_at/max/min/join/overlap/intersect/union/except/repeat/append/flatten/filter(lambda)."),

    QueryDef(
      "q43_maps_structs_json",
      (s, dir) => {
        import s.implicits._
        val m = map(lit("t"), $"event_type", lit("u"), $"user_id".cast("string"))
        Tables.t(s, dir, "events").filter($"event_id" < 200)
          .select($"event_id",
            expr("from_json(props, 'k INT').k").as("k_typed"),
            get_json_object($"props", "$.k").as("k_str"),
            get_json_object($"props", "$.missing").as("k_missing"),
            to_json(struct($"event_id", $"event_type")).as("js"),
            struct($"event_type", $"value").getField("event_type").as("st_field"),
            array_join(array_sort(map_keys(m)), ",").as("mk"),
            array_join(map_values(m), ",").as("mv"),
            element_at(m, "t").as("mv_t"),
            element_at(map_from_arrays(array(lit("k1"), lit("k2")),
              array($"event_type", $"props")), "k2").as("mfa_k2"),
            expr("map_contains_key(map('t', event_type), 't')").as("mck"),
            element_at(expr("str_to_map('a:1,b:2', ',', ':')"), "b").as("stm_b"),
            expr("to_csv(struct(event_id, event_type))").as("csv_"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id,
          CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
          json_extract_string(props, '$.k') AS k_str,
          json_extract_string(props, '$.missing') AS k_missing,
          '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}' AS js,
          event_type AS st_field,
          coalesce(array_to_string(list_sort(['t', 'u']), ','), '') AS mk,
          coalesce(array_to_string([event_type, CAST(user_id AS VARCHAR)], ','), '') AS mv,
          event_type AS mv_t,
          props AS mfa_k2,
          TRUE AS mck,
          '2' AS stm_b,
          event_id || ',' || event_type AS csv_
        FROM events WHERE event_id < 200 ORDER BY event_id"""),
      doc = "from_json/get_json_object/to_json, struct create+getField, map create/keys/element_at/contains_key, str_to_map."),

    QueryDef(
      "q134_variant_json",
      (s, dir) => {
        import s.implicits._
        // Spark 4 VariantType: parse_json once into the binary variant
        // encoding, then typed variant_get extraction — the
        // semi-structured scan pattern that at 100 TB beats re-parsing
        // JSON text per field access (parse once, extract many). The
        // variant itself never leaves the query (not parquet-writable
        // everywhere); extracted typed columns do.
        Tables.events(s, dir)
          .withColumn("v", parse_json($"props"))
          .select($"event_id", $"event_type",
            expr("variant_get(v, '$.k', 'int')").as("k_int"),
            expr("variant_get(v, '$.missing', 'string')").as("k_missing"),
            expr("cast(is_variant_null(try_variant_get(v, '$.k')) as boolean)").as("k_is_null"))
          .filter($"event_id" < 300)
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, event_type,
          CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
          json_extract_string(props, '$.missing') AS k_missing,
          FALSE AS k_is_null
        FROM events WHERE event_id < 300 ORDER BY event_id"""),
      doc = "Spark 4 VariantType: parse_json into the binary variant encoding, typed variant_get / try_variant_get extraction — parse-once-extract-many semi-structured access."),

    QueryDef(
      "q135_unpivot",
      (s, dir) => {
        import s.implicits._
        // unpivot/melt (the Expand family's inverse of q86's PIVOT):
        // wide part attributes to (key, attr, val) long form — the
        // normalize-before-union shape feature stores use. Values cast
        // to a common double type as unpivot requires.
        Tables.t(s, dir, "part")
          .filter($"p_partkey" < 500)
          .select($"p_partkey",
            $"p_size".cast("double").as("size"),
            $"p_retailprice".as("retailprice"))
          .unpivot(
            Array($"p_partkey"),
            Array($"size", $"retailprice"),
            "attr", "val")
          .orderBy($"p_partkey", $"attr")
      },
      Some("""SELECT p_partkey, attr, val FROM (
          SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
          UNION ALL
          SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part)
        WHERE p_partkey < 500 ORDER BY p_partkey, attr"""),
      doc = "unpivot/melt to long form (inverse of q86's PIVOT): per-row Expand with no shuffle; oracle as the equivalent UNION ALL.")
  )
}
