package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** String expression surface (SURVEY §2.2 "Strings", 31 functions;
  * reference serde/strings.scala:34-428): casing, length family, pad,
  * substring family, search/replace, pattern matching, regex.
  *
  * Oracle-compat notes (verified against DuckDB):
  *  - DuckDB has no initcap → emulated with list_transform over
  *    single-space-split words (p_name is single-space separated).
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *    replace-all default.
  *  - ascii/instr/length return BIGINT in DuckDB → Spark casts to long.
  *
  * All scalar, codegen'd, shuffle-free except the final small ORDER BY.
  */
object StringQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q29_string_case_len",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "part").filter($"p_partkey" < 200)
          .select($"p_partkey",
            lower($"p_name").as("lo"),
            upper($"p_name").as("up"),
            initcap($"p_name").as("ic"),
            length($"p_name").cast("long").as("len"),
            bit_length($"p_name").cast("long").as("bitlen"),
            octet_length($"p_name").cast("long").as("octlen"),
            ascii($"p_name").cast("long").as("asc"),
            chr(($"p_partkey" % 26) + 65).as("ch"),
            reverse($"p_name").as("rev"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
          lower(p_name) AS lo, upper(p_name) AS up,
          array_to_string(list_transform(string_split(p_name, ' '),
            x -> upper(x[1]) || lower(x[2:])), ' ') AS ic,
          length(p_name) AS len, bit_length(p_name) AS bitlen,
          strlen(p_name) AS octlen, ascii(p_name) AS asc,
          chr(CAST(p_partkey % 26 + 65 AS INTEGER)) AS ch,
          reverse(p_name) AS rev
        FROM part WHERE p_partkey < 200 ORDER BY p_partkey"""),
      doc = "Casing + length family: lower/upper/initcap/length/bit_length/octet_length/ascii/chr/reverse."),

    QueryDef(
      "q30_string_pad_sub",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "part").filter($"p_partkey" < 200)
          .select($"p_partkey",
            substring($"p_name", 3, 8).as("sub"),
            expr("left(p_name, 4)").as("l4"),
            expr("right(p_name, 4)").as("r4"),
            lpad($"p_brand", 12, "0").as("lp"),
            rpad($"p_brand", 12, "*").as("rp"),
            repeat($"p_brand", 2).as("rep"),
            concat_ws("-", $"p_brand", $"p_type").as("cw"),
            translate($"p_name", "aeiou", "AEIOU").as("tr"),
            regexp_replace($"p_name", "a", "@").as("repl_re"),
            expr("replace(p_name, 'a', '@')").as("repl"),
            instr($"p_name", "al").cast("long").as("pos"),
            concat(lit("["), expr("space(2)"), lit("]")).as("sp"),
            unhex(hex($"p_brand")).cast("string").as("hex_rt"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
          substring(p_name, 3, 8) AS sub,
          left(p_name, 4) AS l4, right(p_name, 4) AS r4,
          lpad(p_brand, 12, '0') AS lp, rpad(p_brand, 12, '*') AS rp,
          repeat(p_brand, 2) AS rep,
          concat_ws('-', p_brand, p_type) AS cw,
          translate(p_name, 'aeiou', 'AEIOU') AS tr,
          regexp_replace(p_name, 'a', '@', 'g') AS repl_re,
          replace(p_name, 'a', '@') AS repl,
          instr(p_name, 'al') AS pos,
          '[' || repeat(' ', 2) || ']' AS sp,
          decode(unhex(hex(p_brand))) AS hex_rt
        FROM part WHERE p_partkey < 200 ORDER BY p_partkey"""),
      doc = "Pad/substring/search family: substring/left/right/lpad/rpad/repeat/concat_ws/translate/replace/regexp_replace/instr."),

    QueryDef(
      "q31_string_match",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "part").filter($"p_partkey" < 500)
          .select($"p_partkey",
            $"p_name".like("%alm%").as("has_alm"),
            $"p_name".rlike("^[a-f]").as("starts_af"),
            $"p_name".contains("ol").as("has_ol"),
            $"p_name".startsWith("al").as("sw"),
            $"p_name".endsWith("d").as("ew"),
            trim(lpad($"p_brand", 12, " ")).as("trimmed"),
            ltrim(lit("  x  ")).as("lt"),
            rtrim(lit("  x  ")).as("rt"),
            size(split($"p_name", " ")).cast("long").as("n_words"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
          p_name LIKE '%alm%' AS has_alm,
          regexp_matches(p_name, '^[a-f]') AS starts_af,
          contains(p_name, 'ol') AS has_ol,
          starts_with(p_name, 'al') AS sw,
          ends_with(p_name, 'd') AS ew,
          trim(lpad(p_brand, 12, ' ')) AS trimmed,
          ltrim('  x  ') AS lt, rtrim('  x  ') AS rt,
          len(string_split(p_name, ' ')) AS n_words
        FROM part WHERE p_partkey < 500 ORDER BY p_partkey"""),
      doc = "Pattern matching + trim family: like/rlike/contains/startswith/endswith/trim/ltrim/rtrim/split+size."),

    QueryDef(
      "q80_url_functions",
      (s, dir) => {
        import s.implicits._
        // url_encode/url_decode/parse_url (reference serde/statics.scala:
        // 40-66). This DuckDB build ships no url functions, so the oracle
        // is a literal expected-value table: Spark's url_encode is
        // java.net.URLEncoder (form encoding: space→'+', '*' kept,
        // '~'→%7E, UTF-8 percent-escapes, uppercase hex), hand-verified.
        val inputs = Seq("hello world", "https://spark.apache.org",
          "a&b=c", "café", "100%", "tilde~star*").toDF("s")
        inputs.select($"s",
            expr("url_encode(s)").as("enc"),
            expr("url_decode(url_encode(s))").as("roundtrip"),
            expr("parse_url('https://spark.apache.org/docs/latest?query=sql#frag', 'HOST')").as("host"),
            expr("parse_url('https://spark.apache.org/docs/latest?query=sql#frag', 'PATH')").as("path"),
            expr("parse_url('https://spark.apache.org/docs/latest?query=sql#frag', 'QUERY', 'query')").as("qval"),
            expr("parse_url('https://spark.apache.org/docs/latest?query=sql#frag', 'REF')").as("ref"))
          .orderBy($"s")
      },
      Some("""SELECT s, enc, s AS roundtrip,
          'spark.apache.org' AS host, '/docs/latest' AS path,
          'sql' AS qval, 'frag' AS ref
        FROM (VALUES
          ('hello world', 'hello+world'),
          ('https://spark.apache.org', 'https%3A%2F%2Fspark.apache.org'),
          ('a&b=c', 'a%26b%3Dc'),
          ('café', 'caf%C3%A9'),
          ('100%', '100%25'),
          ('tilde~star*', 'tilde%7Estar*')) AS t(s, enc)
        ORDER BY s"""),
      doc = "url_encode/url_decode roundtrip + parse_url parts, against a hand-verified literal oracle (no url functions in this DuckDB build).")
  )
}
