package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Hash (reference serde/hash.scala:28-92) and bitwise
  * (serde/bitwise.scala:27-143) expression surfaces.
  *
  * md5/sha2-256 have DuckDB equivalents → full oracle. sha1, crc32,
  * murmur3 `hash` and xxhash64 are Spark-specific bit-twiddling with no
  * DuckDB counterpart → rows-only check (no oracle), still deterministic.
  * murmur3/xxhash64 matter doubly: they're the substrate for the dedup
  * and LSH operators (LlmQueries).
  */
object HashBitwiseQueries {

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q39_hash_oracle",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "part").filter($"p_partkey" < 200)
          .select($"p_partkey",
            md5($"p_name").as("h_md5"),
            sha2($"p_name", 256).as("h_sha256"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, md5(p_name) AS h_md5, sha256(p_name) AS h_sha256
        FROM part WHERE p_partkey < 200 ORDER BY p_partkey"""),
      doc = "md5 + sha2(256) — byte-identical across engines."),

    QueryDef(
      "q40_hash_spark_native",
      (s, dir) => {
        import s.implicits._
        // No DuckDB oracle: sha1/crc32/murmur3/xxhash64 are Spark-defined.
        // Self-consistency is pinned by the dual-run test suite instead.
        Tables.t(s, dir, "part").filter($"p_partkey" < 200)
          .select($"p_partkey",
            sha1($"p_name").as("h_sha1"),
            crc32($"p_name").as("h_crc32"),
            hash($"p_name", $"p_brand").as("h_murmur3"),
            xxhash64($"p_name", $"p_partkey").as("h_xx64"))
          .orderBy($"p_partkey")
      },
      Some(graft.QueryDef.golden("q40_hash_spark_native")),
      doc = "sha1/crc32/murmur3(hash)/xxhash64 — Spark-exact semantics (seed 42), the substrate for dedup/LSH; golden-snapshot oracle (no DuckDB twin for these hashes)."),

    QueryDef(
      "q41_bitwise",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem").filter($"l_orderkey" < 100)
          .select($"l_orderkey", $"l_linenumber",
            $"l_orderkey".bitwiseAND(lit(255L)).as("band"),
            $"l_orderkey".bitwiseOR(lit(4096L)).as("bor"),
            $"l_orderkey".bitwiseXOR(lit(1023L)).as("bxor"),
            bitwise_not($"l_orderkey").as("bnot"),
            shiftleft($"l_linenumber", 2).cast("long").as("shl"),
            shiftright($"l_orderkey", 1).as("shr"),
            bit_count($"l_orderkey").cast("long").as("bcnt"),
            expr("bit_get(l_orderkey, 2)").cast("long").as("bget"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
          l_orderkey & 255 AS band,
          l_orderkey | 4096 AS bor,
          xor(l_orderkey, 1023) AS bxor,
          ~l_orderkey AS bnot,
          CAST(l_linenumber AS BIGINT) << 2 AS shl,
          l_orderkey >> 1 AS shr,
          CAST(bit_count(l_orderkey) AS BIGINT) AS bcnt,
          (l_orderkey >> 2) & 1 AS bget
        FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber"""),
      doc = "Bitwise and/or/xor/not, shifts, bit_count, bit_get.")
  )
}
