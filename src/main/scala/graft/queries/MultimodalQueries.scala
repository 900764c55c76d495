package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Opaque binary media row: content bytes + typed metadata — the schema a
  * multimodal (image/audio/video) pipeline carries at 100 TB. Case classes
  * are top-level so Spark can derive Encoders.
  */
final case class MediaRow(doc_id: Long, bytes: Array[Byte], mime: String, n_chars: Long)

/** Deterministic fake "decoded" features — the real decoder (JPEG/PNG/
  * PCM decode via an image/audio library) is STUBBED: the container has
  * no codec libs. Everything around the stub — the typed schema, the
  * mapPartitions batch loop, the partitioning — is real and tested.
  */
final case class MediaFeatures(doc_id: Long, byte_len: Long, width: Long,
    height: Long, n_frames: Long, feat0: Double)

/** Multimodal-column plumbing (builder brief): binary columns with typed
  * metadata, batch "decode"/feature-extract via mapPartitions (the Scala
  * equivalent of mapInPandas batches), binary scalar functions.
  *
  * The decode is a clearly-marked deterministic stub (see
  * [[MultimodalQueries.stubDecode]]); the DuckDB oracle replicates the
  * stub arithmetic so the whole pipeline — schema, batch shape, typed
  * Encoders — is verified end-to-end.
  */
object MultimodalQueries {

  /** STUB: stands in for a real image/audio decoder. Deterministic
    * arithmetic on the byte payload only — replace with an actual codec
    * call in production. Operates on a whole batch (Iterator) like a
    * vectorized UDF would.
    */
  def stubDecode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.grouped(64).flatMap { batch => // batch shape: 64-row chunks
      batch.map { r =>
        val n = r.bytes.length.toLong
        MediaFeatures(
          doc_id = r.doc_id,
          byte_len = n,
          width = n % 640,
          height = n % 480,
          n_frames = n / 1000 + 1,
          feat0 = (r.bytes.headOption.map(_.toLong & 0xffL).getOrElse(0L)).toDouble / 255.0)
      }
    }

  def all: Seq[QueryDef] = Seq(

    QueryDef(
      "q56_multimodal_binary",
      (s, dir) => {
        import s.implicits._
        // Binary scalar surface over an opaque blob column.
        Tables.t(s, dir, "documents").filter($"doc_id" < 100)
          .withColumn("blob", $"text".cast("binary"))
          .select($"doc_id",
            length($"blob").cast("long").as("byte_len"),
            hex(expr("substring(blob, 1, 8)")).as("head_hex"),
            base64(expr("substring(blob, 1, 9)")).as("head_b64"),
            md5($"blob").as("content_md5"),
            struct($"lang", $"source", $"n_chars").getField("source").as("meta_source"),
            // frame-sampling shape: fixed-stride binary slices ("frames")
            hex(expr("substring(blob, 17, 8)")).as("frame2_hex"),
            (length($"blob") / 16).cast("long").as("n_frames16"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
          octet_length(encode(text)) AS byte_len,
          hex(substring(text, 1, 8)) AS head_hex,
          to_base64(encode(substring(text, 1, 9))) AS head_b64,
          md5(text) AS content_md5,
          source AS meta_source,
          hex(substring(text, 17, 8)) AS frame2_hex,
          octet_length(encode(text)) // 16 AS n_frames16
        FROM documents WHERE doc_id < 100 ORDER BY doc_id"""),
      doc = "Binary column surface: cast-to-binary, byte length, hex/base64 slices, md5, typed metadata struct."),

    QueryDef(
      "q57_multimodal_decode",
      (s, dir) => {
        import s.implicits._
        // Typed Dataset pipeline: DataFrame → Dataset[MediaRow] →
        // mapPartitions(stubDecode) → DataFrame. Partition-parallel, no
        // driver collect; at 100 TB each executor decodes its partitions.
        val media = Tables.t(s, dir, "documents")
          .select($"doc_id", $"text".cast("binary").as("bytes"),
            lit("text/plain").as("mime"), $"n_chars")
          .as[MediaRow]
        media.mapPartitions(stubDecode).toDF().orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
          octet_length(encode(text)) AS byte_len,
          octet_length(encode(text)) % 640 AS width,
          octet_length(encode(text)) % 480 AS height,
          octet_length(encode(text)) // 1000 + 1 AS n_frames,
          CAST(ascii(substring(text, 1, 1)) AS DOUBLE) / 255.0 AS feat0
        FROM documents ORDER BY doc_id"""),
      doc = "Multimodal decode plumbing: typed Encoders + mapPartitions batch loop around a clearly-marked decoder STUB; oracle replicates the stub arithmetic.")
  )
}
