package graft.encode

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.codec.FloatCodec

/** Block compression for float-vector columns (embeddings): chunk
  * rows inside each partition (NO shuffle — the layout the previous
  * stage chose is kept), concatenate the vectors row-major and
  * compress losslessly with [[FloatCodec.encodeAuto]]. The symmetric
  * decode restores every (id, vector) pair bit-exactly.
  *
  * Same scale shape as the token encoder: blocks are bounded
  * (`rowsPerBlock`), decode is embarrassingly parallel per block, and
  * the id/dim metadata rides each block so blocks are self-contained.
  * Ragged vectors are fine (per-row dims are stored).
  */
object VectorBlocks {

  def encode(df: DataFrame, vecCol: String, idCol: String,
             rowsPerBlock: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.grouped(rowsPerBlock).map { chunk =>
          val ids = new Array[Long](chunk.length)
          val dims = new Array[Int](chunk.length)
          var nFloats = 0
          var j = 0
          for ((id, v) <- chunk) {
            ids(j) = id
            dims(j) = v.length
            nFloats += v.length
            j += 1
          }
          val all = new Array[Float](nFloats)
          var off = 0
          for ((_, v) <- chunk) {
            System.arraycopy(v, 0, all, off, v.length)
            off += v.length
          }
          val t0 = System.nanoTime()
          val block = FloatCodec.encodeAuto(all, nFloats)
          val encNanos = System.nanoTime() - t0
          (ids, dims, block, chunk.length, 4L * nFloats,
            block.length.toLong, FloatCodec.codecOf(block), encNanos)
        }
      }
      .toDF("ids", "dims", "block", "n_rows", "raw_bytes", "enc_bytes",
        "codec", "enc_nanos")
  }

  def decode(blocks: DataFrame): DataFrame = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks.select("ids", "dims", "block")
      .as[(Array[Long], Array[Int], Array[Byte])]
      .flatMap { case (ids, dims, block) =>
        val all = FloatCodec.decode(block)
        var off = 0
        ids.indices.iterator.map { j =>
          val v = java.util.Arrays.copyOfRange(all, off, off + dims(j))
          off += dims(j)
          (ids(j), v)
        }
      }
      .toDF("vec_id", "embedding")
  }
}
