package graft

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Shared, eagerly-derived `Encoder`s for the typed kernels.
  *
  * `import spark.implicits._` derives a fresh `ExpressionEncoder` via
  * Scala runtime reflection at EVERY `.as[T]`/`.map`/`.flatMap` call
  * site — measured at tens of milliseconds per derivation (global
  * reflection lock, serializer/deserializer tree construction), which
  * lands in per-query PLAN time. A query plan is rebuilt per run by
  * design (that is what the bench times), but the encoder for a fixed
  * tuple shape is a static artifact — deriving it once per JVM is the
  * same object Spark would derive per call. Encoders are immutable
  * descriptors (Spark resolves/binds copies per plan), so sharing
  * across sessions and threads is safe.
  *
  * Usage: pass explicitly — `.as[(Long, String)](Enc.longStr)` — so the
  * in-scope `spark.implicits._` (still needed for `toDF`) never
  * competes for implicit resolution.
  */
object Enc {
  val longStr: Encoder[(Long, String)] = ExpressionEncoder()
  val strStr: Encoder[(String, String)] = ExpressionEncoder()
  val longStrStr: Encoder[(Long, String, String)] = ExpressionEncoder()
  val longLongArr: Encoder[(Long, Array[Long])] = ExpressionEncoder()
  val longIntLong: Encoder[(Long, Int, Long)] = ExpressionEncoder()
  val longLongArrLong: Encoder[(Long, Array[Long], Long)] = ExpressionEncoder()
  val longStrLong: Encoder[(Long, String, Long)] = ExpressionEncoder()
  val longStrBool: Encoder[(Long, String, Boolean)] = ExpressionEncoder()
  val longLongStr: Encoder[(Long, Long, String)] = ExpressionEncoder()
  val strLong: Encoder[(String, Long)] = ExpressionEncoder()
  val longLongArrIntLong: Encoder[(Long, Array[Long], Int, Long)] = ExpressionEncoder()
  val longLongIntLong: Encoder[(Long, Long, Int, Long)] = ExpressionEncoder()
  val longLongInt: Encoder[(Long, Long, Int)] = ExpressionEncoder()
  val longDoubleArrIntLong: Encoder[(Long, Array[Double], Int, Long)] = ExpressionEncoder()
  val longDoubleArrLongIntLong: Encoder[(Long, Array[Double], Long, Int, Long)] = ExpressionEncoder()
  val longDoubleArrInt: Encoder[(Long, Array[Double], Int)] = ExpressionEncoder()
  val strStrInt: Encoder[(String, String, Int)] = ExpressionEncoder()
  val strStrLongLong: Encoder[(String, String, Long, Long)] = ExpressionEncoder()
  val longStrArr: Encoder[(Long, Array[String])] = ExpressionEncoder()
  val longFloatArr: Encoder[(Long, Array[Float])] = ExpressionEncoder()
  val longDoubleArr: Encoder[(Long, Array[Double])] = ExpressionEncoder()
  val longLongDouble: Encoder[(Long, Long, Double)] = ExpressionEncoder()
  val longLong: Encoder[(Long, Long)] = ExpressionEncoder()
  val longBoolLong5: Encoder[(Long, Boolean, Long, Long, Long, Long, Long)] =
    ExpressionEncoder()
  val longBoolLong6: Encoder[(Long, Boolean, Long, Long, Long, Long, Long, Long)] =
    ExpressionEncoder()
  val longBytes: Encoder[(Long, Array[Byte])] = ExpressionEncoder()
  val long5: Encoder[(Long, Long, Long, Long, Long)] = ExpressionEncoder()
  val longStrStrLong: Encoder[(Long, String, String, Long)] = ExpressionEncoder()
  val strBytes: Encoder[(String, Array[Byte])] = ExpressionEncoder()
  val longLongLongStr: Encoder[(Long, Long, Long, String)] = ExpressionEncoder()
  val longLongLong: Encoder[(Long, Long, Long)] = ExpressionEncoder()
  val str: Encoder[String] = ExpressionEncoder()
  val longLongLongDouble: Encoder[(Long, Long, Long, Double)] = ExpressionEncoder()
  val longStrDoubleStr: Encoder[(Long, String, Double, String)] = ExpressionEncoder()
}
