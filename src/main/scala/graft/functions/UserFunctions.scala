package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, Q}

/** UDF / UDAF / UDTF surface (`EXT` — the reference registers no
  * server-side functions; users munge pandas frames instead). Shown in
  * preference order: builtins beat UDFs (SURVEY §4), so the UDF here is a
  * deliberate demonstration pinned against a builtin-computed oracle, and
  * the "UDTF" is the builtin generator (posexplode).
  */
object UserFunctions {

  /** Scalar UDF: cosine similarity of two float vectors. Sequential fold
    * in doubles — same association as the higher-order-function form, so
    * results match the oracle after 6dp rounding.
    *
    * Defined-null behavior (not NaN/NPE): null, empty, length-mismatched,
    * or zero-norm inputs all yield SQL NULL — cosine is undefined there,
    * and a left-join-shaped null must not kill the task.
    */
  val cosineUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    if (a == null || b == null || a.isEmpty || b.isEmpty || a.length != b.length) None
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) None
      else Some(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
  }

  /** Typed aggregate (Aggregator): sum of squared quantities — integer
    * exact, so the oracle matches bit-for-bit.
    */
  object SumSq extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = b + a * a
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  val queries: Map[String, Q] = Map(

    // UDF: cosine(embedding, reverse(embedding)) per vector.
    "q_udf_scalar" -> Q(
      """SELECT vec_id,
        |  round(list_cosine_similarity(embedding::DOUBLE[],
        |        list_reverse(embedding)::DOUBLE[]), 6) AS self_rev_cos
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Engine.table(s, dir, "embeddings")
        .select(col("vec_id"),
          round(cosineUdf(col("embedding"), reverse(col("embedding"))), 6)
            .as("self_rev_cos"))
        .orderBy(col("vec_id"))
    },

    // UDAF: typed Aggregator over quantities per return flag.
    "q_udaf" -> Q(
      """SELECT l_returnflag,
        |  cast(sum(cast(round(l_quantity, 0) as bigint) * cast(round(l_quantity, 0) as bigint)) as bigint) AS sum_sq_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val spark = s
      import spark.implicits._
      val li = Engine.table(s, dir, "lineitem")
        .select(col("l_returnflag"), round(col("l_quantity"), 0).cast(LongType).as("qty"))
      li.groupBy(col("l_returnflag"))
        .agg(udaf(SumSq).apply(col("qty")).as("sum_sq_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // UDTF surface: row explosion via the builtin generator (posexplode);
    // a custom Generator is unnecessary (SURVEY §2 note).
    "q_udtf" -> Q(
      """SELECT doc_id, cast(generate_subscripts(t, 1) - 1 as bigint) AS pos,
        |       unnest(t) AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |      WHERE doc_id < 20)
        |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      Engine.table(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
          col("col").as("token"))
        .orderBy(col("doc_id"), col("pos"))
    }
  )
}
